"""IHO-Video dataset (reference lib/datasets/iho_video.py): COLMAP
reconstruction; scene origin/radius derived from the SfM point cloud;
RGBA images carry the mask in the alpha channel."""

from __future__ import annotations

import os

import cv2
import numpy as np

from color_neus_tpu.data import colmap
from color_neus_tpu.data.base import BaseDataset
from color_neus_tpu.ops.transforms import load_K_Rt_from_P
from color_neus_tpu.utils.logger import logger
from color_neus_tpu.utils.registry import DATASET


_OPENGL_FLIP = np.diag([1.0, -1.0, -1.0, 1.0]).astype(np.float32)


@DATASET.register_module("IHO_VIDEO")
class IHOVideo(BaseDataset):
    name = "IHO_VIDEO"

    def __init__(self, cfg: dict):
        preset = cfg.get("DATA_PRESET", {})
        self.fx_only = preset.get("FX_ONLY", False)
        self.include_mask = preset.get("INCLUDE_MASK", False)
        self.opengl = preset.get("OPENGL_SYS", False)
        radius_ratio = cfg.get("RADIUS_RATIO", 1.5)
        # replicate the reference's radius formula bug-for-bug? default off;
        # see iho_video.py:39 which squares the SUM of signed deltas.
        legacy_radius = cfg.get("LEGACY_RADIUS", True)

        data_path = os.path.join(cfg["DATA_ROOT"], "IHO_video", cfg["OBJ_ID"])
        img_dir = os.path.join(data_path, "obj")
        camdata = colmap.read_cameras_binary(os.path.join(data_path, "colmap/cameras.bin"))
        pts3d = colmap.read_points3d_binary(os.path.join(data_path, "colmap/points3D.bin"))
        imdata = colmap.read_images_binary(os.path.join(data_path, "colmap/images.bin"))

        xyz = np.stack([p.xyz for p in pts3d.values()])
        origin = xyz.mean(0)
        if legacy_radius:
            # iho_video.py:39: sqrt(sum(delta, axis=1)^2) = |sum of signed deltas|
            r = np.percentile(np.sqrt(np.sum(xyz - origin, axis=1) ** 2), 99.9)
        else:
            r = np.percentile(np.linalg.norm(xyz - origin, axis=1), 99.9)
        self.origin = origin.astype(np.float32)
        self.radius = float(r * radius_ratio)

        cam = camdata[1]
        K = np.array([[cam.params[0], 0, cam.params[2]],
                      [0, cam.params[1], cam.params[3]],
                      [0, 0, 1]])
        if self.fx_only:
            self.focal = np.array([(K[0, 0] + K[1, 1]) / 2], np.float32)
        else:
            self.focal = np.array([K[0, 0], K[1, 1]], np.float32)

        poses, self.image_paths = [], []
        for _, im in sorted(imdata.items()):
            R = im.qvec2rotmat()
            Rt = np.concatenate([R, im.tvec.reshape(3, 1)], axis=1)  # w2c
            _, pose = load_K_Rt_from_P(K @ Rt)
            if self.opengl:
                pose = _OPENGL_FLIP @ pose
            poses.append(pose)
            self.image_paths.append(os.path.join(img_dir, im.name))
        self.poses = np.stack(poses)
        self.n_imgs = len(self.image_paths)

        self.scale_mats = np.tile(np.eye(4, dtype=np.float32), (self.n_imgs, 1, 1))
        self.object_bbox_min = np.array([-1.01, -1.01, -1.01], np.float32)
        self.object_bbox_max = np.array([1.01, 1.01, 1.01], np.float32)
        logger.info("IHO_VIDEO: %s, %d images, include_mask=%s",
                    cfg["OBJ_ID"], self.n_imgs, self.include_mask)

    def get_image(self, idx: int):
        png = cv2.imread(self.image_paths[idx], cv2.IMREAD_UNCHANGED)
        if png is None:
            raise FileNotFoundError(self.image_paths[idx])
        mask = png[:, :, 3].astype(np.float32) / 255.0 if png.shape[2] == 4 else None
        img = cv2.cvtColor(png[:, :, :3], cv2.COLOR_BGR2RGB).astype(np.float32) / 255.0
        return img, mask
