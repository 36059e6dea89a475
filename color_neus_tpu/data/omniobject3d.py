"""OmniObject3D dataset (reference lib/datasets/omniobject3d.py):
Blender transforms.json; focal from camera_angle_x; pose convention flip
pose[:, 1:3] *= -1."""

from __future__ import annotations

import json
import os

import cv2
import numpy as np

from color_neus_tpu.data.base import BaseDataset
from color_neus_tpu.utils.logger import logger
from color_neus_tpu.utils.registry import DATASET


_OPENGL_FLIP = np.diag([1.0, -1.0, -1.0, 1.0]).astype(np.float32)


@DATASET.register_module("OmniObject3D")
class OmniObject3D(BaseDataset):
    name = "OmniObject3D"

    def __init__(self, cfg: dict):
        preset = cfg.get("DATA_PRESET", {})
        self.fx_only = preset.get("FX_ONLY", False)
        self.include_mask = preset.get("INCLUDE_MASK", True)
        self.opengl = preset.get("OPENGL_SYS", False)

        obj_info = cfg["OBJ_ID"]           # e.g. doll_002 -> class doll, id 002
        obj_class = obj_info[:-4]
        data_path = os.path.join(cfg["DATA_ROOT"], "OmniObject3D/blender_renders",
                                 obj_class, obj_info, "render")
        with open(os.path.join(data_path, "transforms.json")) as f:
            meta = json.load(f)

        self.image_paths, poses = [], []
        for frame in meta["frames"]:
            fname = os.path.join(data_path, "images",
                                 frame["file_path"].split("/")[-1] + ".png")
            self.image_paths.append(fname)
            pose = np.array(frame["transform_matrix"], np.float32)
            pose[:, 1:3] *= -1  # Blender OpenGL -> our camera convention
            if self.opengl:
                pose = _OPENGL_FLIP @ pose
            poses.append(pose)
        self.poses = np.stack(poses)
        self.n_imgs = len(self.image_paths)

        img0 = cv2.imread(self.image_paths[0])
        H, W = img0.shape[:2]
        focal = 0.5 * W / np.tan(0.5 * float(meta["camera_angle_x"]))
        self.focal = (np.array([focal], np.float32) if self.fx_only
                      else np.array([focal, focal], np.float32))

        self.origin = np.zeros(3, np.float32)
        self.radius = 1.0
        self.scale_mats = np.tile(np.eye(4, dtype=np.float32), (self.n_imgs, 1, 1))
        self.object_bbox_min = np.array([-1.01, -1.01, -1.01], np.float32)
        self.object_bbox_max = np.array([1.01, 1.01, 1.01], np.float32)
        logger.info("OmniObject3D: %s, %d images, include_mask=%s",
                    obj_info, self.n_imgs, self.include_mask)

    def get_image(self, idx: int):
        png = cv2.imread(self.image_paths[idx], cv2.IMREAD_UNCHANGED)
        if png is None:
            raise FileNotFoundError(self.image_paths[idx])
        mask = None
        if self.include_mask and png.ndim == 3 and png.shape[2] == 4:
            mask = png[:, :, 3].astype(np.float32) / 255.0
        img = cv2.cvtColor(png[:, :, :3], cv2.COLOR_BGR2RGB).astype(np.float32) / 255.0
        return img, mask
