"""BlendedMVS dataset (reference lib/datasets/bmvs.py): identical
structure to DTU with bmvs_{obj} directories."""

from __future__ import annotations

import os

import numpy as np

from color_neus_tpu.data.base import (
    BaseDataset, imread_rgb, imread_mask, list_image_dir, sphere_npz_cameras,
)
from color_neus_tpu.utils.logger import logger
from color_neus_tpu.utils.registry import DATASET


_OPENGL_FLIP = np.diag([1.0, -1.0, -1.0, 1.0]).astype(np.float32)


@DATASET.register_module("BlendedMVS")
class BlendedMVS(BaseDataset):
    name = "BlendedMVS"

    def __init__(self, cfg: dict):
        preset = cfg.get("DATA_PRESET", {})
        self.fx_only = preset.get("FX_ONLY", False)
        self.include_mask = preset.get("INCLUDE_MASK", True)
        self.opengl = preset.get("OPENGL_SYS", False)

        data_path = os.path.join(cfg["DATA_ROOT"], "BlendedMVS", f"bmvs_{cfg['OBJ_ID']}")
        self.image_paths = list_image_dir(os.path.join(data_path, "image"))
        self.mask_paths = list_image_dir(os.path.join(data_path, "mask"))
        self.n_imgs = len(self.image_paths)

        intr, poses, scale_mats, bb_min, bb_max = sphere_npz_cameras(
            os.path.join(data_path, "cameras_sphere.npz"), self.n_imgs)
        if self.opengl:
            poses = _OPENGL_FLIP[None] @ poses
        self.poses = poses
        self.scale_mats = scale_mats
        self.object_bbox_min = bb_min
        self.object_bbox_max = bb_max

        if self.fx_only:
            self.focal = np.array([intr[0][0, 0]], np.float32)
        else:
            self.focal = np.array([intr[0][0, 0], intr[0][1, 1]], np.float32)

        self.origin = np.zeros(3, np.float32)
        self.radius = 1.0
        logger.info("BlendedMVS: bmvs_%s, %d images, include_mask=%s",
                    cfg["OBJ_ID"], self.n_imgs, self.include_mask)

    def get_image(self, idx: int):
        img = imread_rgb(self.image_paths[idx])
        mask = imread_mask(self.mask_paths[idx])
        img = img * mask[..., None]
        return img, mask
