"""Synthetic in-memory dataset: a colored sphere rendered analytically.

Used by CI and benchmarks — no disk data required. Cameras sit on a
sphere looking at the origin; images are analytic lambert-shaded renders
of a sphere of the given radius, so a correctly-implemented trainer can
actually reconstruct it.
"""

from __future__ import annotations

import numpy as np

from color_neus_tpu.data.base import BaseDataset
from color_neus_tpu.ops.transforms import pose_spherical
from color_neus_tpu.utils.registry import DATASET


def _render_sphere(c2w, focal, H, W, radius=0.5, color=(0.8, 0.3, 0.2)):
    """Analytic ray-traced sphere at the origin; returns (rgb, mask)."""
    ys, xs = np.mgrid[0:H, 0:W].astype(np.float32)
    dirs = np.stack([(xs - 0.5 * W) / focal[0],
                     (ys - 0.5 * H) / focal[1],
                     np.ones_like(xs)], axis=-1)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    rd = dirs @ c2w[:3, :3].T
    ro = c2w[:3, 3]

    b = 2.0 * rd @ ro
    c = float(ro @ ro) - radius * radius
    disc = b * b - 4 * c
    hit = disc > 0
    t = np.where(hit, (-b - np.sqrt(np.maximum(disc, 0.0))) / 2.0, 0.0)
    pts = ro + t[..., None] * rd
    n = pts / np.maximum(np.linalg.norm(pts, axis=-1, keepdims=True), 1e-8)
    light = np.clip(-np.sum(n * rd, axis=-1), 0.0, 1.0)
    rgb = np.zeros((H, W, 3), np.float32)
    rgb[hit] = np.asarray(color, np.float32) * (0.3 + 0.7 * light[hit, None])
    return rgb, hit.astype(np.float32)


@DATASET.register_module("Synthetic")
class Synthetic(BaseDataset):
    name = "Synthetic"

    def __init__(self, cfg: dict):
        preset = cfg.get("DATA_PRESET", {})
        self.include_mask = preset.get("INCLUDE_MASK", True)
        self.fx_only = preset.get("FX_ONLY", False)

        self.n_imgs = cfg.get("N_IMGS", 8)
        H = cfg.get("H", 64)
        W = cfg.get("W", 64)
        self.sphere_radius = cfg.get("SPHERE_RADIUS", 0.5)
        cam_radius = cfg.get("CAM_RADIUS", 3.0)
        f = cfg.get("FOCAL", 1.2 * W)
        self.focal = (np.array([f], np.float32) if self.fx_only
                      else np.array([f, f], np.float32))

        self.poses = np.stack([
            pose_spherical(360.0 * i / self.n_imgs, -30.0 + 20.0 * (i % 3), cam_radius)
            for i in range(self.n_imgs)
        ])
        # pose_spherical yields OpenGL-style (z backward) frames; flip to our
        # z-forward convention so rays look at the origin.
        self.poses[:, :, 1:3] *= -1

        self._images, self._masks = [], []
        for i in range(self.n_imgs):
            rgb, mask = _render_sphere(self.poses[i], self.focal if len(self.focal) == 2
                                       else np.repeat(self.focal, 2),
                                       H, W, self.sphere_radius)
            self._images.append(rgb)
            self._masks.append(mask)

        self.origin = np.zeros(3, np.float32)
        self.radius = 1.0
        self.scale_mats = np.tile(np.eye(4, dtype=np.float32), (self.n_imgs, 1, 1))
        self.object_bbox_min = np.array([-1.01, -1.01, -1.01], np.float32)
        self.object_bbox_max = np.array([1.01, 1.01, 1.01], np.float32)

    def get_image(self, idx: int):
        return self._images[idx], self._masks[idx] if self.include_mask else None
