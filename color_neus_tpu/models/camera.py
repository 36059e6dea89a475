"""Learnable camera refinement: focal coefficients and pose deltas.

Functional counterpart of the reference's Focal_Net / Pose_Net
(lib/models/tools/camera_net.py:8-109). Freezing (LEARN_FOCAL / LEARN_R /
LEARN_T false) is implemented with stop_gradient on the corresponding
leaves — exact zero-update semantics without optimizer masking.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from color_neus_tpu.ops.transforms import aa_to_rotmat, rot6d_to_rotmat, convert3x4_4x4


@dataclass(frozen=True)
class CameraConfig:
    learn_focal: bool = False
    learn_r: bool = False
    learn_t: bool = False
    fx_only: bool = False
    focal_order: int = 2       # fx = coeff^order * W (camera_net.py:55-66)
    pose_mode: str = "6d"      # "3d" axis-angle | "6d" rot6d
    H: int = 0
    W: int = 0
    n_cams: int = 0


def init_focal(cfg: CameraConfig, init_focal=None, dtype=jnp.float32) -> dict:
    """Focal stored as a coefficient of (W, H): order 2 -> coeff = sqrt(f/dim)."""
    if init_focal is None:
        return {"fx": jnp.asarray(1.0, dtype), "fy": jnp.asarray(1.0, dtype)}
    init_focal = np.asarray(init_focal, dtype=np.float64).reshape(-1)
    fx = init_focal[0]
    fy = init_focal[1] if (init_focal.shape[0] == 2 and not cfg.fx_only) else init_focal[0]
    if cfg.focal_order == 2:
        cx, cy = np.sqrt(fx / cfg.W), np.sqrt(fy / cfg.H)
    elif cfg.focal_order == 1:
        cx, cy = fx / cfg.W, fy / cfg.H
    else:
        raise ValueError("focal order must be 1 or 2")
    if cfg.fx_only:
        return {"fx": jnp.asarray(cx, dtype)}
    return {"fx": jnp.asarray(cx, dtype), "fy": jnp.asarray(cy, dtype)}


def focal_apply(params: dict, cfg: CameraConfig) -> jnp.ndarray:
    """Returns [fx, fy]."""
    fx = params["fx"]
    fy = params["fx"] if cfg.fx_only else params["fy"]
    if not cfg.learn_focal:
        fx, fy = jax.lax.stop_gradient(fx), jax.lax.stop_gradient(fy)
    if cfg.focal_order == 2:
        return jnp.stack([fx * fx * cfg.W, fy * fy * (cfg.W if cfg.fx_only else cfg.H)])
    return jnp.stack([fx * cfg.W, fy * (cfg.W if cfg.fx_only else cfg.H)])


def init_pose(cfg: CameraConfig, dtype=jnp.float32) -> dict:
    """Identity delta: axis-angle zeros or rot6d [1,0,0,0,1,0] rows."""
    n = cfg.n_cams
    if cfg.pose_mode == "3d":
        r = jnp.zeros((n, 3), dtype)
    elif cfg.pose_mode == "6d":
        r = jnp.tile(jnp.asarray([[1, 0, 0, 0, 1, 0]], dtype), (n, 1))
    else:
        raise ValueError(f"pose mode must be 3d or 6d, got {cfg.pose_mode}")
    return {"r": r, "t": jnp.zeros((n, 3), dtype)}


def pose_apply(params: dict, cfg: CameraConfig, init_c2w: jnp.ndarray, cam_ids: jnp.ndarray) -> jnp.ndarray:
    """c2w [len(cam_ids), 4, 4] = delta(cam) @ init_c2w[cam] (camera_net.py:95-109)."""
    r = params["r"][cam_ids]
    t = params["t"][cam_ids]
    if not cfg.learn_r:
        r = jax.lax.stop_gradient(r)
    if not cfg.learn_t:
        t = jax.lax.stop_gradient(t)
    R = aa_to_rotmat(r) if cfg.pose_mode == "3d" else rot6d_to_rotmat(r)
    delta = convert3x4_4x4(jnp.concatenate([R, t[..., None]], axis=-1))
    # HIGHEST: bf16-rounded pose products are real geometry error
    return jnp.matmul(delta, init_c2w[cam_ids],
                      precision=jax.lax.Precision.HIGHEST)
