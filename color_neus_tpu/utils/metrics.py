"""Metrics: running loss meters, PSNR, SSIM, Chamfer distance.

Reference surface: lib/metrics/basic_metric.py (AverageMeter/LossMetric),
lib/metrics/similarity.py (PSNR via mse2psnr, SSIM via kornia). SSIM here
is a ~40-line JAX implementation of the standard Wang et al. windowed
SSIM with an 11x11 Gaussian (sigma 1.5), matching kornia's defaults.
Chamfer (mesh eval) replaces the pytorch3d kernel
(lib/utils/mesh_tools.py:59-70) with a tiled two-sided nearest-neighbor
in JAX that runs on TPU or CPU.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Running meters
# ---------------------------------------------------------------------------

class AverageMeter:
    def __init__(self):
        self.reset()

    def reset(self):
        self.sum = 0.0
        self.count = 0

    def update(self, val: float, n: int = 1):
        self.sum += float(val) * n
        self.count += n

    @property
    def avg(self) -> float:
        return self.sum / max(self.count, 1)


class LossMetric:
    """Running means of every entry of the per-step loss dict."""

    def __init__(self):
        self._meters: dict[str, AverageMeter] = {}

    def feed(self, loss_dict: dict, n: int = 1):
        for k, v in loss_dict.items():
            self._meters.setdefault(k, AverageMeter()).update(float(v), n)

    def get_loss(self, key: str = "loss") -> float:
        return self._meters[key].avg if key in self._meters else float("nan")

    def items(self):
        return {k: m.avg for k, m in self._meters.items()}

    def reset(self):
        for m in self._meters.values():
            m.reset()

    def __str__(self):
        return " | ".join(f"{k}: {m.avg:.5f}" for k, m in self._meters.items())


def mse2psnr(mse: float) -> float:
    return -10.0 * math.log10(max(float(mse), 1e-12))


class PSNR:
    def __init__(self):
        self.meter = AverageMeter()

    def feed(self, pred, target):
        mse = float(np.mean((np.asarray(pred) - np.asarray(target)) ** 2))
        self.meter.update(mse2psnr(mse))

    @property
    def avg(self):
        return self.meter.avg

    def reset(self):
        self.meter.reset()

    def __str__(self):
        return f"PSNR: {self.avg:.4f}"


# ---------------------------------------------------------------------------
# SSIM
# ---------------------------------------------------------------------------

def _gaussian_kernel(size: int = 11, sigma: float = 1.5):
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-0.5 * (x / sigma) ** 2)
    g = g / jnp.sum(g)
    return jnp.outer(g, g)


def ssim(img1: jnp.ndarray, img2: jnp.ndarray, max_val: float = 1.0,
         window_size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    """Mean SSIM over [H, W, C] images (Wang et al. 2004 constants)."""
    k = _gaussian_kernel(window_size, sigma)[None, None]  # [1,1,ks,ks]
    c1 = (0.01 * max_val) ** 2
    c2 = (0.03 * max_val) ** 2

    def filt(x):  # x [H, W, C] -> valid-window local means
        x = jnp.transpose(x, (2, 0, 1))[:, None]  # [C,1,H,W]
        # HIGHEST: TPU's default f32 conv rounds operands to bf16; the
        # resulting noise in E[x^2]-mu^2 (catastrophic cancellation on
        # near-constant windows) pushed measured SSIM above 1.0 on
        # high-PSNR renders. The reference's kornia SSIM runs true-f32
        # CUDA convs (similarity.py:31-52) — match it.
        y = jax.lax.conv_general_dilated(
            x, k, (1, 1), "VALID", precision=jax.lax.Precision.HIGHEST)
        return y[:, 0]

    img1 = jnp.asarray(img1, jnp.float32)
    img2 = jnp.asarray(img2, jnp.float32)
    mu1, mu2 = filt(img1), filt(img2)
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    s1 = filt(img1 * img1) - mu1_sq
    s2 = filt(img2 * img2) - mu2_sq
    s12 = filt(img1 * img2) - mu12
    ssim_map = ((2 * mu12 + c1) * (2 * s12 + c2)) / ((mu1_sq + mu2_sq + c1) * (s1 + s2 + c2))
    return jnp.mean(ssim_map)


class SSIM:
    def __init__(self):
        self.meter = AverageMeter()

    def feed(self, pred, target):
        self.meter.update(float(ssim(jnp.asarray(pred), jnp.asarray(target))))

    @property
    def avg(self):
        return self.meter.avg

    def reset(self):
        self.meter.reset()

    def __str__(self):
        return f"SSIM: {self.avg:.4f}"


# ---------------------------------------------------------------------------
# Chamfer distance
# ---------------------------------------------------------------------------

def _nn_sq_dists(a: jnp.ndarray, b: jnp.ndarray, tile: int = 4096) -> jnp.ndarray:
    """min_j ||a_i - b_j||^2 for each i, tiled over a to bound memory."""
    n = a.shape[0]
    pad = (-n) % tile
    a_pad = jnp.concatenate([a, jnp.zeros((pad, 3), a.dtype)], axis=0)
    b_sq = jnp.sum(b * b, axis=1)

    def one_tile(at):
        d = jnp.sum(at * at, axis=1)[:, None] - 2.0 * at @ b.T + b_sq[None]
        return jnp.min(d, axis=1)

    tiles = a_pad.reshape(-1, tile, 3)
    mins = jax.lax.map(one_tile, tiles).reshape(-1)
    return jnp.maximum(mins[:n], 0.0)


def chamfer_distance(pts_a, pts_b) -> float:
    """Symmetric mean-squared chamfer (pytorch3d convention:
    mean_a min_b ||.||^2 + mean_b min_a ||.||^2)."""
    a = jnp.asarray(pts_a, jnp.float32)
    b = jnp.asarray(pts_b, jnp.float32)
    return float(jnp.mean(_nn_sq_dists(a, b)) + jnp.mean(_nn_sq_dists(b, a)))


class LPIPS:
    """Stub matching the reference's LPIPS (similarity.py:84-88: always 0).
    A real perceptual metric would need pretrained VGG weights, which this
    environment cannot download."""

    def __init__(self):
        self.meter = AverageMeter()

    def feed(self, pred, target):
        self.meter.update(0.0)

    @property
    def avg(self):
        return self.meter.avg

    def reset(self):
        self.meter.reset()

    def __str__(self):
        return f"LPIPS: {self.avg:.4f}"
