"""Ray generation and importance sampling — TPU-native design.

Unlike the reference (lib/models/tools/ray_utils.py:16-87), which
materializes all N*H*W rays each step and gathers n_rays of them, rays
here are computed only for the sampled pixels, on device, with static
shapes. Pixel sampling uses cumulative-count inversion (searchsorted)
instead of randperm over dynamic-size index sets, so it stays jittable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def near_far_from_sphere(rays_o: jnp.ndarray, rays_d: jnp.ndarray):
    """Near/far as mid-point-of-closest-approach ∓ 1 (unit-sphere scene).

    Matches ray_utils.py:7-13.
    """
    a = jnp.sum(rays_d ** 2, axis=-1)
    b = 2.0 * jnp.sum(rays_o * rays_d, axis=-1)
    mid = 0.5 * (-b) / a
    return mid - 1.0, mid + 1.0


def _cam_dirs(px, py, focal, H, W, normalize, opengl, dtype):
    """Camera-frame direction for pixel centers (x right, y down, z forward).

    Matches the pinhole model of ray_utils.py:45-50: no +0.5 pixel-center
    offset, principal point at (W/2, H/2). opengl flips y and z.
    """
    ys = -1.0 if opengl else 1.0
    zs = -1.0 if opengl else 1.0
    dx = (px.astype(dtype) - 0.5 * W) / focal[0]
    dy = ys * (py.astype(dtype) - 0.5 * H) / focal[1]
    dz = zs * jnp.ones_like(dx)
    dirs = jnp.stack([dx, dy, dz], axis=-1)
    if normalize:
        dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    return dirs


def rays_for_pixels(c2w, focal, px, py, H, W, normalize=False, opengl=False):
    """World-space rays for selected pixels.

    c2w: [R, 4, 4] per-ray camera-to-world; focal: [2]; px/py: [R] pixel
    coords (x = column, y = row). Returns (rays_o, rays_d) each [R, 3].
    """
    dirs = _cam_dirs(px, py, focal, H, W, normalize, opengl, c2w.dtype)  # [R,3]
    # HIGHEST: default f32 contractions round operands to bf16 on TPU
    # (~4e-3 relative) — real geometry error on ray directions
    rays_d = jnp.einsum("rij,rj->ri", c2w[:, :3, :3], dirs,
                        precision=jax.lax.Precision.HIGHEST)
    rays_o = c2w[:, :3, 3]
    return rays_o, rays_d


def all_rays_for_camera(c2w, focal, H, W, normalize=False, opengl=False):
    """All H*W rays for one camera (c2w [4,4]). Returns [H, W, 3] pairs.

    Same contract as get_rays_at (ray_utils.py:90-119).
    """
    py, px = jnp.meshgrid(jnp.arange(H), jnp.arange(W), indexing="ij")
    dirs = _cam_dirs(px, py, focal, H, W, normalize, opengl, c2w.dtype)  # [H,W,3]
    rays_d = jnp.einsum("ij,hwj->hwi", c2w[:3, :3], dirs,
                        precision=jax.lax.Precision.HIGHEST)
    rays_o = jnp.broadcast_to(c2w[:3, 3], rays_d.shape)
    return rays_o, rays_d


# ---------------------------------------------------------------------------
# Pixel sampling
# ---------------------------------------------------------------------------

def sample_pixels_uniform(key, n_cams: int, H: int, W: int, n_rays: int,
                          first_image_only: bool = False):
    """Uniform pixel sampling over a batch of cameras.

    first_image_only=True replicates the reference's maskless-path quirk
    (ray_utils.py:57-59: indices drawn in [0, H*W) but gathered from the
    flattened [N*H*W] stack, i.e. only camera 0 is ever sampled).
    Returns (cam_idx [R], py [R], px [R]).
    """
    kc, kp = jax.random.split(key)
    if first_image_only:
        cam_idx = jnp.zeros((n_rays,), dtype=jnp.int32)
    else:
        cam_idx = jax.random.randint(kc, (n_rays,), 0, n_cams)
    pix = jax.random.randint(kp, (n_rays,), 0, H * W)
    return cam_idx, pix // W, pix % W


def sample_pixels_masked(key, masks: jnp.ndarray, n_rays: int, mask_rate):
    """Mask-aware pixel sampling over a batch of cameras.

    masks: [B, H, W] in {0, 1}. Each ray independently lands inside the
    mask with probability mask_rate, uniformly over the in-mask pixels of
    the whole batch (and uniformly over background otherwise) — a
    with-replacement, shape-static analog of the reference's
    randperm-over-index-sets scheme (ray_utils.py:61-76), whose in-mask
    ray count is Binomial(n_rays, mask_rate) instead of exactly
    round(mask_rate * n_rays).

    Returns (cam_idx [R], py [R], px [R], sel_mask [R]).
    """
    B, H, W = masks.shape
    flat = (masks.reshape(-1) > 0.5)
    cin = jnp.cumsum(flat.astype(jnp.int32))
    cout = jnp.cumsum((~flat).astype(jnp.int32))
    m_in = cin[-1]
    m_out = cout[-1]

    kb, ki, ko = jax.random.split(key, 3)
    pick_in = jax.random.uniform(kb, (n_rays,)) < mask_rate
    # Degenerate sets: force the available side.
    pick_in = jnp.where(m_in == 0, False, jnp.where(m_out == 0, True, pick_in))

    def draw(k, cum, m):
        # k-th element of the set (1-based), located by searchsorted on the
        # nondecreasing cumulative count.
        u = jax.random.uniform(k, (n_rays,))
        tgt = jnp.minimum((u * m).astype(jnp.int32) + 1, jnp.maximum(m, 1))
        return jnp.searchsorted(cum, tgt, side="left").astype(jnp.int32)

    idx = jnp.where(pick_in, draw(ki, cin, m_in), draw(ko, cout, m_out))
    sel_mask = flat[idx].astype(masks.dtype)
    cam_idx = idx // (H * W)
    rem = idx % (H * W)
    return cam_idx, rem // W, rem % W, sel_mask


def sample_pixels_masked_exact(key, masks: jnp.ndarray, n_rays: int,
                               mask_rate):
    """Exact-count masked pixel split — strict-parity variant.

    Matches the reference's semantics (ray_utils.py:61-76): exactly
    n_in = int(mask_rate * n_rays) rays land in-mask (clamped to the
    in-mask pixel count), the rest on background, each set drawn
    WITHOUT replacement, uniformly. The reference does this with
    randperm over dynamic-size index sets; here it is shape-static and
    jittable: Gumbel-top-k over the flattened [B*H*W] pixels per set
    (a uniform random key per pixel, top_k of size n_rays), spliced at
    the dynamic boundary n_in. This is the DEFAULT
    (TrainerConfig.mask_sample_mode = 'exact', YAML
    DATA_PRESET.MASK_SAMPLE_MODE); the 'bernoulli' sampler
    (sample_pixels_masked) matches it in expectation and is cheaper
    per step (no [B*H*W] top_k).

    Returns (cam_idx [R], py [R], px [R], sel_mask [R]).
    """
    B, H, W = masks.shape
    flat = (masks.reshape(-1) > 0.5)
    kin, kout = jax.random.split(key)
    neg = jnp.float32(-jnp.inf)
    gi = jax.random.uniform(kin, flat.shape)
    go = jax.random.uniform(kout, flat.shape)
    # top_k over per-pixel uniform keys == a uniform sample without
    # replacement of size n_rays from each set
    _, in_cand = jax.lax.top_k(jnp.where(flat, gi, neg), n_rays)
    _, out_cand = jax.lax.top_k(jnp.where(flat, neg, go), n_rays)
    m_in = jnp.sum(flat.astype(jnp.int32))
    m_out = flat.size - m_in
    n_in = jnp.asarray(mask_rate * n_rays, jnp.int32)   # int() truncation
    n_in = jnp.minimum(n_in, jnp.minimum(m_in, n_rays))
    # defensive (reference assumes enough background pixels exist)
    n_in = jnp.maximum(n_in, n_rays - jnp.minimum(m_out, n_rays))
    i = jnp.arange(n_rays)
    idx = jnp.where(i < n_in, in_cand,
                    out_cand[jnp.clip(i - n_in, 0, n_rays - 1)])
    sel_mask = flat[idx].astype(masks.dtype)
    cam_idx = idx // (H * W)
    rem = idx % (H * W)
    return cam_idx, rem // W, rem % W, sel_mask


# ---------------------------------------------------------------------------
# Inverse-CDF importance sampling
# ---------------------------------------------------------------------------

def sample_pdf(bins: jnp.ndarray, weights: jnp.ndarray, n_samples: int,
               det: bool = True, key=None) -> jnp.ndarray:
    """Draw n_samples per ray from the piecewise-constant pdf over bins.

    bins: [R, M] (bin edges = the coarse z_vals), weights: [R, M-1].
    det=True uses the stratified midpoints linspace(0.5/n, 1-0.5/n, n).
    Matches ray_utils.py:123-154 numerics (1e-5 floors).
    """
    R, M = bins.shape
    weights = weights + 1e-5
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros((R, 1), dtype=cdf.dtype), cdf], axis=-1)  # [R, M]

    if det:
        u = jnp.linspace(0.5 / n_samples, 1.0 - 0.5 / n_samples, n_samples, dtype=cdf.dtype)
        u = jnp.broadcast_to(u, (R, n_samples))
    else:
        assert key is not None, "stochastic sample_pdf needs a PRNG key"
        u = jax.random.uniform(key, (R, n_samples), dtype=cdf.dtype)

    # searchsorted(right) as a counting reduction: TPU-friendly (one
    # [R, M, K] compare + sum on the VPU) instead of a vmapped binary
    # search that lowers to sequential dynamic slices.
    inds = jnp.sum(cdf[:, :, None] <= u[:, None, :], axis=1).astype(jnp.int32)
    below = jnp.maximum(inds - 1, 0)
    above = jnp.minimum(inds, M - 1)

    # batched gathers as equality-masked sum reductions: the [R, K, M]
    # intermediate stays VIRTUAL inside one XLA reduce fusion (VPU
    # compare+select+add streaming over M). take_along_axis lowers to
    # scalar-core gathers (several ms at 2048x448); the earlier one-hot
    # MXU dot formulation materialized [R, K, M] f32 one-hots through
    # HBM — hundreds of MB per step.
    m_iota = jnp.arange(M)

    def _take(vals, idx):
        mask = idx[:, :, None] == m_iota
        return jnp.sum(jnp.where(mask, vals[:, None, :], 0.0), axis=-1)

    cdf_b = _take(cdf, below)
    cdf_a = _take(cdf, above)
    bins_b = _take(bins, below)
    bins_a = _take(bins, above)

    denom = cdf_a - cdf_b
    denom = jnp.where(denom < 1e-5, 1.0, denom)
    t = (u - cdf_b) / denom
    return bins_b + t * (bins_a - bins_b)
