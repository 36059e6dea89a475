"""Color-NeuS core: relocated view-independent color + relight residual.

Reference: lib/models/renderers/Color_NeuS.py:24-138. The color MLP runs
in no_view_dir mode and predicts the *global* (view-independent) surface
color; the relight MLP predicts a view-dependent residual delta_relight
applied in inverse-sigmoid space. Both the relit color and the
weights-composited global color are returned; the trainer regularizes
mean(delta_relight) -> 0 so the global color stays faithful.
"""

from __future__ import annotations

import jax.numpy as jnp

from color_neus_tpu.models.configs import RendererConfig
from color_neus_tpu.models import fields
from color_neus_tpu.models.neus import (
    _sample_points,
    _sphere_masks,
    _eikonal_parts,
    _blend_background,
    anneal_cos,
    exclusive_cumprod_weights,
    neus_alpha,
)


def render_core_color_neus(params, rcfg: RendererConfig, rays_o, rays_d, z_vals,
                           sample_dist, background_alpha=None,
                           background_sampled_color=None, background_rgb=None,
                           cos_anneal_ratio: float = 0.0):
    R, S = z_vals.shape
    dists, mid_z_vals, pts, dirs = _sample_points(rays_o, rays_d, z_vals, sample_dist)

    from color_neus_tpu.models.neus import eval_point_pipeline
    sdf, gradients, global_color_pt, relit_pt, delta_relight = \
        eval_point_pipeline(params, rcfg, pts, dirs)
    sampled_color = relit_pt.reshape(R, S, 3)

    inv_s = fields.variance_inv_s(params["variance"])
    true_cos = jnp.sum(dirs * gradients, axis=-1, keepdims=True)
    iter_cos = anneal_cos(true_cos, cos_anneal_ratio)

    alpha_global, prev_cdf = neus_alpha(sdf.reshape(R, S),
                                        iter_cos.reshape(R, S), dists, inv_s)
    inside, relaxed = _sphere_masks(pts, R, S)

    # Global-color compositing always uses the foreground-only weights
    # (Color_NeuS.py:94-95,116) even when a background model is active.
    weights_global = exclusive_cumprod_weights(alpha_global)

    if background_alpha is not None:
        alpha, sampled_color = _blend_background(
            alpha_global, sampled_color, inside, background_alpha, background_sampled_color, S)
        weights = exclusive_cumprod_weights(alpha)
    else:
        weights = weights_global

    weights_sum = jnp.sum(weights, axis=-1, keepdims=True)
    color = jnp.sum(sampled_color * weights[..., None], axis=1)
    global_color = jnp.sum(
        global_color_pt.reshape(R, S, 3) * weights_global[..., None], axis=1)

    if background_rgb is not None:
        color = color + background_rgb * (1.0 - weights_sum)

    eik_num, eik_den = _eikonal_parts(gradients.reshape(R, S, 3), relaxed)
    return {
        "color": color,
        "global_color": global_color,
        "sdf": sdf,
        "dists": dists,
        "gradients": gradients.reshape(R, S, 3),
        "s_val": jnp.full((R, 1), 1.0, dtype=color.dtype) / inv_s,
        "mid_z_vals": mid_z_vals,
        "weights": weights,
        "cdf": prev_cdf.reshape(R, S),
        "gradient_error": eik_num / (eik_den + 1e-5),
        "eik_num": eik_num,
        "eik_den": eik_den,
        "inside_sphere": inside,
        "delta_relight": delta_relight.reshape(R, S, 3),
    }
