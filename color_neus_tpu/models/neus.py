"""NeuS volume renderer — the numerical core, as pure jittable functions.

Re-derivation of the reference renderer (lib/models/renderers/NeuS.py) in
TPU-first form: every stage has static shapes (the 4 up-sample rounds are
unrolled, 64 -> 64+16k samples), the no-grad hierarchy is cut from the
autodiff graph with stop_gradient, and the per-sample MLP sweeps are plain
batched GEMMs XLA tiles onto the MXU. The SDF evaluation used by the
no-grad sweeps is pluggable (`sdf_fn`) so the fused Pallas kernel in
color_neus_tpu/ops/pallas can be swapped in.

Behavioral quirks preserved for parity (SURVEY §3.6):
  * up-sampling uses fixed inv_s = 64 * 2^i, not the learned one
    (NeuS.py:348-349)
  * cos_anneal_ratio defaults to 0.0 — the trainer never schedules it
    (NeuS_Trainer.py:124); at 0 iter_cos = -relu(-cos*0.5+0.5)
  * alpha = clip((sig(prev*s)-sig(next*s)+1e-5)/(sig(prev*s)+1e-5), 0, 1)
  * eikonal averaged over the |p|<1.2 relaxed sphere (NeuS.py:277-279)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from color_neus_tpu.models.configs import RendererConfig
from color_neus_tpu.models import fields
from color_neus_tpu.ops.rays import sample_pdf


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------

def init_renderer(key, rcfg: RendererConfig, dtype=jnp.float32) -> dict:
    k_sdf, k_color, k_rel, k_nerf = jax.random.split(key, 4)
    params = {
        "sdf": fields.init_sdf(k_sdf, rcfg.sdf, dtype),
        "color": fields.init_color(k_color, rcfg.color, dtype),
        "variance": fields.init_variance(rcfg.variance, dtype),
    }
    if rcfg.kind == "color_neus":
        params["relight"] = fields.init_relight(k_rel, rcfg.relight, dtype)
    if rcfg.n_outside > 0:
        params["nerf"] = fields.init_nerf(k_nerf, rcfg.nerf, dtype)
    return params


# ---------------------------------------------------------------------------
# Shared compositing math
# ---------------------------------------------------------------------------

def exclusive_cumprod_weights(alpha: jnp.ndarray) -> jnp.ndarray:
    """weights = alpha * prod_{j<i} (1 - alpha_j + 1e-7)  (NeuS.py:269-270)."""
    trans = jnp.cumprod(1.0 - alpha + 1e-7, axis=-1)
    trans = jnp.concatenate([jnp.ones_like(trans[:, :1]), trans[:, :-1]], axis=-1)
    return alpha * trans


def section_dists(z_vals: jnp.ndarray, sample_dist: float):
    """Per-section lengths with the trailing sample_dist pad, and mids."""
    d = z_vals[:, 1:] - z_vals[:, :-1]
    dists = jnp.concatenate([d, jnp.full_like(d[:, :1], sample_dist)], axis=-1)
    mid_z_vals = z_vals + dists * 0.5
    return dists, mid_z_vals


def neus_alpha(sdf, iter_cos, dists, inv_s):
    """Section alpha from estimated prev/next SDF (NeuS.py:244-254). All [R, S]."""
    est_next = sdf + iter_cos * dists * 0.5
    est_prev = sdf - iter_cos * dists * 0.5
    prev_cdf = jax.nn.sigmoid(est_prev * inv_s)
    next_cdf = jax.nn.sigmoid(est_next * inv_s)
    alpha = jnp.clip((prev_cdf - next_cdf + 1e-5) / (prev_cdf + 1e-5), 0.0, 1.0)
    return alpha, prev_cdf


def anneal_cos(true_cos, cos_anneal_ratio):
    """The 'not dead at init' annealed cos (NeuS.py:241-242); always <= 0."""
    return -(jax.nn.relu(-true_cos * 0.5 + 0.5) * (1.0 - cos_anneal_ratio)
             + jax.nn.relu(-true_cos) * cos_anneal_ratio)


# ---------------------------------------------------------------------------
# Hierarchical sampling (no-grad)
# ---------------------------------------------------------------------------

def up_sample_z(rays_o, rays_d, z_vals, sdf, n_importance, inv_s):
    """One SDF-sign-change-guided importance round (NeuS.py:136-181).

    Estimates section alphas from a linear SDF model with slope
    min(cos, prev_cos) clipped to <= 0 and restricted inside the unit
    sphere, then inverse-CDF samples n_importance new z per ray.
    """
    # |ro + rd*z|^2 as a per-ray quadratic in z — never materializes the
    # [R, S, 3] points (the broadcasts cost ~1 ms/step at bench shape)
    a = jnp.sum(rays_o * rays_o, axis=-1, keepdims=True)
    b = 2.0 * jnp.sum(rays_o * rays_d, axis=-1, keepdims=True)
    c = jnp.sum(rays_d * rays_d, axis=-1, keepdims=True)
    radius = jnp.sqrt(jnp.maximum(a + b * z_vals + c * z_vals * z_vals, 0.0))
    inside_sphere = (radius[:, :-1] < 1.0) | (radius[:, 1:] < 1.0)

    prev_sdf, next_sdf = sdf[:, :-1], sdf[:, 1:]
    prev_z, next_z = z_vals[:, :-1], z_vals[:, 1:]
    mid_sdf = (prev_sdf + next_sdf) * 0.5
    cos_val = (next_sdf - prev_sdf) / (next_z - prev_z + 1e-5)

    prev_cos = jnp.concatenate([jnp.zeros_like(cos_val[:, :1]), cos_val[:, :-1]], axis=-1)
    cos_val = jnp.minimum(prev_cos, cos_val)
    cos_val = jnp.clip(cos_val, -1e3, 0.0) * inside_sphere

    dist = next_z - prev_z
    prev_esti = mid_sdf - cos_val * dist * 0.5
    next_esti = mid_sdf + cos_val * dist * 0.5
    prev_cdf = jax.nn.sigmoid(prev_esti * inv_s)
    next_cdf = jax.nn.sigmoid(next_esti * inv_s)
    alpha = (prev_cdf - next_cdf + 1e-5) / (prev_cdf + 1e-5)
    weights = exclusive_cumprod_weights(alpha)
    return sample_pdf(z_vals, weights, n_importance, det=True)


def merge_z_vals_sort(z_vals, new_z, sdf, new_sdf):
    """Sorted merge via one stable lax.sort of the concatenation.

    Ties keep old-before-new order because old precedes new in the
    concat and the sort is stable — identical semantics to
    merge_z_vals (torch.sort equivalence, NeuS.py:183-197)."""
    z_cat = jnp.concatenate([z_vals, new_z], axis=-1)
    if sdf is None:
        return jax.lax.sort(z_cat, dimension=-1, is_stable=True), None
    s_cat = jnp.concatenate([sdf, new_sdf], axis=-1)
    z, s = jax.lax.sort((z_cat, s_cat), dimension=-1, is_stable=True,
                        num_keys=1)
    return z, s


def merge_z_vals(z_vals, new_z, sdf, new_sdf):
    """Sorted merge of (z, sdf) with (new_z, new_sdf) along samples.

    Both inputs are per-ray sorted (coarse z is monotone; det sample_pdf
    output is monotone), so instead of a generic sort (NeuS.py:183-197
    uses torch.sort) we compute merge ranks with one counting compare —
    a [R, n, m] reduce on the VPU — and scatter. Ties keep old-before-new
    order, matching a stable sort of concat([z, new_z]).

    NOT on the hot path: the stable-sort merge (merge_z_vals_sort) won
    the on-chip bench and is what hierarchical_z_vals uses. This
    counting formulation is kept as the independently-derived oracle
    the two-implementation equality/bench check exercises
    (tools/merge_bench.py asserts bitwise-equal outputs)."""
    R, n = z_vals.shape
    m = new_z.shape[1]
    # rank of each old z in the merged list: own index + #(new < it)
    pos_a = jnp.arange(n)[None, :] + jnp.sum(
        new_z[:, None, :] < z_vals[:, :, None], axis=-1)
    # rank of each new z: own index + #(old <= it)
    pos_b = jnp.arange(m)[None, :] + jnp.sum(
        z_vals[:, :, None] <= new_z[:, None, :], axis=1)
    # place by equality-masked sum reduction: each output slot receives
    # exactly one contribution, and the [R, n, n+m] intermediate stays
    # virtual inside one XLA reduce fusion (the scatter formulation
    # lowers to scalar-core 1-D scatters, ~2x slower measured; the
    # one-hot MXU dot materialized GB-scale one-hots through HBM)
    k = jnp.arange(n + m)

    def _place(vals, pos):
        return jnp.sum(jnp.where(pos[:, :, None] == k,
                                 vals[:, :, None], 0.0), axis=1)

    z = _place(z_vals, pos_a) + _place(new_z, pos_b)
    if sdf is None:
        return z, None
    s = _place(sdf, pos_a) + _place(new_sdf, pos_b)
    return z, s


def hierarchical_z_vals(params, rcfg: RendererConfig, rays_o, rays_d, near, far,
                        key=None, perturb_overwrite: float = -1.0, sdf_fn=None,
                        sdf_rays_fn=None):
    """Coarse + SDF-guided importance z values, [R, n_samples+n_importance].

    Entirely outside the autodiff graph: inputs are stop_gradient'ed on
    entry (the torch.no_grad() analog, NeuS.py:343-355) so reverse-mode
    never tries to linearize the sweeps — required for the fused Pallas
    sdf_fn, which has no VJP rule, and cheaper for the XLA path too.
    """
    params = jax.lax.stop_gradient(params)
    rays_o = jax.lax.stop_gradient(rays_o)
    rays_d = jax.lax.stop_gradient(rays_d)
    near = jax.lax.stop_gradient(near)
    far = jax.lax.stop_gradient(far)
    R = rays_o.shape[0]
    n = rcfg.n_samples
    if sdf_fn is None:
        sdf_fn = lambda pts: fields.sdf_value(params["sdf"], rcfg.sdf, pts)[:, 0]

    t = jnp.linspace(0.0, 1.0, n, dtype=rays_o.dtype)
    z_vals = near[:, None] + (far - near)[:, None] * t[None, :]

    perturb = rcfg.perturb if perturb_overwrite < 0 else perturb_overwrite
    if perturb > 0:
        assert key is not None, "perturbed sampling needs a PRNG key"
        t_rand = jax.random.uniform(key, (R, 1), dtype=z_vals.dtype) - 0.5
        z_vals = z_vals + t_rand * 2.0 / n

    if rcfg.n_importance > 0:
        if sdf_rays_fn is not None:
            sweep = lambda z: sdf_rays_fn(rays_o, rays_d, z)
        else:
            sweep = lambda z: sdf_fn(
                (rays_o[:, None, :] + rays_d[:, None, :] * z[..., None])
                .reshape(-1, 3)).reshape(z.shape)
        sdf = sweep(z_vals)
        n_per_round = rcfg.n_importance // rcfg.up_sample_steps
        for i in range(rcfg.up_sample_steps):
            new_z = up_sample_z(rays_o, rays_d, z_vals, sdf, n_per_round, 64 * 2 ** i)
            last = i + 1 == rcfg.up_sample_steps
            # sort-based merge: measured ~1.4 ms/merge faster than the
            # counting-reduce form at the bench shape on the v5e
            # (tools/merge_bench.py), bit-identical output
            if last:
                z_vals, sdf = merge_z_vals_sort(z_vals, new_z, None, None)
            else:
                z_vals, sdf = merge_z_vals_sort(z_vals, new_z, sdf, sweep(new_z))

    return jax.lax.stop_gradient(z_vals)


# ---------------------------------------------------------------------------
# Background (NeRF++ inverted-sphere) model
# ---------------------------------------------------------------------------

def render_core_outside(params, rcfg: RendererConfig, rays_o, rays_d, z_vals,
                        sample_dist, background_rgb=None):
    """NeRF++ background shading (NeuS.py:95-134)."""
    R, S = z_vals.shape
    dists, mid_z_vals = section_dists(z_vals, sample_dist)
    pts = rays_o[:, None, :] + rays_d[:, None, :] * mid_z_vals[..., None]
    dis = jnp.linalg.norm(pts, axis=-1, keepdims=True).clip(1.0, 1e10)
    pts4 = jnp.concatenate([pts / dis, 1.0 / dis], axis=-1)
    dirs = jnp.broadcast_to(rays_d[:, None, :], (R, S, 3))

    density, raw_rgb = fields.nerf_apply(
        params["nerf"], rcfg.nerf, pts4.reshape(-1, 4), dirs.reshape(-1, 3))
    sampled_color = jax.nn.sigmoid(raw_rgb).reshape(R, S, 3)
    alpha = 1.0 - jnp.exp(-jax.nn.softplus(density.reshape(R, S)) * dists)
    weights = exclusive_cumprod_weights(alpha)
    color = jnp.sum(weights[..., None] * sampled_color, axis=1)
    if background_rgb is not None:
        color = color + background_rgb * (1.0 - jnp.sum(weights, axis=-1, keepdims=True))
    return {"color": color, "sampled_color": sampled_color, "alpha": alpha, "weights": weights}


# ---------------------------------------------------------------------------
# Render cores
# ---------------------------------------------------------------------------

def _use_fused_core(rcfg: RendererConfig) -> bool:
    if rcfg.fused_core == "off":
        return False
    if rcfg.fused_core in ("on", "interpret"):
        return True
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def eval_point_pipeline(params, rcfg: RendererConfig, pts, dirs):
    """(sdf [N,1], grad [N,3], gc [N,3], relit [N,3], delta [N,3]) via the
    fused Pallas pipeline when enabled, else the fields-based XLA path."""
    if _use_fused_core(rcfg):
        from color_neus_tpu.ops.pallas.point_pipeline import (
            resolve_dense, fused_point_pipeline)
        dense = resolve_dense(params, rcfg)
        return fused_point_pipeline(dense, rcfg, pts, dirs, tile=rcfg.fused_tile,
                                    interpret=(rcfg.fused_core == "interpret"))
    sdf, feature, gradients = fields.sdf_with_grad(params["sdf"], rcfg.sdf, pts)
    color = fields.color_apply(params["color"], rcfg.color, pts, gradients,
                               dirs, feature)
    if rcfg.kind == "color_neus":
        relit, delta = fields.relight_apply(params["relight"], rcfg.relight,
                                            color, pts, dirs, gradients)
        return sdf, gradients, color, relit, delta
    return sdf, gradients, color, color, jnp.zeros_like(color)


def _sample_points(rays_o, rays_d, z_vals, sample_dist):
    dists, mid_z_vals = section_dists(z_vals, sample_dist)
    pts = rays_o[:, None, :] + rays_d[:, None, :] * mid_z_vals[..., None]
    R, S = z_vals.shape
    dirs = jnp.broadcast_to(rays_d[:, None, :], (R, S, 3))
    return dists, mid_z_vals, pts.reshape(-1, 3), dirs.reshape(-1, 3)


def _sphere_masks(pts_flat, R, S):
    pts_norm = jnp.linalg.norm(pts_flat, axis=-1).reshape(R, S)
    inside = jax.lax.stop_gradient((pts_norm < 1.0).astype(pts_flat.dtype))
    relaxed = jax.lax.stop_gradient((pts_norm < 1.2).astype(pts_flat.dtype))
    return inside, relaxed


def _eikonal_error(gradients, relax_inside):
    """Mean squared (|grad|-1) over the relaxed sphere (NeuS.py:277-279)."""
    err = (jnp.linalg.norm(gradients, axis=-1) - 1.0) ** 2
    return jnp.sum(relax_inside * err) / (jnp.sum(relax_inside) + 1e-5)


def _eikonal_parts(gradients, relax_inside):
    """(numerator, denominator) form — recombinable across ray chunks."""
    err = (jnp.linalg.norm(gradients, axis=-1) - 1.0) ** 2
    return jnp.sum(relax_inside * err), jnp.sum(relax_inside)


def _blend_background(alpha, sampled_color, inside, background_alpha, background_sampled_color, S):
    alpha_in = alpha * inside + background_alpha[:, :S] * (1.0 - inside)
    alpha_full = jnp.concatenate([alpha_in, background_alpha[:, S:]], axis=-1)
    col_in = sampled_color * inside[..., None] + \
        background_sampled_color[:, :S] * (1.0 - inside)[..., None]
    col_full = jnp.concatenate([col_in, background_sampled_color[:, S:]], axis=1)
    return alpha_full, col_full


def render_core_neus(params, rcfg: RendererConfig, rays_o, rays_d, z_vals, sample_dist,
                     background_alpha=None, background_sampled_color=None,
                     background_rgb=None, cos_anneal_ratio: float = 0.0):
    """Plain NeuS core (NeuS.py:199-292)."""
    R, S = z_vals.shape
    dists, mid_z_vals, pts, dirs = _sample_points(rays_o, rays_d, z_vals, sample_dist)

    sdf, gradients, color_pt, _, _ = eval_point_pipeline(params, rcfg, pts, dirs)
    sampled_color = color_pt.reshape(R, S, 3)

    inv_s = fields.variance_inv_s(params["variance"])
    true_cos = jnp.sum(dirs * gradients, axis=-1, keepdims=True)
    iter_cos = anneal_cos(true_cos, cos_anneal_ratio)

    alpha, prev_cdf = neus_alpha(sdf.reshape(R, S),
                                 iter_cos.reshape(R, S), dists, inv_s)
    inside, relaxed = _sphere_masks(pts, R, S)

    if background_alpha is not None:
        alpha, sampled_color = _blend_background(
            alpha, sampled_color, inside, background_alpha, background_sampled_color, S)

    weights = exclusive_cumprod_weights(alpha)
    weights_sum = jnp.sum(weights, axis=-1, keepdims=True)
    color = jnp.sum(sampled_color * weights[..., None], axis=1)
    if background_rgb is not None:
        color = color + background_rgb * (1.0 - weights_sum)

    eik_num, eik_den = _eikonal_parts(gradients.reshape(R, S, 3), relaxed)
    return {
        "color": color,
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
    }


def _use_fused_march(rcfg: RendererConfig) -> bool:
    if rcfg.fused_march == "off" or rcfg.n_outside > 0:
        return False
    if rcfg.fused_march in ("on", "interpret"):
        return True
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def _fused_out16(params, rcfg: RendererConfig, rays_o, rays_d, near, far,
                 key, perturb_overwrite):
    """Hierarchical sampling + fused ray-march for one (shard of a) ray
    batch; [R, 16] per-ray loss partials (see fused_ray_march)."""
    from color_neus_tpu.ops.pallas.point_pipeline import resolve_dense
    from color_neus_tpu.ops.pallas.ray_march import fused_ray_march
    from color_neus_tpu.ops.pallas.sdf_mlp import resolve_sdf_sweep_fn

    # Hierarchy stays on the XLA path: with the fused sweeps + the
    # lax.sort merge it is ~2% of step device time at the bench shape
    # (reports/trace_r3_step_breakdown.json) — a fused-hierarchy kernel
    # prototype measured 2.3x SLOWER than this (per-ray [T,S] one-hot
    # masks are O(S^2) VPU work) and was removed.
    sdf_rays_fn = (resolve_sdf_sweep_fn(params["sdf"], rcfg.sdf,
                                        rcfg.fused_sdf,
                                        dtype=rcfg.sweep_dtype,
                                        act=rcfg.sweep_activation)
                   if rcfg.fused_sdf != "off" and rcfg.n_importance > 0
                   else None)
    z_vals = hierarchical_z_vals(params, rcfg, rays_o, rays_d, near, far,
                                 key=key,
                                 perturb_overwrite=perturb_overwrite,
                                 sdf_rays_fn=sdf_rays_fn)
    dense = resolve_dense(params, rcfg)
    inv_s = fields.variance_inv_s(params["variance"])
    S_total = z_vals.shape[1]
    tile_rays = (max(1, rcfg.march_tile // S_total) if rcfg.march_tile
                 else None)
    return fused_ray_march(dense, rcfg, rays_o, rays_d, z_vals, inv_s,
                           tile_rays=tile_rays,
                           save_acts=rcfg.march_acts,
                           interpret=(rcfg.fused_march == "interpret"))


def render_rays_train(params, rcfg: RendererConfig, rays_o, rays_d, near, far,
                      key=None, perturb_overwrite: float = -1.0, mesh=None):
    """Loss-path renderer: returns ONLY what compute_loss and the train
    aux consume (color_fine, weight_sum, gradient_error, the
    delta_relight per-ray sums, s_val).

    On TPU this runs the fused ray-march kernel (ops/pallas/ray_march):
    MLP + NeuS compositing + per-ray loss partials in one VMEM-resident
    pass — per ray HBM sees 8 floats of rays, S z-values, 16 outputs.
    Elsewhere (or fused_march='off') it reduces the full render_rays
    output to the same dict, so the two paths are interchangeable.

    With `mesh` set the fused path runs under shard_map: GSPMD cannot
    partition a pallas_call, so each device executes the kernels on its
    own ray shard (params replicated; shard_map's transpose psums the
    weight gradients). The eikonal ratio is assembled OUTSIDE the
    shard_map from globally-summed per-ray partials, so the sharded
    loss is bit-compatible with the single-device fused path. The
    perturb key is folded with the device's axis index, so perturbed
    z noise differs from the unsharded run (same distribution).
    """
    R = rays_o.shape[0]
    S = rcfg.n_samples + rcfg.n_importance
    if not _use_fused_march(rcfg):
        out = render_rays(params, rcfg, rays_o, rays_d, near, far, key=key,
                          perturb_overwrite=perturb_overwrite)
        ret = {
            "color_fine": out["color_fine"],
            "weight_sum": out["weight_sum"],
            "gradient_error": out["gradient_error"],
            "s_val": out["s_val"],
            "n_samples_total": S,
        }
        if "delta_relight" in out:
            ret["delta_sum"] = jnp.sum(out["delta_relight"], axis=(1, 2))
        return ret

    if mesh is not None:
        from jax.sharding import PartitionSpec as P
        from color_neus_tpu.parallel.mesh import RAY_AXIS

        def shard_fn(p, k, ro, rd, nr, fr):
            if k is not None:
                k = jax.random.fold_in(k, jax.lax.axis_index(RAY_AXIS))
            return _fused_out16(p, rcfg, ro, rd, nr, fr, k, perturb_overwrite)

        ray_spec = P(RAY_AXIS)
        out16 = jax.shard_map(
            shard_fn, mesh=mesh,
            in_specs=(P(), P(), ray_spec, ray_spec, ray_spec, ray_spec),
            out_specs=ray_spec, check_vma=False,
        )(params, key, rays_o, rays_d, near, far)
    else:
        out16 = _fused_out16(params, rcfg, rays_o, rays_d, near, far, key,
                             perturb_overwrite)
    inv_s = fields.variance_inv_s(params["variance"])
    ek_num = jnp.sum(out16[:, 5])
    ek_den = jnp.sum(out16[:, 6])
    ret = {
        "color_fine": out16[:, 0:3],
        "weight_sum": out16[:, 3:4],
        "gradient_error": ek_num / (ek_den + 1e-5),
        "s_val": jnp.broadcast_to(1.0 / inv_s, (R, 1)),
        "n_samples_total": S,
    }
    if rcfg.kind == "color_neus":
        ret["delta_sum"] = out16[:, 4]
    return ret


def render_rays(params, rcfg: RendererConfig, rays_o, rays_d, near, far,
                key=None, perturb_overwrite: float = -1.0, background_rgb=None,
                cos_anneal_ratio: float = 0.0, sdf_fn=None):
    """Full forward: hierarchical sampling + core (NeuS.py:294-408 semantics).

    Returns the reference's output dict: color_fine, s_val, cdf_fine,
    weight_sum, weight_max, gradients, weights, gradient_error,
    inside_sphere, depth (+ global_color / delta_relight for color_neus).
    """
    import contextlib
    if rcfg.compute_dtype != "float32":
        dtype_ctx = fields.compute_dtype(jnp.dtype(rcfg.compute_dtype))
    else:
        dtype_ctx = contextlib.nullcontext()
    with dtype_ctx:
        return _render_rays_inner(params, rcfg, rays_o, rays_d, near, far, key,
                                  perturb_overwrite, background_rgb,
                                  cos_anneal_ratio, sdf_fn)


def _render_rays_inner(params, rcfg, rays_o, rays_d, near, far, key,
                       perturb_overwrite, background_rgb, cos_anneal_ratio, sdf_fn):
    sample_dist = 2.0 / rcfg.n_samples
    sdf_rays_fn = None
    if sdf_fn is None and rcfg.fused_sdf != "off" and rcfg.n_importance > 0:
        from color_neus_tpu.ops.pallas.sdf_mlp import resolve_sdf_sweep_fn
        sdf_rays_fn = resolve_sdf_sweep_fn(params["sdf"], rcfg.sdf,
                                           rcfg.fused_sdf,
                                           dtype=rcfg.sweep_dtype,
                                           act=rcfg.sweep_activation)
    z_vals = hierarchical_z_vals(params, rcfg, rays_o, rays_d, near, far,
                                 key=key, perturb_overwrite=perturb_overwrite,
                                 sdf_fn=sdf_fn, sdf_rays_fn=sdf_rays_fn)

    background_alpha = None
    background_sampled_color = None
    z_vals_feed = z_vals
    if rcfg.n_outside > 0:
        # Inverted-sphere background samples beyond `far` (NeuS.py:315-336).
        R = rays_o.shape[0]
        t_out = jnp.linspace(1e-3, 1.0 - 1.0 / (rcfg.n_outside + 1.0), rcfg.n_outside,
                             dtype=z_vals.dtype)
        z_out = far[:, None] / jnp.flip(t_out, axis=-1)[None, :] + 1.0 / rcfg.n_samples
        z_vals_feed = jnp.sort(jnp.concatenate([z_vals, z_out], axis=-1), axis=-1)
        out = render_core_outside(params, rcfg, rays_o, rays_d, z_vals_feed, sample_dist)
        background_alpha = out["alpha"]
        background_sampled_color = out["sampled_color"]

    if rcfg.kind == "color_neus":
        from color_neus_tpu.models.color_neus import render_core_color_neus
        core = render_core_color_neus
    else:
        core = render_core_neus

    R = rays_o.shape[0]
    if rcfg.ray_chunk > 0 and R > rcfg.ray_chunk and R % rcfg.ray_chunk == 0:
        # Ray-chunked rematerialization: run the core per chunk under
        # jax.checkpoint so backward recomputes chunk activations instead
        # of holding O(R * S * width) buffers — the TPU analog of
        # gradient checkpointing over the ray axis.
        nc = R // rcfg.ray_chunk

        def chunk_fn(args):
            o, d, z, ba, bsc = args
            return core(params, rcfg, o, d, z, sample_dist,
                        background_alpha=ba, background_sampled_color=bsc,
                        background_rgb=background_rgb,
                        cos_anneal_ratio=cos_anneal_ratio)

        def _split(x):
            return None if x is None else x.reshape(nc, rcfg.ray_chunk, *x.shape[1:])

        xs = (_split(rays_o), _split(rays_d), _split(z_vals),
              _split(background_alpha), _split(background_sampled_color))
        if background_alpha is None:
            xs = xs[:3] + (jnp.zeros((nc, 1)), jnp.zeros((nc, 1)))

            def chunk_fn(args):  # noqa: F811 — background-free variant
                o, d, z, *_ = args
                return core(params, rcfg, o, d, z, sample_dist,
                            background_rgb=background_rgb,
                            cos_anneal_ratio=cos_anneal_ratio)

        outs = jax.lax.map(jax.checkpoint(chunk_fn), xs)
        ret = {}
        for k, v in outs.items():
            if k in ("eik_num", "eik_den", "gradient_error"):
                continue
            if v.ndim >= 2 and v.shape[1] == rcfg.ray_chunk:
                ret[k] = v.reshape(R, *v.shape[2:])
            else:  # flat per-point arrays like sdf [chunk*S, 1]
                ret[k] = v.reshape(v.shape[0] * v.shape[1], *v.shape[2:])
        ret["eik_num"] = jnp.sum(outs["eik_num"])
        ret["eik_den"] = jnp.sum(outs["eik_den"])
        ret["gradient_error"] = ret["eik_num"] / (ret["eik_den"] + 1e-5)
    else:
        ret = core(params, rcfg, rays_o, rays_d, z_vals, sample_dist,
                   background_alpha=background_alpha,
                   background_sampled_color=background_sampled_color,
                   background_rgb=background_rgb,
                   cos_anneal_ratio=cos_anneal_ratio)

    weights = ret["weights"]
    out = {
        "color_fine": ret["color"],
        "s_val": jnp.mean(jnp.broadcast_to(ret["s_val"], (z_vals.shape[0], 1)), axis=-1, keepdims=True),
        "cdf_fine": ret["cdf"],
        "weight_sum": jnp.sum(weights, axis=-1, keepdims=True),
        "weight_max": jnp.max(weights, axis=-1, keepdims=True),
        "gradients": ret["gradients"],
        "weights": weights,
        "gradient_error": ret["gradient_error"],
        "inside_sphere": ret["inside_sphere"],
        "depth": jnp.sum(weights * (z_vals_feed if rcfg.n_outside > 0 else z_vals), axis=-1),
    }
    for k in ("global_color", "delta_relight"):
        if k in ret:
            out[k] = ret[k]
    return out
