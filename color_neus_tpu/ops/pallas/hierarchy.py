"""Fused hierarchical-sampling kernel: the ENTIRE no-grad z hierarchy
in one pallas call.

hierarchical_z_vals (models/neus.py) dispatches 5 sweep kernels and ~20
XLA fusions per step (coarse linspace, 4x up-sample alpha/CDF/inverse-
CDF/sorted-merge) — profiled at ~17 ms/step at the bench shape, of
which ~7 ms is XLA glue + layout copies. This kernel keeps the whole
hierarchy VMEM-resident per ray tile: HBM sees 16 floats of packed rays
in and the final point-major z out.

Semantics: up_sample_z + sample_pdf + merge_z_vals + the coarse
linspace/perturb of models/neus.py::hierarchical_z_vals, with the fixed
up-sample inv_s = 64*2^i (reference NeuS.py:347-355, ray_utils.py:
123-154, NeuS.py:183-197). Validated against that XLA path in
interpret mode (tests/test_hierarchy_kernel.py).

Layout playbook (same as ray_march.py): point-major [T = Rt*S, lanes]
with per-ray structure via a row-index iota (`loc = row % S`), doubling
scans for segmented cumsum/cumprod, and [Rt, T] 0/1 segment-matrix MXU
dots for per-ray reductions/broadcasts. Two extra conversions appear
here because sample_pdf/merge produce per-(ray, sample) values:

  * point->lane:  X_lane[Rt, S] = seg @ (onehot(loc) * x)   (one dot)
  * lane->point:  x_pt[T', 1]  = sum_lane (lane == loc') * seg_bcast(X)

Both keep every intermediate in VMEM; segment sizes grow statically
per round (S0, S0+m, ..., S0+steps*m), so the kernel is fully unrolled
with static shapes.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from color_neus_tpu.models.configs import RendererConfig
from color_neus_tpu.ops.pallas.point_pipeline import pe_basis
from color_neus_tpu.ops.pallas.ray_march import (
    _seg_matrix, _seg_sum, _seg_bcast, _shift_up, _shift_down,
    _seg_excl_cumprod,
)
from color_neus_tpu.ops.pallas.sdf_mlp import pack_sdf_weights, _sdf_layers


def _seg_excl_cumsum(x, loc, S, native):
    """C_i = sum_{j<i, same segment} x_j via doubling."""
    y = x
    k = 1
    while k < S:
        y = y + jnp.where(loc >= k, _shift_down(y, k, native), 0.0)
        k *= 2
    return jnp.where(loc >= 1, _shift_down(y, 1, native), 0.0)


def _pt_to_lane(seg, loc, x, S):
    """[T, 1] point-major -> [Rt, S] lane-major (one MXU dot)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, S), 1)
    onehot = (loc == lane).astype(jnp.float32)          # [T, S]
    return _seg_sum(seg, onehot * x)


def _lane_to_pt(seg_t, loc_t, X, S):
    """[Rt, S] lane-major -> [T', 1] point-major on segments of size S."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, S), 1)
    Xb = _seg_bcast(seg_t, X)                           # [T', S]
    return jnp.sum(jnp.where(lane == loc_t, Xb, 0.0), axis=1, keepdims=True)


def _hierarchy_kernel(meta, n_lin, S0, m, steps, Rt, native, sd_scale,
                      rays_ref, bmo_ref, bmd_ref, mix_ref, u_ref, *refs):
    ws = refs[:n_lin]
    bs = refs[n_lin:2 * n_lin]
    out_ref = refs[2 * n_lin]

    rays = rays_ref[0]                                  # [Rt, 16]
    bmo = bmo_ref[:]
    bmd = bmd_ref[:]
    mix = mix_ref[:]

    def mlp_sdf(raysb, z):
        """SDF at ro + rd*z for point-major rows (raysb [T,16], z [T,1])."""
        phase = (jnp.dot(raysb, bmo, preferred_element_type=jnp.float32)
                 + jnp.dot(raysb, bmd,
                           preferred_element_type=jnp.float32) * z)
        emb = (phase * mix[0:1] + jnp.sin(phase) * mix[1:2]
               + jnp.cos(phase) * mix[2:3])
        return _sdf_layers(meta, n_lin, ws, bs, emb)[:, 0:1] * (1.0 / sd_scale)

    # per-ray radius quadratic |ro + rd z|^2 = a + b z + c z^2
    ro = rays[:, 0:3]
    rd = rays[:, 4:7]
    qa = jnp.sum(ro * ro, axis=1, keepdims=True)        # [Rt, 1]
    qb = 2.0 * jnp.sum(ro * rd, axis=1, keepdims=True)
    qc = jnp.sum(rd * rd, axis=1, keepdims=True)

    # ---- coarse z: near + (far-near) * linspace(0,1,S0) + t_rand*2/S0
    T0 = Rt * S0
    loc0 = jax.lax.broadcasted_iota(jnp.int32, (T0, 1), 0) % S0
    seg0 = _seg_matrix(Rt, T0, S0)
    near_b = _seg_bcast(seg0, rays[:, 3:4])
    far_b = _seg_bcast(seg0, rays[:, 7:8])
    tr_b = _seg_bcast(seg0, rays[:, 8:9])
    t01 = loc0.astype(jnp.float32) * (1.0 / (S0 - 1))
    z = near_b + (far_b - near_b) * t01 + tr_b * (2.0 / S0)
    raysb0 = _seg_bcast(seg0, rays)
    sdf = mlp_sdf(raysb0, z)

    u_row = u_ref[:]                                    # [1, m]

    S = S0
    for rnd in range(steps):
        T = Rt * S
        loc = jax.lax.broadcasted_iota(jnp.int32, (T, 1), 0) % S
        seg = _seg_matrix(Rt, T, S)
        inv_s = float(64 * 2 ** rnd)
        sec = (loc < S - 1).astype(jnp.float32)          # section rows

        # ---- up_sample_z: section alphas from the linear SDF model
        r2 = _seg_bcast(seg, qa) + _seg_bcast(seg, qb) * z \
            + _seg_bcast(seg, qc) * z * z
        r2n = _shift_up(r2, 1, native)
        inside = jnp.where((r2 < 1.0) | (r2n < 1.0), 1.0, 0.0) * sec
        sdf_n = _shift_up(sdf, 1, native)
        z_n = _shift_up(z, 1, native)
        mid = (sdf + sdf_n) * 0.5
        cosv = (sdf_n - sdf) / (z_n - z + 1e-5)
        cos_prev = jnp.where(loc >= 1, _shift_down(cosv, 1, native), 0.0)
        cosv = jnp.minimum(cos_prev, cosv)
        cosv = jnp.clip(cosv, -1e3, 0.0) * inside
        dist = z_n - z
        pe = mid - cosv * dist * 0.5
        ne = mid + cosv * dist * 0.5
        pc = jax.nn.sigmoid(pe * inv_s)
        nc = jax.nn.sigmoid(ne * inv_s)
        alpha = (pc - nc + 1e-5) / (pc + 1e-5) * sec

        # ---- sample_pdf (det): weights -> cdf -> inverse CDF at u
        w = alpha * _seg_excl_cumprod(1.0 - alpha + 1e-7, loc, S, native)
        wp = (w + 1e-5) * sec
        wsum = _seg_bcast(seg, _seg_sum(seg, wp))
        pdf = wp / wsum
        cdf = _seg_excl_cumsum(pdf, loc, S, native)      # cdf_i = sum_{j<i}
        C = jnp.where(cdf <= u_row, 1.0, 0.0)            # [T, m]
        inds = _seg_sum(seg, C)                          # [Rt, m] counts
        below = jnp.maximum(inds - 1.0, 0.0)
        above = jnp.minimum(inds, float(S - 1))
        locf = loc.astype(jnp.float32)
        mb = jnp.where(locf == _seg_bcast(seg, below), 1.0, 0.0)   # [T, m]
        ma = jnp.where(locf == _seg_bcast(seg, above), 1.0, 0.0)
        cdf_b = _seg_sum(seg, mb * cdf)
        cdf_a = _seg_sum(seg, ma * cdf)
        z_b = _seg_sum(seg, mb * z)
        z_a = _seg_sum(seg, ma * z)
        denom = cdf_a - cdf_b
        denom = jnp.where(denom < 1e-5, 1.0, denom)
        tt = (u_row - cdf_b) / denom
        newz = z_b + tt * (z_a - z_b)                    # [Rt, m] lane-major

        # ---- merge ranks (ties keep old-before-new, as the XLA merge)
        Nb = _seg_bcast(seg, newz)                       # [T, m]
        pos_a = locf + jnp.sum(jnp.where(Nb < z, 1.0, 0.0),
                               axis=1, keepdims=True)    # [T, 1]
        lane_m = jax.lax.broadcasted_iota(jnp.int32, (1, m), 1)
        pos_b = (lane_m.astype(jnp.float32)
                 + _seg_sum(seg, jnp.where(z <= Nb, 1.0, 0.0)))  # [Rt, m]

        # ---- new-z sdf sweep (not needed after the last round)
        last = rnd + 1 == steps
        S2 = S + m
        T2 = Rt * S2
        loc2 = jax.lax.broadcasted_iota(jnp.int32, (T2, 1), 0) % S2
        seg2 = _seg_matrix(Rt, T2, S2)
        loc2f = loc2.astype(jnp.float32)

        # place old rows: lane-major pos_a/z, match against output loc
        z_lane = _pt_to_lane(seg, loc, z, S)             # [Rt, S]
        posa_lane = _pt_to_lane(seg, loc, pos_a, S)
        Ma = jnp.where(_seg_bcast(seg2, posa_lane) == loc2f, 1.0, 0.0)
        z2 = jnp.sum(Ma * _seg_bcast(seg2, z_lane), axis=1, keepdims=True)
        Mb2 = jnp.where(_seg_bcast(seg2, pos_b) == loc2f, 1.0, 0.0)
        z2 = z2 + jnp.sum(Mb2 * _seg_bcast(seg2, newz), axis=1, keepdims=True)

        if not last:
            Tn = Rt * m
            locn = jax.lax.broadcasted_iota(jnp.int32, (Tn, 1), 0) % m
            segn = _seg_matrix(Rt, Tn, m)
            zn_pt = _lane_to_pt(segn, locn, newz, m)     # [Tn, 1]
            raysbn = _seg_bcast(segn, rays)
            sdfn_pt = mlp_sdf(raysbn, zn_pt)
            sdfn_lane = _pt_to_lane(segn, locn, sdfn_pt, m)   # [Rt, m]
            sdf_lane = _pt_to_lane(seg, loc, sdf, S)
            sdf = (jnp.sum(Ma * _seg_bcast(seg2, sdf_lane),
                           axis=1, keepdims=True)
                   + jnp.sum(Mb2 * _seg_bcast(seg2, sdfn_lane),
                             axis=1, keepdims=True))
        z = z2
        S = S2

    out_ref[:] = z                                       # [T_final, 1]


def _hier_entry(meta, n_lin, S0, m, steps, Rt, native, sd_scale, *refs):
    _hierarchy_kernel(meta, n_lin, S0, m, steps, Rt, native, sd_scale, *refs)


def fused_hierarchy_available() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def fused_hierarchy_z(params_sdf: dict, rcfg: RendererConfig,
                      rays_o, rays_d, near, far, t_rand=None,
                      tile_rays: int | None = None, interpret: bool = False):
    """Full hierarchical z values, [R, n_samples + n_importance].

    Drop-in for hierarchical_z_vals on the fused training path: one
    pallas call per step instead of 5 sweeps + the up-sample/merge XLA
    glue. t_rand [R, 1] is the coarse perturb draw (uniform - 0.5), or
    None for deterministic sampling. Everything is outside the autodiff
    graph (the hierarchy is no-grad; stop_gradient applied on entry).
    """
    S0 = rcfg.n_samples
    steps = rcfg.up_sample_steps
    m = rcfg.n_importance // steps
    S4 = S0 + steps * m
    R = rays_o.shape[0]
    # Hierarchy tiles are much lighter than march tiles (8-layer SDF
    # value sweep, no grads, no stash): the march formula's Rt=2 left
    # the per-tile MLPs 128-512 rows — latency-bound — and serialized
    # ~R/2 grid steps (47 ms at the flagship shape). 4096 points/tile
    # keeps every in-kernel sweep >=512 rows while the [T, S] one-hot
    # merge masks stay ~7 MB (VMEM cap 100 MB).
    # tile priority: explicit arg > hier_tile config field > auto
    # (~4096 points). Clamped to >= 1 (0/negative would corrupt the
    # padding arithmetic below).
    Rt = max(1, int(tile_rays or rcfg.hier_tile
                    or min(64, max(1, 4096 // S4))))
    R_pad = (R + Rt - 1) // Rt * Rt

    rays_o = jax.lax.stop_gradient(rays_o)
    rays_d = jax.lax.stop_gradient(rays_d)
    near = jnp.reshape(jax.lax.stop_gradient(near), (R, 1))
    far = jnp.reshape(jax.lax.stop_gradient(far), (R, 1))
    if t_rand is None:
        t_rand = jnp.zeros((R, 1), jnp.float32)
    t_rand = jax.lax.stop_gradient(t_rand)

    rays = jnp.concatenate(
        [rays_o, near, rays_d, far, t_rand,
         jnp.zeros((R, 7), jnp.float32)], axis=1)        # [R, 16]
    if R_pad != R:
        rays = jnp.zeros((R_pad, 16), jnp.float32).at[:R].set(rays)
    G = R_pad // Rt
    rays3 = rays.reshape(G, Rt, 16)

    ws, bs, meta = pack_sdf_weights(jax.lax.stop_gradient(params_sdf),
                                    rcfg.sdf)
    if not interpret:
        # bf16 sweep dots (_sdf_layers follows the weight dtype), same
        # as the production XLA sweep path (sdf_mlp.py bf16 note): the
        # hierarchy only places no-grad z samples, and the coarse sweep
        # is the kernel's one throughput-bound matmul block.
        ws = tuple(w.astype(jnp.bfloat16) for w in ws)
    n_lin = meta["n_lin"]
    d0p = meta["d0p"]
    bm = pe_basis(rcfg.sdf.multires, rcfg.sdf.scale, 0, d0p)
    bmo = jnp.zeros((16, d0p), jnp.float32).at[0:3].set(bm[0:3])
    bmd = jnp.zeros((16, d0p), jnp.float32).at[4:7].set(bm[0:3])
    mix = bm[8:11]                                       # raw/sin/cos masks
    # the same stratified midpoints as ops/rays.py::sample_pdf(det=True)
    u_row = jnp.linspace(0.5 / m, 1.0 - 0.5 / m, m,
                         dtype=jnp.float32)[None, :]

    T4 = Rt * S4
    in_specs = [
        pl.BlockSpec((1, Rt, 16), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(bmo.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(bmd.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(mix.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(u_row.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    for x in (*ws, *bs):
        in_specs.append(pl.BlockSpec(x.shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
    kw = {} if interpret else {
        "compiler_params": pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)}
    out = pl.pallas_call(
        partial(_hier_entry, meta, n_lin, S0, m, steps, Rt, not interpret,
                rcfg.sdf.scale),
        grid=(G,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((T4, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R_pad * S4, 1), jnp.float32),
        interpret=interpret,
        **kw,
    )(rays3, bmo, bmd, mix, u_row, *ws, *bs)
    return jax.lax.stop_gradient(out.reshape(R_pad, S4)[:R])


def resolve_hierarchy_mode(rcfg: RendererConfig) -> bool | str:
    """Whether the fused hierarchy kernel should run: False, True, or
    'interpret'. 'auto' currently resolves to OFF: at the flagship shape
    (S0=256, m=64, 4 rounds) the segment-matrix formulation measured
    47 ms vs 20.5 ms for the XLA hierarchy on the v5e — the [T, S]
    one-hot masks are O(S^2) VPU work per ray per round. Kept for the
    interpret-mode spec tests; a lane-major rewrite (scans along lanes,
    bitonic merge) is the path to turning it on."""
    mode = rcfg.fused_hierarchy
    if mode == "off" or rcfg.n_importance <= 0:
        return False
    if rcfg.n_importance % rcfg.up_sample_steps != 0:
        return False
    if mode == "interpret":
        return "interpret"
    if mode == "on":
        return True
    return False
