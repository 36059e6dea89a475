"""Fused ray-march kernels: MLP pipeline + NeuS compositing in one pass.

The training loss needs only PER-RAY quantities — composited color,
weight_sum, the delta_relight sum, and the eikonal partial sums
(models/trainer.py::compute_loss; reference NeuS_Trainer.py:129-171).
The per-point kernels still materialize [N, 16] outputs and re-read
them (plus the [N, 16] upstream cotangent and all the compositing
elementwise chains) through HBM — profiled at ~25 ms/step of "glue" at
1M points. These kernels keep the whole render core VMEM-resident:
per TILE of rays, HBM sees the packed rays [Rt, 8], z values [Rt*S],
and 16 output floats per ray.

Layout: everything stays POINT-major [T=Rt*S, lanes]; the per-ray
structure is expressed with
  * static segment masks from a row-index iota (`loc = row % S`),
  * segmented scans by Hillis-Steele doubling over sublane shifts
    (exclusive cumprod for transmittance, reverse cumsum for the
    alpha-through-transmittance cotangent),
  * one tiny [Rt, T] 0/1 segment-matrix dot for per-ray reductions and
    per-point broadcasts
— no lane<->sublane relayouts anywhere.

Semantics mirror models/neus.py::render_core_neus /
color_neus.py::render_core_color_neus with cos_anneal_ratio == 0 (the
reference never passes it, NeuS_Trainer.py:124) and no background
model (every shipped config; NeuS.py:199-292 core path). z_vals are
outside the autodiff graph (hierarchical sampling is no-grad).
Gradients flow to the dense MLP weights, the packed rays (pose/focal
refinement), and inv_s (the deviation parameter).

Validated against jax.grad of the XLA render core in interpret mode
(tests/test_ray_march.py).
"""

from __future__ import annotations

import math
import os
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from color_neus_tpu.models.configs import RendererConfig
from color_neus_tpu.ops.pallas.point_pipeline import (
    _BWD_STORE, _mlp_forward, _mlp_recompute, _mlp_pullback,
    pack_pipeline_weights, pe_bases, _rup, cast_kernel_weights,
    _sdf_store, flatten_stash, unflatten_stash, stash_lane_widths,
)


# ---------------------------------------------------------------------------
# segmented-scan primitives (point-major, segments of S rows)
# ---------------------------------------------------------------------------

def _shift_down(x, k, native):
    """Rows i -> i+k (toward larger index). CIRCULAR on the native path
    (pltpu.roll — sublane-dim concats of odd offsets fail Mosaic); every
    caller masks the wrapped rows via `loc`, so wrap content is dead."""
    if native:
        return pltpu.roll(x, k, axis=0)
    T = x.shape[0]
    return jnp.concatenate([x[T - k:], x[:T - k]], axis=0)


def _shift_up(x, k, native):
    if native:
        return pltpu.roll(x, x.shape[0] - k, axis=0)  # roll wants shift >= 0
    return jnp.concatenate([x[k:], x[:k]], axis=0)


def _seg_excl_cumprod(x, loc, S, native):
    """T_i = prod_{j<i, same segment} x_j via doubling (log2(S) shifts)."""
    y = x
    k = 1
    while k < S:
        y = y * jnp.where(loc >= k, _shift_down(y, k, native), 1.0)
        k *= 2
    return jnp.where(loc >= 1, _shift_down(y, 1, native), 1.0)


def _seg_rev_cumsum_excl(x, loc, S, native):
    """G_i = sum_{j>i, same segment} x_j."""
    y = x
    k = 1
    while k < S:
        y = y + jnp.where(loc < S - k, _shift_up(y, k, native), 0.0)
        k *= 2
    return y - x


def _seg_matrix(Rt, T, S):
    """[Rt, T] 0/1: seg[r, i] = (i // S == r)."""
    row = jax.lax.broadcasted_iota(jnp.int32, (Rt, T), 1) // S
    ray = jax.lax.broadcasted_iota(jnp.int32, (Rt, T), 0)
    return (row == ray).astype(jnp.float32)


def _seg_sum(seg, x):
    """[Rt, T] @ [T, d] -> [Rt, d] (f32 — positional data, no bf16).

    Rt == 1 (the production tile: one ray per tile at S = 512) skips
    the MXU dot — a [1, T] x [T, d] contraction is pure systolic
    fill/drain — for a VPU sublane reduction (bit-comparable: same
    pairwise f32 accumulation the MXU performs is replaced by XLA's
    tree reduce; tests cover both)."""
    if seg.shape[0] == 1:
        return jnp.sum(x, axis=0, keepdims=True)
    # Rt > 1: exact f32 without the MXU. An MXU dot at DEFAULT rounds
    # the PAYLOAD operand to bf16 (compositing partials and positional
    # data ride this), and 6-passing it at HIGHEST is fill/drain waste
    # for a K=T contraction. CONTIGUITY CONTRACT: the seg matrix must
    # be _seg_matrix's seg[r,i] = (i//S==r) — contiguous equal-length
    # segments — so reshape + mid-axis reduce is the same sum, exact,
    # fully vectorized on the VPU. A padded/non-contiguous seg would
    # silently mis-sum; the static assert guards the shape half of that
    # contract (ADVICE r4).
    Rt, T = seg.shape
    assert T % Rt == 0, f"_seg_sum needs contiguous segments: {T=} {Rt=}"
    S = T // Rt
    return jnp.sum(x.reshape(Rt, S, x.shape[1]), axis=1)


def _seg_bcast(seg, y):
    """[Rt, T]^T @ [Rt, d] -> [T, d]; Rt == 1 is a plain broadcast.
    Rt > 1: broadcast + collapse (exact f32 — see _seg_sum)."""
    if seg.shape[0] == 1:
        return jnp.broadcast_to(y, (seg.shape[1], y.shape[1]))
    Rt, T = seg.shape
    S = T // Rt
    d = y.shape[1]
    return jnp.broadcast_to(y[:, None], (Rt, S, d)).reshape(T, d)


# ---------------------------------------------------------------------------
# shared compositing recompute
# ---------------------------------------------------------------------------

def _composite_fwd(meta, T, S, sample_dist, loc, seg, rays, z, inv_s,
                   mlp_fn, native):
    """Common forward math for both kernels. Returns a dict of every
    intermediate the backward needs."""
    raysb = _seg_bcast(seg, rays)                      # [T, 8]
    dists = jnp.where(loc == S - 1, sample_dist,
                      _shift_up(z, 1, native) - z)     # [T, 1]
    mid = z + dists * 0.5
    ro = raysb[:, 0:3]
    rd = raysb[:, 4:7]
    pts = ro + rd * mid
    zero1 = jnp.zeros((T, 1), jnp.float32)
    pin = jnp.concatenate([pts, zero1, rd, zero1], axis=1)

    outs, stash = mlp_fn(pin)
    sdf, grad, gc, relit, delta = outs

    tc = jnp.sum(rd * grad, axis=1, keepdims=True)     # true cos
    u = -tc * 0.5 + 0.5
    ic = -jnp.maximum(u, 0.0)                          # iter_cos (anneal 0)
    ep = sdf - ic * dists * 0.5
    en = sdf + ic * dists * 0.5
    pc = jax.nn.sigmoid(ep * inv_s)
    nc = jax.nn.sigmoid(en * inv_s)
    q = (pc - nc + 1e-5) / (pc + 1e-5)
    alpha = jnp.clip(q, 0.0, 1.0)
    xv = 1.0 - alpha + 1e-7
    Tr = _seg_excl_cumprod(xv, loc, S, native)
    w = alpha * Tr

    relaxed = (jnp.sqrt(jnp.sum(pts * pts, axis=1, keepdims=True))
               < 1.2).astype(jnp.float32)
    normg = jnp.sqrt(jnp.sum(grad * grad, axis=1, keepdims=True))
    ek_err = (normg - 1.0) ** 2
    return dict(pin=pin, outs=outs, stash=stash, rd=rd, mid=mid,
                dists=dists, tc=tc, u=u, ep=ep, en=en, pc=pc, nc=nc, q=q,
                alpha=alpha, xv=xv, Tr=Tr, w=w, relaxed=relaxed,
                normg=normg, ek_err=ek_err)


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------

def _march_fwd_kernel(meta, T, S, bf16, sample_dist, save, refs):
    n_w = meta["n_sdf"] + meta["n_color"] + meta["n_relight"]
    n_t = meta["n_sdf"]
    rays_ref, z_ref, sinv_ref, bm_e_ref, bm_c_ref, bm_r_ref = refs[:6]
    w_refs = refs[6:6 + n_w]
    wt_refs = refs[6 + n_w:6 + n_w + n_t]
    b_refs = refs[6 + n_w + n_t:6 + 2 * n_w + n_t]
    if save:
        out_ref, sx_ref, scr_ref, sg_ref = refs[-4:]
    else:
        out_ref = refs[-1]

    Rt = T // S
    loc = jax.lax.broadcasted_iota(jnp.int32, (T, 1), 0) % S
    seg = _seg_matrix(Rt, T, S)
    inv_s = sinv_ref[:][0:1, 0:1]

    def mlp_fn(pin):
        if save:
            # stash-producing forward: same GEMM chain as _mlp_forward,
            # layer inputs/gates kept for HBM export
            return _mlp_recompute(meta, T, bf16, w_refs, wt_refs, b_refs,
                                  bm_e_ref, bm_c_ref, bm_r_ref, pin)
        o = _mlp_forward(meta, T, bf16, w_refs, wt_refs, b_refs,
                         bm_e_ref, bm_c_ref, bm_r_ref, pin)
        return o, None

    c = _composite_fwd(meta, T, S, sample_dist, loc, seg,
                       rays_ref[0], z_ref[:], inv_s, mlp_fn, bf16)
    _sdf, _grad, _gc, relit, delta = c["outs"]
    w = c["w"]
    payload = jnp.concatenate([
        w * relit,                                     # 0:3 color terms
        w,                                             # 3 weight
        jnp.sum(delta, axis=1, keepdims=True),         # 4 delta sum
        c["relaxed"] * c["ek_err"],                    # 5 eik numerator
        c["relaxed"],                                  # 6 eik denominator
        jnp.zeros((T, 9), jnp.float32),
    ], axis=1)                                         # [T, 16]
    out_ref[:] = _seg_sum(seg, payload)[None]          # [1, Rt, 16]
    if save:
        SX, SCR, SG = flatten_stash(meta, c["outs"], c["stash"])
        # pack the compositing scalars into SG's free f32 lanes
        # (13:21) so the backward loads them instead of re-running the
        # compositing forward (incl. the transmittance cumprod scan) —
        # bit-identical values, ~zero extra bytes (the lanes were zero
        # padding)
        comp = jnp.concatenate(
            [c["ep"], c["en"], c["pc"], c["nc"], c["q"], c["u"],
             c["Tr"], c["w"]], axis=1)                 # [T, 8]
        SG = jnp.concatenate([SG[:, :13], comp, SG[:, 21:]], axis=1)
        sx_ref[:] = SX
        scr_ref[:] = SCR
        sg_ref[:] = SG


def _march_fwd_entry(meta, T, S, bf16, sample_dist, save, *refs):
    _march_fwd_kernel(meta, T, S, bf16, sample_dist, save, refs)


# ---------------------------------------------------------------------------
# backward kernel
# ---------------------------------------------------------------------------

def _march_bwd_kernel(meta, T, S, bf16, sample_dist, load, refs):
    n_w = meta.n_sdf + meta.n_color + meta.n_relight
    (rays_ref, z_ref, sinv_ref, bm_e_ref, bm_c_ref, bm_r_ref,
     gbar_ref) = refs[:7]
    if load:
        sx_ref, scr_ref, sg_ref = refs[7:10]
        base = 10
    else:
        base = 7
    w_refs = refs[base:base + n_w]
    wt_refs = refs[base + n_w:base + 2 * n_w]
    b_refs = refs[base + 2 * n_w:base + 3 * n_w]
    out_refs = refs[base + 3 * n_w:]
    rays_hat_ref = out_refs[0]
    sinv_hat_ref = out_refs[1]
    w_hat_refs = out_refs[2:2 + n_w]
    b_hat_refs = out_refs[2 + n_w:2 + 2 * n_w]

    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        sinv_hat_ref[:] = jnp.zeros_like(sinv_hat_ref)
        for r in w_hat_refs:
            r[:] = jnp.zeros_like(r)
        for r in b_hat_refs:
            r[:] = jnp.zeros_like(r)

    Rt = T // S
    loc = jax.lax.broadcasted_iota(jnp.int32, (T, 1), 0) % S
    seg = _seg_matrix(Rt, T, S)
    inv_s = sinv_ref[:][0:1, 0:1]

    if load:
        # geometry rebuilt (cheap [T, 8]-level ops); MLP values +
        # compositing scalars loaded from the stash — the compositing
        # forward (incl. the transmittance cumprod scan) is NOT re-run
        z = z_ref[:]
        raysb = _seg_bcast(seg, rays_ref[0])
        dists = jnp.where(loc == S - 1, sample_dist,
                          _shift_up(z, 1, bf16) - z)
        mid = z + dists * 0.5
        rd = raysb[:, 4:7]
        pts = raysb[:, 0:3] + rd * mid
        zero1 = jnp.zeros((T, 1), jnp.float32)
        pin = jnp.concatenate([pts, zero1, rd, zero1], axis=1)
        outs, stash = unflatten_stash(meta, pin, bm_e_ref, bm_c_ref,
                                      bm_r_ref, sx_ref[:], scr_ref[:],
                                      sg_ref[:], bf16=bf16)
        _sdf, grad_v, _gc, _relit, _delta = outs
        sg = sg_ref[:]
        q = sg[:, 17:18]
        alpha = jnp.clip(q, 0.0, 1.0)
        relaxed = (jnp.sqrt(jnp.sum(pts * pts, axis=1, keepdims=True))
                   < 1.2).astype(jnp.float32)
        normg = jnp.sqrt(jnp.sum(grad_v * grad_v, axis=1, keepdims=True))
        tc = jnp.sum(rd * grad_v, axis=1, keepdims=True)
        c = dict(pin=pin, outs=outs, stash=stash, rd=rd, mid=mid,
                 dists=dists, tc=tc, u=sg[:, 18:19], ep=sg[:, 13:14],
                 en=sg[:, 14:15], pc=sg[:, 15:16], nc=sg[:, 16:17], q=q,
                 alpha=alpha, xv=1.0 - alpha + 1e-7, Tr=sg[:, 19:20],
                 w=sg[:, 20:21], relaxed=relaxed, normg=normg)
    else:
        def mlp_fn(pin):
            return _mlp_recompute(meta, T, bf16, w_refs, wt_refs, b_refs,
                                  bm_e_ref, bm_c_ref, bm_r_ref, pin)

        c = _composite_fwd(meta, T, S, sample_dist, loc, seg,
                           rays_ref[0], z_ref[:], inv_s, mlp_fn, bf16)
    _sdf, grad, _gc, relit, _delta = c["outs"]
    w, Tr, xv, q, pc, nc = c["w"], c["Tr"], c["xv"], c["q"], c["pc"], c["nc"]
    rd, mid = c["rd"], c["mid"]

    # ---------- compositing backward ----------
    gb = _seg_bcast(seg, gbar_ref[0])                  # [T, 16] per-point
    cbar = gb[:, 0:3]
    wsum_bar = gb[:, 3:4]
    dsum_bar = gb[:, 4:5]
    ekn_bar = gb[:, 5:6]

    relit_hat = w * cbar
    delta_hat = jnp.broadcast_to(dsum_bar, (T, 3))
    w_bar = jnp.sum(relit * cbar, axis=1, keepdims=True) + wsum_bar

    G = _seg_rev_cumsum_excl(w_bar * w, loc, S, bf16)
    alpha_bar = w_bar * Tr - G / xv
    # clip(q, 0, 1) cotangent: balanced ties (0.5 at the bounds) — the
    # lax.clamp VJP rule
    gate = (jnp.where(q < 1.0, 1.0, jnp.where(q == 1.0, 0.5, 0.0))
            * jnp.where(q > 0.0, 1.0, jnp.where(q == 0.0, 0.5, 0.0)))
    q_bar = alpha_bar * gate
    pc_bar = q_bar * (1.0 - q) / (pc + 1e-5)
    nc_bar = -q_bar / (pc + 1e-5)
    dpc = pc * (1.0 - pc)
    dnc = nc * (1.0 - nc)
    ep_bar = pc_bar * dpc * inv_s
    en_bar = nc_bar * dnc * inv_s
    sinv_pt = pc_bar * dpc * c["ep"] + nc_bar * dnc * c["en"]

    sdf_hat = ep_bar + en_bar
    ic_bar = (en_bar - ep_bar) * c["dists"] * 0.5
    u_bar = -ic_bar * (c["u"] > 0.0)
    tc_bar = -0.5 * u_bar
    grad_hat = (tc_bar * rd
                + ekn_bar * c["relaxed"] * 2.0 * (c["normg"] - 1.0)
                * grad / c["normg"])
    gc_hat = jnp.zeros((T, 3), jnp.float32)

    # ---------- MLP pullback (accumulates weight grads) ----------
    pin_hat = _mlp_pullback(
        meta, T, bf16, w_refs, wt_refs, b_refs, w_hat_refs, b_hat_refs,
        bm_e_ref, bm_c_ref, bm_r_ref, c["pin"], c["outs"], c["stash"],
        sdf_hat, grad_hat, gc_hat, relit_hat, delta_hat)

    pts_bar = pin_hat[:, 0:3]
    rd_bar = pin_hat[:, 4:7] + tc_bar * grad + pts_bar * mid
    zero1 = jnp.zeros((T, 1), jnp.float32)
    rays_payload = jnp.concatenate([pts_bar, zero1, rd_bar, zero1], axis=1)
    rays_hat_ref[:] = _seg_sum(seg, rays_payload)[None]  # [1, Rt, 8]

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    sinv_hat_ref[:] += jnp.where(lane == 0, jnp.sum(sinv_pt), 0.0)


def _march_bwd_entry(meta, T, S, bf16, sample_dist, load, *refs):
    _march_bwd_kernel(meta, T, S, bf16, sample_dist, load, refs)


# ---------------------------------------------------------------------------
# pallas_call plumbing + custom_vjp
# ---------------------------------------------------------------------------

def _const_spec(x):
    return pl.BlockSpec(x.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)


def _march_fwd_call(meta, TS, interpret, sample_dist, ws, bs,
                    rays, z_pt, sinv, bm_e, bm_c, bm_r, save=False):
    T, S = TS
    Rt = T // S
    n_pad = z_pt.shape[0]
    grid = (n_pad // T,)
    ws_in = cast_kernel_weights(meta, ws, interpret)
    wts_in = tuple(w.T for w in ws_in[:meta.n_sdf])
    G = n_pad // T
    # per-ray arrays carry a leading grid dim so their (1, Rt, d) blocks
    # satisfy the Mosaic last-two-dims tiling rule for small Rt
    rays3 = rays.reshape(G, Rt, 8)
    in_specs = [
        pl.BlockSpec((1, Rt, 8), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((T, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        _const_spec(sinv), _const_spec(bm_e), _const_spec(bm_c),
        _const_spec(bm_r),
    ]
    for x in (*ws_in, *wts_in, *bs):
        in_specs.append(_const_spec(x))
    out_specs = [pl.BlockSpec((1, Rt, 16), lambda i: (i, 0, 0),
                              memory_space=pltpu.VMEM)]
    out_shape = [jax.ShapeDtypeStruct((G, Rt, 16), jnp.float32)]
    if save:
        store = jnp.float32 if interpret else _BWD_STORE[0]
        sx_store = _sdf_store(meta, not interpret)
        DX, DCR, DG = stash_lane_widths(meta)
        for D, dt in ((DX, sx_store), (DCR, store), (DG, jnp.float32)):
            out_specs.append(pl.BlockSpec((T, D), lambda i: (i, 0),
                                          memory_space=pltpu.VMEM))
            out_shape.append(jax.ShapeDtypeStruct((n_pad, D), dt))
    kw = {} if interpret else {
        "compiler_params": pltpu.CompilerParams(
            vmem_limit_bytes=112 * 1024 * 1024)}
    outs = pl.pallas_call(
        partial(_march_fwd_entry, meta, T, S, not interpret, sample_dist,
                save),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs if save else out_specs[0],
        out_shape=out_shape if save else out_shape[0],
        interpret=interpret,
        **kw,
    )(rays3, z_pt, sinv, bm_e, bm_c, bm_r, *ws_in, *wts_in, *bs)
    if save:
        return outs[0].reshape(n_pad // S, 16), outs[1], outs[2], outs[3]
    return outs.reshape(n_pad // S, 16)


def _march_bwd_call(meta, TS, interpret, sample_dist, ws, bs,
                    rays, z_pt, sinv, bm_e, bm_c, bm_r, gbar,
                    stashes=None):
    T, S = TS
    Rt = T // S
    n_pad = z_pt.shape[0]
    grid = (n_pad // T,)
    load = stashes is not None
    ws_in = cast_kernel_weights(meta, ws, interpret)
    wts_in = tuple(w.T for w in ws_in)
    G = n_pad // T
    rays3 = rays.reshape(G, Rt, 8)
    gbar3 = gbar.reshape(G, Rt, 16)
    in_specs = [
        pl.BlockSpec((1, Rt, 8), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((T, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        _const_spec(sinv), _const_spec(bm_e), _const_spec(bm_c),
        _const_spec(bm_r),
        pl.BlockSpec((1, Rt, 16), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    extra_in = ()
    if load:
        extra_in = tuple(stashes)
        for s in extra_in:
            in_specs.append(pl.BlockSpec((T, s.shape[1]), lambda i: (i, 0),
                                         memory_space=pltpu.VMEM))
    for x in (*ws_in, *wts_in, *bs):
        in_specs.append(_const_spec(x))

    out_specs = [
        pl.BlockSpec((1, Rt, 8), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        _const_spec(sinv),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((G, Rt, 8), jnp.float32),
        jax.ShapeDtypeStruct(sinv.shape, jnp.float32),
    ]
    for w in ws:
        out_specs.append(_const_spec(w))
        out_shape.append(jax.ShapeDtypeStruct(w.shape, jnp.float32))
    for b in bs:
        out_specs.append(_const_spec(b))
        out_shape.append(jax.ShapeDtypeStruct(b.shape, jnp.float32))

    kw = {} if interpret else {
        "compiler_params": pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=112 * 1024 * 1024)}
    outs = pl.pallas_call(
        partial(_march_bwd_entry, meta, T, S, not interpret, sample_dist,
                load),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        **kw,
    )(rays3, z_pt, sinv, bm_e, bm_c, bm_r, gbar3, *extra_in,
      *ws_in, *wts_in, *bs)
    n_w = len(ws)
    rays_hat, sinv_hat = outs[0].reshape(n_pad // S, 8), outs[1]
    w_hats = list(outs[2:2 + n_w])
    b_hats = list(outs[2 + n_w:])
    return rays_hat, sinv_hat, w_hats, b_hats


@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4))
def _march_core(meta, TS, interpret, sample_dist, save, ws, bs, rays, z_pt,
                sinv, bm_e, bm_c, bm_r):
    return _march_fwd_call(meta, TS, interpret, sample_dist, ws, bs,
                           rays, z_pt, sinv, bm_e, bm_c, bm_r)


def _march_core_fwd(meta, TS, interpret, sample_dist, save, ws, bs, rays,
                    z_pt, sinv, bm_e, bm_c, bm_r):
    if save:
        out, SX, SCR, SG = _march_fwd_call(
            meta, TS, interpret, sample_dist, ws, bs,
            rays, z_pt, sinv, bm_e, bm_c, bm_r, save=True)
        stashes = (SX, SCR, SG)
    else:
        out = _march_fwd_call(meta, TS, interpret, sample_dist, ws, bs,
                              rays, z_pt, sinv, bm_e, bm_c, bm_r)
        stashes = None
    return out, (ws, bs, rays, z_pt, sinv, bm_e, bm_c, bm_r, stashes)


def _march_core_bwd(meta, TS, interpret, sample_dist, save, res, gbar):
    ws, bs, rays, z_pt, sinv, bm_e, bm_c, bm_r, stashes = res
    rays_hat, sinv_hat, w_hats, b_hats = _march_bwd_call(
        meta, TS, interpret, sample_dist, ws, bs, rays, z_pt, sinv,
        bm_e, bm_c, bm_r, gbar, stashes=stashes)
    # z is outside the autodiff graph (no-grad sampling); pe bases const
    return (tuple(w_hats), tuple(b_hats), rays_hat,
            jnp.zeros_like(z_pt), sinv_hat,
            jnp.zeros_like(bm_e), jnp.zeros_like(bm_c),
            jnp.zeros_like(bm_r))


_march_core.defvjp(_march_core_fwd, _march_core_bwd)


def default_tile_rays(S: int) -> int:
    # 512-point tiles measured +7.6% over 1024 at the flagship shape
    # (2048 rays x 512 samples, save-acts): more grid steps overlap the
    # stash DMA with compute better, and the bwd kernel's VMEM stack
    # stays comfortably under the cap (2048-pt tiles OOM it). Override
    # via the `march_tile` config key (models/configs.py) — bench.py
    # additionally honors BENCH_MARCH_TILE; this function reads no env.
    return max(1, 512 // S)


# HBM the 'auto' policy will let the saved-activation stash occupy.
# 13.5 GB admits the f32stash default's 13.0 GB stash at the 2048x512
# bench shape, which runs measurably FASTER than both bf16-stash save
# mode and the recompute backward on the 16 GB v5e
# (reports/r4/ab_prec_f32stash.json). HEADROOM ASSUMPTION: the
# remaining ~2.5 GB must hold params+optimizer (~35 MB), the ray/z
# buffers, and the image tensors the sampler gathers from — fine for
# every shipped dataset config (<=1600x1200x~50 views ~ 1.1 GB), but a
# config that both trains near the bench's extreme ray batch AND holds
# a much larger image stack should lower march_stash_budget_gb (or set
# march_acts='recompute'). Realistic training batches (512 rays x 128
# samples) stash ~1 GB and are nowhere near the budget.
_STASH_BUDGET_GB = 13.5


def march_gemm_flops_per_point(meta, save_acts: bool):
    """(fwd, bwd) MXU FLOPs per point of the fused march kernels.

    Analytic model of the in-kernel GEMM chains (padded widths — what
    the MXU actually executes), used by bench.py to report TFLOP/s and
    %-of-peak next to rays/s. Elementwise/transcendental VPU work and
    the tiny seg/encode dots are excluded.
    """
    L = meta.n_sdf
    sdf = [2 * meta.layers[l][1] * meta.layers[l][2] for l in range(L)]
    col = [2 * meta.layers[L + l][1] * meta.layers[L + l][2]
           for l in range(meta.n_color)]
    rel = [2 * meta.layers[L + meta.n_color + l][1]
           * meta.layers[L + meta.n_color + l][2]
           for l in range(meta.n_relight)]
    # forward: SDF value chain + reverse grad sweep (last layer free)
    # + color + relight heads
    fwd = sum(sdf) + sum(sdf[:-1]) + sum(col) + sum(rel)
    # pullback: dW+dx per head layer, the tangent stream, the last
    # layer's dW + hbar, and the joint reverse loop (2 dW + 2 dx/layer)
    pull = (2 * (sum(col) + sum(rel)) + sum(sdf[:-1])
            + 2 * sdf[-1] + 4 * sum(sdf[:-1]))
    bwd = pull + (0 if save_acts else fwd)
    return fwd, bwd


def march_stash_bytes(meta, n_pts: int) -> int:
    """HBM bytes the save-acts backward stash occupies for n_pts points."""
    DX, DCR, DG = stash_lane_widths(meta)
    store = jnp.dtype(_BWD_STORE[0]).itemsize
    sx_store = jnp.dtype(_sdf_store(meta, True)).itemsize
    return n_pts * (DX * sx_store + DCR * store + DG * 4)


def resolve_save_acts(policy, meta, n_pts: int,
                      budget_gb: float | None = None) -> bool:
    """Map a march_acts policy to a concrete save/recompute choice.

    'save'/'recompute' are explicit; 'auto' (the default) saves when the
    activation stash fits the HBM budget (the march_stash_budget_gb
    config field; env MARCH_STASH_BUDGET_GB overrides, default 13.5) —
    measured +16% step throughput when it fits — and falls back to the
    recompute backward when it would not.
    """
    if policy in (True, "save"):
        return True
    if policy in (False, "recompute", None):
        return False
    if policy != "auto":
        raise ValueError(f"march_acts policy {policy!r} not in "
                         "('auto', 'save', 'recompute')")
    if "MARCH_STASH_BUDGET_GB" in os.environ:
        budget_gb = float(os.environ["MARCH_STASH_BUDGET_GB"])
    elif budget_gb is None:
        budget_gb = _STASH_BUDGET_GB
    return march_stash_bytes(meta, n_pts) <= budget_gb * 1024 ** 3


def fused_ray_march(dense: dict, rcfg: RendererConfig,
                    rays_o: jnp.ndarray, rays_d: jnp.ndarray,
                    z_vals: jnp.ndarray, inv_s,
                    tile_rays: int | None = None, interpret: bool = False,
                    save_acts: bool | str = "auto"):
    """Fused render core for the training-loss path.

    Returns [R, 16]: color(0:3), weight_sum(3), delta_sum(4),
    eik_num(5), eik_den(6) — per-ray partials of exactly what
    compute_loss consumes. Differentiable wrt `dense`, the rays, and
    inv_s; z_vals are treated as constants (no-grad sampling).

    save_acts=True (or 'save') makes the forward kernel export the
    per-point activation stash to HBM and the backward load it instead
    of recomputing — identical math and store dtypes (gradients equal
    up to compiler fma reassociation), ~1x forward GEMMs fewer in the
    backward at ~16 KB/point of HBM round trip. 'auto' (default) saves
    only when the stash fits the HBM budget (resolve_save_acts).
    """
    ws, bs, meta = pack_pipeline_weights(dense, rcfg)
    R, S = z_vals.shape
    save_acts = resolve_save_acts(save_acts, meta, R * S,
                                  budget_gb=rcfg.march_stash_budget_gb)
    Rt = tile_rays or default_tile_rays(S)
    R_pad = (R + Rt - 1) // Rt * Rt
    zero1 = jnp.zeros((R, 1), jnp.float32)
    rays = jnp.concatenate([rays_o, zero1, rays_d, zero1], axis=1)
    if R_pad != R:
        rays = jnp.zeros((R_pad, 8), jnp.float32).at[:R].set(rays)
        z_vals = jnp.zeros((R_pad, S), jnp.float32).at[:R].set(z_vals)
    z_pt = jax.lax.stop_gradient(z_vals.reshape(R_pad * S, 1))
    sinv = jnp.broadcast_to(jnp.asarray(inv_s, jnp.float32).reshape(1, 1),
                            (1, 128))
    bm_e, bm_c, bm_r = pe_bases(rcfg)
    sample_dist = 2.0 / rcfg.n_samples
    out = _march_core(meta, (Rt * S, S), interpret, sample_dist, save_acts,
                      tuple(ws), tuple(bs), rays, z_pt, sinv,
                      jax.lax.stop_gradient(bm_e),
                      jax.lax.stop_gradient(bm_c),
                      jax.lax.stop_gradient(bm_r))
    return out[:R]
