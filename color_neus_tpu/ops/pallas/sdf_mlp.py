"""Fused SDF-MLP forward kernel (no-grad path).

The SDF network is ~0.53 MMAC/point over 9 GEMM layers; on the no-grad
sweeps (hierarchical up-sampling: 5 sweeps/step; dense-grid extraction:
res^3 points) XLA would round-trip every [N, 256] activation through HBM
between layers. This kernel keeps the whole weight set (~2.4 MB padded
f32) plus one tile of activations resident in VMEM, so each point's
activations never leave the chip: one HBM read (the embedded input) and
one write (the sdf) per point, everything else MXU.

Layout: all feature dims padded to multiples of 128 (lane width); the
skip layer concatenates [h, emb]/sqrt(2) in VMEM. Only the sdf channel
of the final layer is materialized (the sweeps don't need features).

Weight-norm is resolved (W = g * v/||v||) at pack time — cheap relative
to the sweep and exact.

Reference semantics: fields.py:81-100 (SDFNetwork.forward / .sdf).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from color_neus_tpu.models.configs import SDFConfig
from color_neus_tpu.ops.embedding import embedding_dim


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def fused_kernel_available() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


# ---------------------------------------------------------------------------
# Weight packing
# ---------------------------------------------------------------------------

def _resolve_linear(p: dict) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Weight-norm -> dense (w [out,in], b [out])."""
    if "v" in p:
        v = p["v"]
        w = v * (p["g"] / jnp.linalg.norm(v, axis=1).clip(1e-12))[:, None]
    else:
        w = p["w"]
    return w, p["b"]


def pack_sdf_weights(params: dict, cfg: SDFConfig):
    """Pad every layer to lane-aligned [in_p, out_p] (transposed for x @ W)
    and keep only the sdf row of the last layer.

    Returns (weights list, biases list, meta dict). Zero-padding keeps the
    math exact: padded input features are zero, padded weight rows/cols
    are zero.
    """
    d0 = embedding_dim(cfg.d_in, cfg.multires) if cfg.multires > 0 else cfg.d_in
    d0p = _round_up(d0, 128)
    n_lin = cfg.n_layers + 1

    ws, bs = [], []
    meta = {"d0": d0, "d0p": d0p, "skip": tuple(cfg.skip_in), "n_lin": n_lin,
            "scale": cfg.scale, "widths": []}
    prev_p = d0p
    prev_real = d0
    for l in range(n_lin):
        w, b = _resolve_linear(params[f"lin{l}"])
        out_real, in_real = w.shape
        if l == n_lin - 1:
            w = w[:1]   # sdf channel only
            b = b[:1]
            out_real = 1
        if l in cfg.skip_in:
            # input is concat([h, emb]) / sqrt(2): pad the two pieces
            # independently so the kernel can concat aligned blocks.
            h_real = in_real - d0
            h_p = _round_up(h_real, 128)
            in_p = h_p + d0p
            wp = jnp.zeros((in_p, _round_up(out_real, 128)), w.dtype)
            wp = wp.at[:h_real, :out_real].set(w[:, :h_real].T)
            wp = wp.at[h_p:h_p + d0, :out_real].set(w[:, h_real:].T)
            meta["widths"].append(("skip", h_real, h_p))
        else:
            in_p = prev_p
            wp = jnp.zeros((in_p, _round_up(out_real, 128)), w.dtype)
            wp = wp.at[:in_real, :out_real].set(w.T)
            meta["widths"].append(("dense", in_real, in_p))
        bp = jnp.zeros((1, _round_up(out_real, 128)), b.dtype).at[0, :out_real].set(b)
        ws.append(wp)
        bs.append(bp)
        prev_real = out_real
        prev_p = _round_up(out_real, 128)
    return ws, bs, meta


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------

def _softplus100(x):
    return jax.nn.softplus(x * 100.0) / 100.0


def _sdf_layers(meta, n_lin, ws, bs, emb, act: str = "softplus",
                prec: str | None = None):
    """The padded weight-norm-resolved SDF MLP on an embedded tile.

    Dot precision follows the weight dtype: bf16 weights run the
    single-pass MXU dot (the fast sweep path); f32 weights request
    Precision.HIGHEST — REQUIRED for actual f32 math, because both
    XLA's and Mosaic's DEFAULT f32 matmul round the operands to bf16
    (measured: an explicit-bf16 sweep and a "f32" default-precision
    sweep were BIT-IDENTICAL over a 1000-step train). The f32 surfaces
    (mesh-extraction grid eval, sweep_dtype='float32') are sin/cos +
    softplus VPU-bound, so the extra MXU passes are nearly free there.

    act='relu' swaps the beta=100 softplus for relu — for SAMPLE
    PLACEMENT sweeps only (hierarchical_z_vals): softplus100 and relu
    differ by <= ln2/100 per activation, sample positions shift by
    O(1e-3) and the render core still evaluates exact softplus at the
    chosen z. The softplus exp/log1p chain is the VPU bottleneck of the
    sweeps (ROADMAP lever #1); relu lifts them toward the MXU roofline.
    Works on plain arrays too (ws[l][:] is the identity outside pallas
    — make_xla_sdf_rays_fn reuses this exact function for the paired
    XLA path).

    prec=None derives the dot precision from the weight dtype (bf16 ->
    single-pass DEFAULT, f32 -> 6-pass HIGHEST). An explicit prec
    ('f32' -> HIGHEST; 'f32x3' -> MANUAL 3-pass bf16 hi/lo splits
    (hi*hi + hi*lo + lo*hi — Precision.HIGH itself is NotImplemented in
    Mosaic), missing only the lo*lo term ~2^-16 relative; 'bf16' ->
    DEFAULT) overrides — the mesh-extraction precision ladder
    (extract_precision)."""
    h = emb
    inv_sqrt2 = 1.0 / math.sqrt(2.0)
    kw = dict(preferred_element_type=jnp.float32,
              # explicit DEFAULT on the bf16 passes: ambient 'highest'
              # scopes must not reach kernel dots (Mosaic rejects
              # contract_precision<fp32> on bf16 operands)
              precision=jax.lax.Precision.DEFAULT)

    def _split(x):
        hi = x.astype(jnp.bfloat16)
        return hi, (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)

    for l in range(n_lin):
        kind, _real, _pad = meta["widths"][l]
        w = ws[l][:]
        if kind == "skip":
            # zero-pad h to the aligned skip width, then append emb
            h = jnp.concatenate([h, emb], axis=1) * inv_sqrt2
        if prec == "f32x3" and w.dtype == jnp.float32:
            x_hi, x_lo = _split(h)
            w_hi, w_lo = _split(w)
            h = (jnp.dot(x_hi, w_hi, **kw) + jnp.dot(x_hi, w_lo, **kw)
                 + jnp.dot(x_lo, w_hi, **kw)) + bs[l][:]
        else:
            if prec is None:
                p = (jax.lax.Precision.HIGHEST if w.dtype == jnp.float32
                     else jax.lax.Precision.DEFAULT)
            elif prec == "bf16" or w.dtype != jnp.float32:
                p = jax.lax.Precision.DEFAULT
            else:
                p = jax.lax.Precision.HIGHEST
            h = (jnp.dot(h.astype(w.dtype), w,
                         preferred_element_type=jnp.float32,
                         precision=p) + bs[l][:])
        if l < n_lin - 1:
            h = jnp.maximum(h, 0.0) if act == "relu" else _softplus100(h)
    return h


def _sdf_mlp_kernel(meta, n_lin, prec, pin_ref, bm_ref, *refs):
    ws = refs[:n_lin]
    bs = refs[n_lin:2 * n_lin]
    out_ref = refs[2 * n_lin]

    # in-kernel positional encoding from the packed [T, 8] input (see
    # point_pipeline.pe_basis): pts live in lanes 0..2, so the K=8
    # phase dot collapses to 3 exact-f32 VPU FMAs — no MXU pass, no
    # bf16 rounding of positional data (at 512^3 a bf16-rounded phase's
    # ~1e-2 SDF error exceeds a voxel)
    pin = pin_ref[:]
    bm = bm_ref[:]
    phase = (pin[:, 0:1] * bm[0:1] + pin[:, 1:2] * bm[1:2]
             + pin[:, 2:3] * bm[2:3])
    emb = (phase * bm[8:9] + jnp.sin(phase) * bm[9:10]
           + jnp.cos(phase) * bm[10:11])
    h = _sdf_layers(meta, n_lin, ws, bs, emb, prec=prec)
    out_ref[:] = h[:, 0:8]                    # [T, 8], col 0 = raw sdf


def _sdf_rays_kernel(meta, n_lin, S, act, exact, rays_ref, z_ref, bm_ref,
                     bmd_ref, *refs):
    """Sweep variant that builds pts = ro + rd*z IN-KERNEL from per-ray
    packed rays [Rt, 8] + point-major z [T, 1] — HBM never sees the
    [N, 3] points or the padded [N, 8] pin (the pad/broadcast glue that
    fed the pts-based sweeps cost ~4.5 ms/step at 1M points)."""
    from color_neus_tpu.ops.pallas.ray_march import _seg_matrix, _seg_bcast

    ws = refs[:n_lin]
    bs = refs[n_lin:2 * n_lin]
    out_ref = refs[2 * n_lin]

    T = z_ref.shape[0]
    Rt = T // S
    seg = _seg_matrix(Rt, T, S)
    raysb = _seg_bcast(seg, rays_ref[0])           # [T, 8]: ro 0:3, rd 4:7
    z = z_ref[:]
    bm = bm_ref[:]
    # phase = (ro + rd*z) @ B without materializing pts in a narrow
    # concat: B applied to the ro lanes + (B shifted to the rd lanes)*z.
    # exact (sweep_dtype='float32'): true-f32 phase too — the default
    # dot would round ray origins/dirs to bf16 (see _sdf_layers)
    prec = (jax.lax.Precision.HIGHEST if exact
            else jax.lax.Precision.DEFAULT)
    phase = (jnp.dot(raysb, bm[0:8], preferred_element_type=jnp.float32,
                     precision=prec)
             + jnp.dot(raysb, bmd_ref[:], preferred_element_type=jnp.float32,
                       precision=prec) * z)
    emb = (phase * bm[8:9] + jnp.sin(phase) * bm[9:10]
           + jnp.cos(phase) * bm[10:11])
    h = _sdf_layers(meta, n_lin, ws, bs, emb, act)
    out_ref[:] = h[:, 0:8]


def make_fused_sdf_fn(params: dict, cfg: SDFConfig, tile: int = 1024,
                      interpret: bool = False, prec: str = "f32"):
    """Returns sdf_fn(pts [N, 3]) -> sdf [N] using the fused kernel.

    Call INSIDE a traced computation: `params` are traced values, packing
    (weight-norm resolve + padding) becomes part of the surrounding jit
    and is CSE'd across the 5 up-sample sweeps of a step. N is padded to
    a tile multiple. Off-TPU callers should pass interpret=True (tests)
    or use the plain-XLA path.

    prec: the dot-precision ladder for this entry's main consumer (mesh
    extraction, where SDF precision sets vertex accuracy):
      'f32'   6-pass HIGHEST — bit-exact vs the f32 XLA oracle (the
              eval_fused gate arm; default)
      'f32x3' 3-pass HIGH — drops only the lo*lo product (~2^-16
              relative; a 512^3 voxel is 5e-3), ~2x the dot rate
      'bf16'  single pass, bf16 weights — preview quality (~1e-2 SDF
              error, can exceed a voxel at 512^3)
    The no-grad placement sweeps go through make_fused_sdf_rays_fn.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from color_neus_tpu.ops.pallas.point_pipeline import pe_basis

    ws, bs, meta = pack_sdf_weights(params, cfg)
    if prec == "bf16" and not interpret:
        ws = [w.astype(jnp.bfloat16) for w in ws]
    n_lin = meta["n_lin"]
    d0p = meta["d0p"]
    bm = pe_basis(cfg.multires, cfg.scale, 0, d0p)

    kernel = partial(_sdf_mlp_kernel, meta, n_lin,
                     None if interpret else prec)

    def sdf_fn(pts: jnp.ndarray) -> jnp.ndarray:
        n = pts.shape[0]
        n_pad = _round_up(max(n, tile), tile)
        pin = jnp.zeros((n_pad, 8), pts.dtype).at[:n, 0:3].set(pts)

        grid = (n_pad // tile,)
        in_specs = [
            pl.BlockSpec((tile, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(bm.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        ]
        for w in ws:
            in_specs.append(pl.BlockSpec(w.shape, lambda i: (0, 0),
                                         memory_space=pltpu.VMEM))
        for b in bs:
            in_specs.append(pl.BlockSpec(b.shape, lambda i: (0, 0),
                                         memory_space=pltpu.VMEM))
        kw = {} if interpret else {
            # unrolled 9-layer chain: allow more than the 16 MB default
            # scoped-vmem stack (v5e has 128 MB)
            "compiler_params": pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024)}
        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((tile, 8), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_pad, 8), jnp.float32),
            interpret=interpret,
            **kw,
        )(pin, bm, *ws, *bs)
        return out[:n, 0] / meta["scale"]

    return sdf_fn


def fused_sdf_fn(params: dict, cfg: SDFConfig, pts: jnp.ndarray,
                 interpret: bool = False) -> jnp.ndarray:
    """One-shot convenience wrapper."""
    return make_fused_sdf_fn(params, cfg, interpret=interpret)(pts)


def make_fused_sdf_rays_fn(params: dict, cfg: SDFConfig, tile_pts: int = 1024,
                           interpret: bool = False,
                           dtype: str = "bfloat16",
                           act: str = "softplus"):
    """Returns sdf_fn(rays_o [R,3], rays_d [R,3], z [R,S]) -> sdf [R,S].

    Same math as make_fused_sdf_fn but pts are computed in-kernel from
    the packed rays + z, so the caller never materializes [R*S, 3]
    points (hierarchical_z_vals' sweep inputs). The [R, 8] rays packing
    below is identical to fused_ray_march's and CSE's with it.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from color_neus_tpu.ops.pallas.point_pipeline import pe_basis

    ws, bs, meta = pack_sdf_weights(params, cfg)
    if not interpret and dtype == "bfloat16":
        # bf16 dots (default): these sweeps only PLACE no-grad importance
        # samples (hierarchical_z_vals), where sample-position precision
        # is not a parity target — same policy as the fused hierarchy
        # kernel. Measured: the f32 chain ran at ~85 TF/s (the f32 MXU
        # ceiling); bf16 lifts the coarse sweep toward the 175 TF/s
        # softplus-chain roofline. Mesh extraction keeps f32
        # (make_fused_sdf_fn). RendererConfig.sweep_dtype='float32'
        # opts the sweeps back into f32 (ADVICE r3: configurable
        # precision/quality tradeoff short of fused_sdf='off').
        ws = tuple(w.astype(jnp.bfloat16) for w in ws)
    n_lin = meta["n_lin"]
    d0p = meta["d0p"]
    bm = pe_basis(cfg.multires, cfg.scale, 0, d0p)
    # the phase basis shifted onto the rd lanes (4:7)
    bmd = jnp.zeros((8, d0p), jnp.float32).at[4:7].set(bm[0:3])

    def sdf_fn(rays_o, rays_d, z):
        R, S = z.shape
        Rt = max(1, tile_pts // S)
        T = Rt * S
        R_pad = (R + Rt - 1) // Rt * Rt
        zero1 = jnp.zeros((R, 1), jnp.float32)
        rays = jnp.concatenate([rays_o, zero1, rays_d, zero1], axis=1)
        if R_pad != R:
            rays = jnp.zeros((R_pad, 8), jnp.float32).at[:R].set(rays)
            z = jnp.zeros((R_pad, S), jnp.float32).at[:R].set(z)
        G = R_pad // Rt
        rays3 = rays.reshape(G, Rt, 8)
        z_pt = z.reshape(R_pad * S, 1)

        kernel = partial(_sdf_rays_kernel, meta, n_lin, S, act,
                         dtype != "bfloat16")
        in_specs = [
            pl.BlockSpec((1, Rt, 8), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(bm.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(bmd.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        ]
        for w in ws:
            in_specs.append(pl.BlockSpec(w.shape, lambda i: (0, 0),
                                         memory_space=pltpu.VMEM))
        for b in bs:
            in_specs.append(pl.BlockSpec(b.shape, lambda i: (0, 0),
                                         memory_space=pltpu.VMEM))
        kw = {} if interpret else {
            "compiler_params": pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024)}
        out = pl.pallas_call(
            kernel,
            grid=(G,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((T, 8), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((R_pad * S, 8), jnp.float32),
            interpret=interpret,
            **kw,
        )(rays3, z_pt, bm, bmd, *ws, *bs)
        return out[:, 0].reshape(R_pad, S)[:R] / meta["scale"]

    return sdf_fn


def make_xla_sdf_rays_fn(params: dict, cfg: SDFConfig,
                         act: str = "softplus"):
    """Plain-XLA twin of make_fused_sdf_rays_fn: same padded weights,
    same in-kernel math (_sdf_layers works on plain arrays), same
    (rays_o, rays_d, z) -> sdf [R, S] contract. The paired XLA path for
    the sweep-activation flag — fused-vs-XLA hierarchy parity tests
    compare against THIS when act != 'softplus' (and CPU runs with
    act='relu' use it so placement matches the TPU kernels)."""
    from color_neus_tpu.ops.pallas.point_pipeline import pe_basis

    ws, bs, meta = pack_sdf_weights(params, cfg)
    n_lin = meta["n_lin"]
    bm = pe_basis(cfg.multires, cfg.scale, 0, meta["d0p"])

    def sdf_fn(rays_o, rays_d, z):
        R, S = z.shape
        pts = (rays_o[:, None, :]
               + rays_d[:, None, :] * z[..., None]).reshape(-1, 3)
        phase = jnp.dot(pts, bm[0:3], preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
        emb = (phase * bm[8:9] + jnp.sin(phase) * bm[9:10]
               + jnp.cos(phase) * bm[10:11])
        h = _sdf_layers(meta, n_lin, ws, bs, emb, act)
        return h[:, 0].reshape(R, S) / meta["scale"]

    return sdf_fn


def resolve_sdf_fn(params: dict, cfg: SDFConfig, mode: str = "auto"):
    """Pick the sweep-time SDF evaluator.

    mode: 'auto' (fused on TPU, plain XLA otherwise), 'on', 'off',
    'interpret' (fused kernel under the Pallas interpreter — oracle for
    tests). Returns sdf_fn(pts [N,3]) -> [N] or None (= plain XLA).
    """
    if mode == "off":
        return None
    # the fused kernel is forward-only (no VJP rule): it must never see
    # gradient-carrying params — callers use it on no-grad paths only
    params = jax.lax.stop_gradient(params)
    if mode == "interpret":
        return make_fused_sdf_fn(params, cfg, interpret=True)
    if mode == "on" or (mode == "auto" and fused_kernel_available()):
        return make_fused_sdf_fn(params, cfg)
    return None


def resolve_sdf_sweep_fn(params: dict, cfg: SDFConfig, mode: str = "auto",
                         dtype: str = "bfloat16", act: str = "softplus"):
    """Rays+z sweep evaluator (see make_fused_sdf_rays_fn); same mode
    contract as resolve_sdf_fn. None = caller falls back to pts-based.
    `dtype` is RendererConfig.sweep_dtype (the sweep-dot precision);
    `act` is RendererConfig.sweep_activation — with act='relu' the
    CPU/auto fallback returns the XLA twin instead of None so sample
    placement is identical on and off the chip."""
    if mode == "off":
        return None
    params = jax.lax.stop_gradient(params)
    if mode == "interpret":
        return make_fused_sdf_rays_fn(params, cfg, interpret=True, act=act)
    if mode == "on" or (mode == "auto" and fused_kernel_available()):
        return make_fused_sdf_rays_fn(params, cfg, dtype=dtype, act=act)
    if act != "softplus":
        return make_xla_sdf_rays_fn(params, cfg, act=act)
    return None
