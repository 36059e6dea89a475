"""Fused per-point pipeline: SDF + input-gradient + color (+ relight).

This is the hot path of every training step: for each of R*S sample
points, evaluate the SDF MLP, its spatial gradient, the color MLP, and
(Color-NeuS) the relight MLP. In XLA each of the ~30 constituent GEMMs
round-trips a [N, 256] activation through HBM (profiled at ~2.9 ms per
GEMM vs a 0.35 ms compute roofline — bandwidth-bound). The fused Pallas
kernel keeps all weights and one point-tile's activations VMEM-resident:
per point, HBM sees only the embedded inputs once and ~13 output floats.

The SDF input-gradient is computed REVERSE-mode INSIDE the kernel: the
value sweep stores the beta=100 softplus gates, then one backward sweep
pulls the raw-sdf cotangent e0 down to the input embedding (the last
layer's pullback is just weight column 0 — free). The positional
encodings are also computed in-kernel from a packed [T, 8] input via
constant phase bases (pe_basis), so per point HBM sees 8 floats in and
16 out. The backward kernel handles the second-order grad-cotangent
path with a single tangent stream along the grad cotangent direction
(reverse-over-forward Hessian-vector product).

Structure:
  resolve_dense(params, rcfg)     weight-norm -> plain dense pytree (XLA,
                                  differentiable — the custom_vjp boundary
                                  sits at dense weights)
  point_pipeline_ref(...)         pure-XLA oracle, used for tests and as
                                  the off-TPU fallback
  fused kernel + custom_vjp       (see point_pipeline_fwd / _bwd)

Reference semantics: fields.py SDFNetwork/RenderingNetwork/RelightNetwork
composition as used by the render cores (NeuS.py:227-232,
Color_NeuS.py:52-63).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from color_neus_tpu.models.configs import RendererConfig
from color_neus_tpu.ops.embedding import positional_encoding, embedding_dim
from color_neus_tpu.ops.transforms import inverse_sigmoid


def _dense(p: dict):
    if "v" in p:
        v = p["v"]
        w = v * (p["g"] / jnp.linalg.norm(v, axis=1).clip(1e-12))[:, None]
    else:
        w = p["w"]
    return w, p["b"]


def resolve_dense(params: dict, rcfg: RendererConfig) -> dict:
    """Weight-norm -> dense weights for sdf/color/relight, as flat lists.
    Differentiable; the fused kernel's custom_vjp returns cotangents here
    and outer autodiff pulls them back through the reparam."""
    out = {"sdf_w": [], "sdf_b": [], "color_w": [], "color_b": []}
    for l in range(rcfg.sdf.n_layers + 1):
        w, b = _dense(params["sdf"][f"lin{l}"])
        out["sdf_w"].append(w)
        out["sdf_b"].append(b)
    for l in range(rcfg.color.n_layers + 1):
        w, b = _dense(params["color"][f"lin{l}"])
        out["color_w"].append(w)
        out["color_b"].append(b)
    if rcfg.kind == "color_neus":
        rl = params["relight"]
        out["relight_w"] = [rl["in_layer"]["w"]] + \
            [rl[f"mlp{i}"]["w"] for i in range(rcfg.relight.n_layers)]
        out["relight_b"] = [rl["in_layer"]["b"]] + \
            [rl[f"mlp{i}"]["b"] for i in range(rcfg.relight.n_layers)]
    return out


# ---------------------------------------------------------------------------
# Pure-XLA oracle
# ---------------------------------------------------------------------------

def _softplus100(x):
    return jax.nn.softplus(x * 100.0) / 100.0


def _sdf_apply_dense(dense, rcfg, x):
    cfg = rcfg.sdf
    inputs = x * cfg.scale
    if cfg.multires > 0:
        inputs = positional_encoding(inputs, cfg.multires)
    h = inputs
    n_lin = cfg.n_layers + 1
    inv_sqrt2 = 1.0 / math.sqrt(2.0)
    for l in range(n_lin):
        if l in cfg.skip_in:
            h = jnp.concatenate([h, inputs], axis=-1) * inv_sqrt2
        h = h @ dense["sdf_w"][l].T + dense["sdf_b"][l]
        if l < n_lin - 1:
            h = _softplus100(h)
    return jnp.concatenate([h[:, :1] / cfg.scale, h[:, 1:]], axis=-1)


def _color_apply_dense(dense, rcfg, pts, normals, dirs, feat):
    cfg = rcfg.color
    if cfg.multires_view > 0:
        dirs = positional_encoding(dirs, cfg.multires_view)
    if cfg.mode == "idr":
        h = jnp.concatenate([pts, dirs, normals, feat], axis=-1)
    elif cfg.mode == "no_view_dir":
        h = jnp.concatenate([pts, normals, feat], axis=-1)
    else:
        h = jnp.concatenate([pts, dirs, feat], axis=-1)
    n_lin = cfg.n_layers + 1
    for l in range(n_lin):
        h = h @ dense["color_w"][l].T + dense["color_b"][l]
        if l < n_lin - 1:
            h = jax.nn.relu(h)
    return jax.nn.sigmoid(h) if cfg.squeeze_out else h


def _relight_apply_dense(dense, rcfg, rgb, pts, dirs, grads):
    cfg = rcfg.relight
    if cfg.multires_view > 0:
        dirs = positional_encoding(dirs, cfg.multires_view)
    feats = [pts, dirs] + ([grads] if cfg.include_grad else [])
    h = jnp.concatenate(feats, axis=-1) @ dense["relight_w"][0].T + dense["relight_b"][0]
    for i in range(cfg.n_layers):
        h = jax.nn.relu(h)
        if i == cfg.y_in_layer - 1:
            h = jnp.concatenate([rgb, h], axis=-1) @ dense["relight_w"][i + 1].T \
                + dense["relight_b"][i + 1]
        else:
            h = h @ dense["relight_w"][i + 1].T + dense["relight_b"][i + 1]
    drgb = h
    if cfg.inv_sigmoid:
        out = jax.nn.sigmoid(inverse_sigmoid(rgb) + drgb)
    else:
        out = jnp.clip(rgb + jax.nn.sigmoid(drgb) - 0.5, 0.0, 1.0)
    return out, drgb


def point_pipeline_ref(dense: dict, rcfg: RendererConfig,
                       pts: jnp.ndarray, dirs: jnp.ndarray):
    """Oracle: (sdf [N,1], grad [N,3], gc [N,3], relit [N,3], delta [N,3]).

    For kind=='neus', gc == relit == the (view-dependent) color and
    delta == 0.
    """
    out, pullback = jax.vjp(lambda p: _sdf_apply_dense(dense, rcfg, p), pts)
    cot = jnp.zeros_like(out).at[:, 0].set(1.0)
    grad = pullback(cot)[0]
    sdf = out[:, :1]
    feat = out[:, 1:]

    color = _color_apply_dense(dense, rcfg, pts, grad, dirs, feat)
    if rcfg.kind == "color_neus":
        relit, delta = _relight_apply_dense(dense, rcfg, color, pts, dirs, grad)
        return sdf, grad, color, relit, delta
    return sdf, grad, color, color, jnp.zeros_like(color)


# ---------------------------------------------------------------------------
# Weight packing for the fused kernel
# ---------------------------------------------------------------------------
#
# Lane-aligned canonical layouts (all blocks multiples of 128):
#   sdf input:      emb [T, d0p]; skip layers consume [X | E4]
#   color input:    [small(128) | dirs(128) | feat(256)] -> 512 rows
#                     small rows: 0:3 pts, 3:6 grad
#                     dirs rows: 128:128+dv (zero for no_view_dir)
#   relight input:  [small(128) | dirs(128)] -> 256 rows
#   relight y-in:   [gc(128) | h(256)] -> 384 rows (gc in rows 0:3)
# All weights stored transposed [in_p, out_p] for x @ W.

def _rup(x, m=128):
    return (x + m - 1) // m * m


from dataclasses import dataclass as _dataclass


@_dataclass(frozen=True)
class PMeta:
    """Hashable kernel metadata (static for jit/custom_vjp)."""
    d0: int
    d0p: int
    scale: float
    dv: int
    rl_dv: int
    layers: tuple
    kind: str
    color_mode: str
    squeeze_out: bool
    inv_sigmoid: bool
    include_grad: bool
    n_sdf: int
    n_color: int
    n_relight: int
    y_in: int
    feat_dim: int
    # SDF-chain precision: 'bf16' | 'f32stash' | 'f32'
    # (RendererConfig.march_bwd_precision; see _sdf_bf/_sdf_store)
    sdf_prec: str = "bf16"
    # Thin-dot strategy: 'vpu' computes the K<=8 / 8-lane-out PE dots
    # as exact-f32 VPU FMAs / lane reductions and the f32 layer-0 dW
    # dots as 2-pass bf16 hi+lo splits; 'mxu' keeps the round-4
    # Precision.HIGHEST 6-pass MXU dots (the A/B reference arm).
    thin: str = "vpu"

    @property
    def has_dirs_c(self) -> bool:
        """Whether the color chain consumes view dirs. In 'no_view_dir'
        mode (the Color-NeuS flagship — reference fields.py:119-188
        mode table, Color_NeuS.py:14 requires it) the 128-lane dirs
        block of the color input would be all-zero weights: the packed
        layout drops it entirely (color_first in_p 512 -> 384, no
        dirs_c encoder), cutting ~25% of that GEMM's FLOPs in fwd and
        its dW/dx in the pullback."""
        return self.color_mode in ("idr", "no_normal")

    def __getitem__(self, k):  # dict-style access used by the kernels
        return getattr(self, k)


def _sdf_bf(meta, bf16: bool) -> bool:
    """Dot dtype for the SDF chain: bf16 unless sdf_prec == 'f32'."""
    return bf16 and meta["sdf_prec"] != "f32"


def _sdf_store(meta, bf16: bool):
    """Store dtype for SDF-chain activations (Xs/Us/Zs + the SX stash):
    f32 for 'f32stash'/'f32' (exact reconstructed softplus gates)."""
    if not bf16 or meta["sdf_prec"] != "bf16":
        return jnp.float32
    return _BWD_STORE[0]


def cast_kernel_weights(meta, ws, interpret: bool):
    """Weights as kernel inputs: bf16 (halves the resident VMEM
    footprint; the dots cast to bf16 anyway) — except the SDF layers,
    which stay f32 when sdf_prec == 'f32' so the f32 SDF dots see
    unrounded weights."""
    if interpret:
        return tuple(ws)
    keep = meta["n_sdf"] if meta["sdf_prec"] == "f32" else 0
    return tuple(w if i < keep else w.astype(jnp.bfloat16)
                 for i, w in enumerate(ws))


def pack_pipeline_weights(dense: dict, rcfg: RendererConfig):
    sdf = rcfg.sdf
    color = rcfg.color
    d0 = embedding_dim(3, sdf.multires) if sdf.multires > 0 else 3
    d0p = _rup(d0)
    dv = embedding_dim(3, color.multires_view) - 0 if color.multires_view > 0 else 3
    rl_dv = (embedding_dim(3, rcfg.relight.multires_view)
             if rcfg.relight.multires_view > 0 else 3)

    ws, bs = [], []
    meta = {"d0": d0, "d0p": d0p, "scale": sdf.scale, "dv": dv, "rl_dv": rl_dv,
            "layers": [], "kind": rcfg.kind, "color_mode": color.mode,
            "squeeze_out": color.squeeze_out,
            "inv_sigmoid": rcfg.relight.inv_sigmoid,
            "include_grad": rcfg.relight.include_grad,
            "n_sdf": sdf.n_layers + 1, "n_color": color.n_layers + 1,
            "n_relight": (rcfg.relight.n_layers + 1) if rcfg.kind == "color_neus" else 0,
            "y_in": rcfg.relight.y_in_layer,
            "feat_dim": sdf.d_out - 1,
            "sdf_prec": rcfg.march_bwd_precision,
            "thin": rcfg.thin_dots}

    # ---- sdf ----
    prev_p = d0p
    for l in range(sdf.n_layers + 1):
        w = dense["sdf_w"][l]
        b = dense["sdf_b"][l]
        out_real, in_real = w.shape
        out_p = _rup(out_real)
        if l in sdf.skip_in:
            h_real = in_real - d0
            h_p = _rup(h_real)
            in_p = h_p + d0p
            wp = jnp.zeros((in_p, out_p), w.dtype)
            wp = wp.at[:h_real, :out_real].set(w[:, :h_real].T)
            wp = wp.at[h_p:h_p + d0, :out_real].set(w[:, h_real:].T)
            meta["layers"].append(("sdf_skip", in_p, out_p, out_real))
        else:
            in_p = prev_p
            wp = jnp.zeros((in_p, out_p), w.dtype)
            wp = wp.at[:in_real, :out_real].set(w.T)
            meta["layers"].append(("sdf", in_p, out_p, out_real))
        bp = jnp.zeros((1, out_p), b.dtype).at[0, :out_real].set(b)
        ws.append(wp)
        bs.append(bp)
        prev_p = out_p

    # ---- color ----
    feat = meta["feat_dim"]
    featp = _rup(feat)
    # 'no_view_dir' drops the (all-zero-weight) dirs block entirely —
    # see PMeta.has_dirs_c
    dblk = 128 if color.mode in ("idr", "no_normal") else 0
    cin = 128 + dblk + featp
    for l in range(color.n_layers + 1):
        w = dense["color_w"][l]
        b = dense["color_b"][l]
        out_real, in_real = w.shape
        out_p = _rup(out_real)
        if l == 0:
            wp = jnp.zeros((cin, out_p), w.dtype)
            c = 0
            wp = wp.at[0:3, :out_real].set(w[:, c:c + 3].T)   # pts
            c += 3
            if color.mode in ("idr", "no_normal"):
                wp = wp.at[128:128 + dv, :out_real].set(w[:, c:c + dv].T)
                c += dv
            if color.mode in ("idr", "no_view_dir"):
                wp = wp.at[3:6, :out_real].set(w[:, c:c + 3].T)  # normals/grad
                c += 3
            wp = wp.at[128 + dblk:128 + dblk + feat, :out_real].set(w[:, c:].T)
            meta["layers"].append(("color_first", cin, out_p, out_real))
        else:
            in_p = _rup(in_real)
            wp = jnp.zeros((in_p, out_p), w.dtype)
            wp = wp.at[:in_real, :out_real].set(w.T)
            meta["layers"].append(("color", in_p, out_p, out_real))
        bp = jnp.zeros((1, out_p), b.dtype).at[0, :out_real].set(b)
        ws.append(wp)
        bs.append(bp)

    # ---- relight ----
    if rcfg.kind == "color_neus":
        rl = rcfg.relight
        for l in range(rl.n_layers + 1):
            w = dense["relight_w"][l]
            b = dense["relight_b"][l]
            out_real, in_real = w.shape
            out_p = _rup(out_real)
            if l == 0:
                wp = jnp.zeros((256, out_p), w.dtype)
                wp = wp.at[0:3, :out_real].set(w[:, 0:3].T)       # pts
                c = 3
                wp = wp.at[128:128 + rl_dv, :out_real].set(w[:, c:c + rl_dv].T)
                c += rl_dv
                if rl.include_grad:
                    wp = wp.at[3:6, :out_real].set(w[:, c:c + 3].T)
                meta["layers"].append(("relight_first", 256, out_p, out_real))
            elif l == rl.y_in_layer:
                h_real = in_real - 3
                h_p = _rup(h_real)
                wp = jnp.zeros((128 + h_p, out_p), w.dtype)
                wp = wp.at[0:3, :out_real].set(w[:, 0:3].T)       # gc
                wp = wp.at[128:128 + h_real, :out_real].set(w[:, 3:].T)
                meta["layers"].append(("relight_yin", 128 + h_p, out_p, out_real))
            else:
                in_p = _rup(in_real)
                wp = jnp.zeros((in_p, out_p), w.dtype)
                wp = wp.at[:in_real, :out_real].set(w.T)
                meta["layers"].append(("relight", in_p, out_p, out_real))
            bp = jnp.zeros((1, out_p), b.dtype).at[0, :out_real].set(b)
            ws.append(wp)
            bs.append(bp)

    meta["layers"] = tuple(meta["layers"])
    return ws, bs, PMeta(**meta)


def pack_point_inputs(pts: jnp.ndarray, dirs: jnp.ndarray) -> jnp.ndarray:
    """The kernels' ONLY per-point input: [n, 8] = [x,y,z,0, dx,dy,dz,0].

    Positional encodings (for the SDF net and both view-dir encoders) are
    computed INSIDE the kernels from these 6 lanes via the pe_basis
    constants — one tiny [T,8]@[8,d0p] MXU dot plus sin/cos on the VPU.
    This replaces three [n, 128] HBM arrays (embedded pts + two embedded
    dir blocks) per kernel call with one [n, 8] array, and deletes the
    XLA-side PE-sine fusions entirely."""
    n = pts.shape[0]
    z1 = jnp.zeros((n, 1), pts.dtype)
    return jnp.concatenate([pts, z1, dirs, z1], axis=1)


def pe_basis(multires: int, scale: float, coord_lane: int, dp: int) -> jnp.ndarray:
    """[16, dp] constant: rows 0..7 = phase matrix B (phase = pin @ B),
    rows 8/9/10 = raw/sin/cos column masks, so

        emb = phase*raw + sin(phase)*sin_m + cos(phase)*cos_m

    reproduces positional_encoding(coord * scale, multires) exactly
    (frequency-major, sin-before-cos — ops/embedding.py layout), with
    zeros in the padding columns. The jacobian d emb/d phase is
    raw + cos(phase)*sin_m - sin(phase)*cos_m, reused by the backward
    kernel's pullback to the packed input lanes."""
    bm = np.zeros((16, dp), np.float32)
    for j in range(3):
        bm[coord_lane + j, j] = scale
        bm[8, j] = 1.0
    for k in range(multires):
        f = scale * 2.0 ** k
        for j in range(3):
            bm[coord_lane + j, 3 + 6 * k + j] = f
            bm[coord_lane + j, 6 + 6 * k + j] = f
            bm[9, 3 + 6 * k + j] = 1.0
            bm[10, 6 + 6 * k + j] = 1.0
    return jnp.asarray(bm)


def pe_bases(rcfg: RendererConfig):
    """(BM_emb, BM_dirs_color, BM_dirs_relight) for the fused kernels.
    pts occupy input lanes 0..2, dirs lanes 4..6 (pack_point_inputs)."""
    sdf = rcfg.sdf
    d0p = _rup(embedding_dim(3, sdf.multires) if sdf.multires > 0 else 3)
    bm_e = pe_basis(sdf.multires, sdf.scale, 0, d0p)
    bm_c = pe_basis(rcfg.color.multires_view, 1.0, 4, 128)
    bm_r = (pe_basis(rcfg.relight.multires_view, 1.0, 4, 128)
            if rcfg.kind == "color_neus" else bm_c)
    return bm_e, bm_c, bm_r


def _hilo(x):
    """f32 -> (hi, lo) bf16 pair with x == hi + lo to ~16 mantissa bits."""
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _encode(pin, bm, mode="highest", lanes=None):
    """In-kernel PE: pin [T, 8], bm [16, dp] -> (emb [T, dp], phase).

    Positional data must NOT round to bf16 (the top PE band phase error
    would reach ~0.77 rad — ARCHITECTURE.md "Precision policy"). Three
    formulations:
      'highest' 6-pass Precision.HIGHEST MXU dot (exact f32)
      'hilo'    2 single-pass DEFAULT dots: pin split into bf16 hi+lo;
                EVERY pe_basis entry is 3*2^k, 1*2^k or 0 — exactly
                bf16-representable — so only the data operand needs the
                split. Phase error ~2^-17 relative (vs bf16's 2^-8),
                below the bf16 weight-dot noise of every consumer.
      'vpu'     the 3 nonzero basis rows (statically known from
                pe_basis's coord_lane, `lanes`) as exact-f32 VPU
                broadcast FMAs — zero MXU passes (measured SLOWER than
                'hilo' on v5e: sublane-broadcast cost; kept as the A/B
                arm).
    """
    if mode == "highest":
        phase = jnp.dot(pin, bm[0:8], preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
    elif mode == "hilo":
        hi, lo = _hilo(pin)
        bmb = bm[0:8].astype(jnp.bfloat16)
        kw = dict(preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.DEFAULT)
        phase = jnp.dot(hi, bmb, **kw) + jnp.dot(lo, bmb, **kw)
    else:
        l0, l1, l2 = lanes
        phase = (pin[:, l0:l0 + 1] * bm[l0:l0 + 1]
                 + pin[:, l1:l1 + 1] * bm[l1:l1 + 1]
                 + pin[:, l2:l2 + 1] * bm[l2:l2 + 1])
    emb = (phase * bm[8:9] + jnp.sin(phase) * bm[9:10]
           + jnp.cos(phase) * bm[10:11])
    return emb, phase


def _bm_pullback(g, bm, mode="highest", lanes=None):
    """[T, dp] cotangent g -> packed-lane cotangent [T, 8]: g @ bm[0:8]^T.

    Modes as _encode: 'hilo' splits g (bm rows are bf16-exact), 'vpu'
    reduces the 3 nonzero rows on lanes."""
    dims = (((1,), (1,)), ((), ()))
    if mode == "highest":
        return jax.lax.dot_general(g, bm[0:8], dims,
                                   preferred_element_type=jnp.float32,
                                   precision=jax.lax.Precision.HIGHEST)
    if mode == "hilo":
        hi, lo = _hilo(g)
        bmb = bm[0:8].astype(jnp.bfloat16)
        kw = dict(preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.DEFAULT)
        return (jax.lax.dot_general(hi, bmb, dims, **kw)
                + jax.lax.dot_general(lo, bmb, dims, **kw))
    cols = {j: jnp.sum(g * bm[j:j + 1], axis=1, keepdims=True)
            for j in lanes}
    z = jnp.zeros((g.shape[0], 1), jnp.float32)
    return jnp.concatenate([cols.get(j, z) for j in range(8)], axis=1)


def _encode_vjp(phase, bm, emb_hat, mode="highest", lanes=None):
    """Pullback of _encode to the packed input lanes: [T, 8]."""
    J = bm[8:9] + jnp.cos(phase) * bm[9:10] - jnp.sin(phase) * bm[10:11]
    return _bm_pullback(emb_hat * J, bm, mode, lanes)


def _enc_mode(meta, bf16=True):
    """(mode, emb_lanes, dirs_lanes) for _encode/_encode_vjp under the
    meta's thin-dot strategy (pack_point_inputs: pts lanes 0..2,
    dirs 4..6).

    Interpret/oracle runs (bf16=False) and the full-f32 SDF-chain mode
    always use exact-f32 'highest': 'hilo' trades 2^-17 phase error for
    speed, a production-bf16-path-only deal."""
    t = meta["thin"]
    if not bf16 or meta["sdf_prec"] == "f32":
        return "highest", None, None
    if t in ("vpu", "enc"):
        return "vpu", (0, 1, 2), (4, 5, 6)
    if t == "hilo":
        return "hilo", None, None
    return "highest", None, None


def _lin0_split(meta):
    """Whether the f32 layer-0 dW dots use the 2-pass hi/lo split."""
    return meta["thin"] in ("vpu", "split", "hilo")


# ---------------------------------------------------------------------------
# Fused forward kernel
# ---------------------------------------------------------------------------

def _kdot(a, b, bf16):
    """MXU dot: bf16 inputs (single-pass) with f32 accumulation when
    bf16 is set — matches XLA's default f32-matmul precision on TPU.
    The f32 mode pins Precision.HIGHEST: without it Mosaic's DEFAULT
    f32 dot rounds the operands to bf16 anyway (single MXU pass), which
    would make the "f32" parity/audit modes silently identical to bf16
    (measured bit-identical on chip — see sdf_mlp._sdf_layers)."""
    if bf16:
        # explicit DEFAULT: an ambient default_matmul_precision('highest')
        # scope (grad_audit's oracle) would otherwise attach
        # contract_precision<fp32> to bf16 operands, which Mosaic
        # rejects ("Bad lhs type" — the queue-2/3 gate crash)
        return jnp.dot(a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.DEFAULT)
    return jnp.dot(a, b, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)


def _kdot_b(a, b, bf16):
    """a.T @ b (contract on batch dims); precision policy as _kdot."""
    if bf16:
        a = a.astype(jnp.bfloat16)
        b = b.astype(jnp.bfloat16)
    return jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=(jax.lax.Precision.DEFAULT if bf16
                                          else jax.lax.Precision.HIGHEST))


def _kdot_b_split(a, b):
    """a.T @ b with the f32 operand a split into bf16 hi+lo (2 MXU
    passes instead of HIGHEST's 6): keeps ~16 mantissa bits of a (the
    PE embedding / tangent seed, whose bf16 rounding dominated the lin0
    gradient error — grad audit r3) while the cotangent b rounds to
    bf16 exactly like every other layer's dW dot (<0.4% there)."""
    a_hi = a.astype(jnp.bfloat16)
    a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    bb = b.astype(jnp.bfloat16)
    dims = (((0,), (0,)), ((), ()))
    kw = dict(preferred_element_type=jnp.float32,
              precision=jax.lax.Precision.DEFAULT)
    return (jax.lax.dot_general(a_hi, bb, dims, **kw)
            + jax.lax.dot_general(a_lo, bb, dims, **kw))


def _mlp_forward(meta, T, bf16, w_refs, wt_refs, b_refs,
                 bm_e_ref, bm_c_ref, bm_r_ref, pin):
    """Shared in-kernel MLP pipeline forward on a [T, 8] packed input:
    returns (sdf, grad, gc, relit, delta) as [T, 1/3/3/3/3] values.
    Used by the per-point forward kernel and the fused ray-march kernel
    (ops/pallas/ray_march.py)."""
    inv_sqrt2 = 1.0 / math.sqrt(2.0)
    inv_scale = 1.0 / meta["scale"]
    sbf = _sdf_bf(meta, bf16)
    em, el, dl = _enc_mode(meta, bf16)

    emb, phase_e = _encode(pin, bm_e_ref[:], em, el)   # [T, d0p]
    if meta["has_dirs_c"]:
        dirs_c, _ = _encode(pin, bm_c_ref[:], em, dl)  # [T, 128]
    if meta["n_relight"] > 0:
        dirs_r, _ = _encode(pin, bm_r_ref[:], em, dl)  # [T, 128]

    # ---- SDF chain: value forward storing the softplus gates, then ONE
    # reverse sweep for the input-gradient. Reverse-mode costs one GEMM
    # per layer (and the last layer is free: its cotangent is e0, so the
    # pullback is just a weight column) versus THREE forward tangent
    # streams — ~2.4x fewer SDF-gradient FLOPs than the JVP formulation.
    h = emb
    gates = []     # sigma'(s_l), f32 (beta=100 gates are bf16-intolerant)
    li = 0
    for l in range(meta["n_sdf"]):
        kind, in_p, out_p, out_real = meta["layers"][li]
        if kind == "sdf_skip":
            h = jnp.concatenate([h, emb], axis=1) * inv_sqrt2
        w = w_refs[li][:]
        a = _kdot(h, w, sbf) + b_refs[li][:]
        if l < meta["n_sdf"] - 1:
            h, g = _softplus100_and_gate(a)
            gates.append(g)
        else:
            y = a                                      # [T, out_p] sdf+feat
        li += 1

    # reverse sweep: p = d f0_raw / d (layer-l input). The last layer's
    # cotangent is e0, so its pullback is just weight column 0 = row 0
    # of the transposed weight (no GEMM).
    emb_g = jnp.zeros((T, meta["d0p"]), jnp.float32)
    p = None
    for l in range(meta["n_sdf"] - 1, -1, -1):
        kind, in_p, out_p, out_real = meta["layers"][l]
        if l == meta["n_sdf"] - 1:
            p = jnp.broadcast_to(wt_refs[l][:][0:1, :], (T, in_p))
        else:
            q = p * gates[l]
            p = _kdot(q, wt_refs[l][:], sbf)           # [T, in_p]
        if kind == "sdf_skip":
            emb_g = emb_g + p[:, in_p - meta["d0p"]:] * inv_sqrt2
            p = p[:, :in_p - meta["d0p"]] * inv_sqrt2
    emb_g = emb_g + p
    # chain through the PE: d f0_raw / d pts (scale lives inside bm_e)
    grad = _encode_vjp(phase_e, bm_e_ref[:], emb_g, em, el)[:, 0:3] * inv_scale

    sdf = y[:, 0:1] * inv_scale                        # [T, 1]
    feat = y[:, 1:1 + meta["feat_dim"]]                # [T, feat]

    pts = pin[:, 0:3]                                  # [T, 3]

    # small block: [pts | grad | 0...] -> [T, 128]
    small = jnp.concatenate(
        [pts, grad, jnp.zeros((T, 122), jnp.float32)], axis=1)

    featp = _rup(meta["feat_dim"])
    feat_block = feat if meta["feat_dim"] == featp else jnp.concatenate(
        [feat, jnp.zeros((T, featp - meta["feat_dim"]), jnp.float32)], axis=1)

    # ---- color chain ----
    h = (jnp.concatenate([small, dirs_c, feat_block], axis=1)
         if meta["has_dirs_c"]
         else jnp.concatenate([small, feat_block], axis=1))
    for l in range(meta["n_color"]):
        kind, in_p, out_p, out_real = meta["layers"][li]
        h = _kdot(h, w_refs[li][:], bf16) + b_refs[li][:]
        if l < meta["n_color"] - 1:
            h = jnp.maximum(h, 0.0)
        li += 1
    gc = h[:, 0:3]
    if meta["squeeze_out"]:
        gc = jax.nn.sigmoid(gc)

    # ---- relight chain ----
    if meta["n_relight"] > 0:
        gc_block = jnp.concatenate([gc, jnp.zeros((T, 125), jnp.float32)], axis=1)
        h = jnp.concatenate([small, dirs_r], axis=1)                 # [T, 256]
        for l in range(meta["n_relight"]):
            kind, in_p, out_p, out_real = meta["layers"][li]
            if l > 0:
                h = jnp.maximum(h, 0.0)
            if kind == "relight_yin":
                h = jnp.concatenate([gc_block, h], axis=1)
            h = _kdot(h, w_refs[li][:], bf16) + b_refs[li][:]
            li += 1
        delta = h[:, 0:3]
        if meta["inv_sigmoid"]:
            gcc = jnp.clip(gc, 0.0, 1.0)
            logit = jnp.log(jnp.maximum(gcc, 1e-5) / jnp.maximum(1.0 - gcc, 1e-5))
            relit = jax.nn.sigmoid(logit + delta)
        else:
            relit = jnp.clip(gc + jax.nn.sigmoid(delta) - 0.5, 0.0, 1.0)
    else:
        delta = jnp.zeros((T, 3), jnp.float32)
        relit = gc
    return sdf, grad, gc, relit, delta


def _fwd_kernel(meta, T, bf16, refs):
    """refs = (pin, bm_e, bm_c, bm_r, *ws, *wts, *bs, out).

    wts are the PRE-transposed sdf weights ([out_p, in_p], transposed
    once per step in XLA): the reverse grad sweep's a @ W^T contractions
    become plain row-major dots — no per-tile weight transposes."""
    n_w = meta["n_sdf"] + meta["n_color"] + meta["n_relight"]
    n_t = meta["n_sdf"]
    pin_ref, bm_e_ref, bm_c_ref, bm_r_ref = refs[:4]
    w_refs = refs[4:4 + n_w]
    wt_refs = refs[4 + n_w:4 + n_w + n_t]
    b_refs = refs[4 + n_w + n_t:4 + 2 * n_w + n_t]
    out_ref = refs[-1]

    sdf, grad, gc, relit, delta = _mlp_forward(
        meta, T, bf16, w_refs, wt_refs, b_refs,
        bm_e_ref, bm_c_ref, bm_r_ref, pin_ref[:])
    out = jnp.concatenate(
        [sdf, grad, gc, relit, delta, jnp.zeros((T, 3), jnp.float32)], axis=1)
    out_ref[:] = out                                   # [T, 16]


def fused_point_pipeline_fwd(dense: dict, rcfg: RendererConfig,
                             pts: jnp.ndarray, dirs: jnp.ndarray,
                             tile: int = 512, interpret: bool = False):
    """Fused forward only (no VJP): same outputs as point_pipeline_ref."""
    ws, bs, meta = pack_pipeline_weights(dense, rcfg)
    n = pts.shape[0]
    n_pad = _rup(max(n, tile), tile)
    pts_p = jnp.zeros((n_pad, 3), pts.dtype).at[:n].set(pts)
    dirs_p = jnp.zeros((n_pad, 3), dirs.dtype).at[:n].set(dirs)
    pin = pack_point_inputs(pts_p, dirs_p)
    bm_e, bm_c, bm_r = pe_bases(rcfg)
    out = _pallas_fwd_call(meta, tile, interpret, tuple(ws), tuple(bs),
                           pin, bm_e, bm_c, bm_r)
    return (out[:n, 0:1], out[:n, 1:4], out[:n, 4:7],
            out[:n, 7:10], out[:n, 10:13])


def _fwd_kernel_entry(meta, T, bf16, *refs):
    _fwd_kernel(meta, T, bf16, refs)


# ---------------------------------------------------------------------------
# Fused backward kernel
# ---------------------------------------------------------------------------
#
# Hand-written VJP of the fused forward. The SDF part is SECOND-order
# (the input-gradient is itself an output and a color/relight input), in
# reverse-over-forward form: the grad cotangent g_bar contributes
# <grad, g_bar> = directional derivative of the sdf along g_bar, so ONE
# forward tangent stream along g_bar (computed AFTER the color/relight
# backward fixes g_bar) plus one joint reverse sweep over the value and
# tangent chains replaces the 3-seed-stream JVP transpose — ~45% fewer
# SDF GEMMs and roughly half the VMEM activation storage. The sigma''
# term couples the tangent cotangents back into the value path.
# Parameter gradients accumulate across grid steps in constant-index
# output blocks.
#
# Validated (tests/test_point_pipeline.py) against jax.grad of the
# pure-XLA oracle in interpret mode.

_BWD_STORE = [jnp.bfloat16]
# bwd tile: per-layer activation storage (x, u bf16; gate f32; z bf16)
# is ~10 B/elem vs the 3-stream formulation's ~18 — 256 fits post-rewrite
_BWD_TILE = [256]


def _dsoftplus100(a):
    return jax.nn.sigmoid(100.0 * a)


def _softplus100_and_gate(a):
    """softplus(100a)/100 and its derivative sigmoid(100a), the gate
    derived FROM THE VALUE via the identity
        1 - sigmoid(z) = exp(-softplus(z))   =>   g = 1 - exp(-100*sp)
    with sp = max(a, 0) + log1p(exp(-100|a|))/100 (the stable jax.nn
    softplus form). Equal to sigmoid(100a) to ~2 ulp f32; saturation to
    g==1.0 happens at the same |a| as the stable sigmoid form.

    Why this shape: the VPU divide in 1/(1+e) stalls the MXU pipeline —
    microbenched 84 TFLOP/s for the divide+select form vs 124 TFLOP/s
    for this exp-only form on the march GEMM chain (178 ceiling);
    tools/mlp_microbench.py measures all the variants."""
    e = jnp.exp(-100.0 * jnp.abs(a))
    sp = jnp.maximum(a, 0.0) + jnp.log1p(e) * 0.01
    g = 1.0 - jnp.exp(-100.0 * sp)
    return sp, g


def _bwd_kernel(meta, T, bf16, refs):
    """refs = (pin, bm_e, bm_c, bm_r, gbar, *ws, *wts, *bs, outs...).
    wts = ALL weights pre-transposed ([out_p, in_p]) — every x_bar
    pullback is a plain row-major dot."""
    n_w = meta.n_sdf + meta.n_color + meta.n_relight
    (pin_ref, bm_e_ref, bm_c_ref, bm_r_ref, gbar_ref) = refs[:5]
    w_refs = refs[5:5 + n_w]
    wt_refs = refs[5 + n_w:5 + 2 * n_w]
    b_refs = refs[5 + 2 * n_w:5 + 3 * n_w]
    out_refs = refs[5 + 3 * n_w:]
    pin_hat_ref = out_refs[0]
    w_hat_refs = out_refs[1:1 + n_w]
    b_hat_refs = out_refs[1 + n_w:1 + 2 * n_w]

    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        for r in w_hat_refs:
            r[:] = jnp.zeros_like(r)
        for r in b_hat_refs:
            r[:] = jnp.zeros_like(r)

    gbar = gbar_ref[:]
    pin_hat = _mlp_backward(
        meta, T, bf16, w_refs, wt_refs, b_refs, w_hat_refs, b_hat_refs,
        bm_e_ref, bm_c_ref, bm_r_ref, pin_ref[:],
        gbar[:, 0:1], gbar[:, 1:4], gbar[:, 4:7], gbar[:, 7:10],
        gbar[:, 10:13])
    pin_hat_ref[:] = pin_hat


def _mlp_backward(meta, T, bf16, w_refs, wt_refs, b_refs,
                  w_hat_refs, b_hat_refs, bm_e_ref, bm_c_ref, bm_r_ref,
                  pin, sdf_hat, grad_hat, gc_hat, relit_hat, delta_hat):
    """Shared in-kernel VJP of _mlp_forward, given cotangents of its five
    outputs. Accumulates parameter gradients into w_hat/b_hat refs and
    returns the packed-input cotangent pin_hat [T, 8]. Used by the
    per-point backward kernel; the fused ray-march backward calls the
    recompute/pullback halves separately (it needs the recomputed
    outputs for the compositing backward in between)."""
    outs, stash = _mlp_recompute(meta, T, bf16, w_refs, wt_refs, b_refs,
                                 bm_e_ref, bm_c_ref, bm_r_ref, pin)
    return _mlp_pullback(meta, T, bf16, w_refs, wt_refs, b_refs,
                         w_hat_refs, b_hat_refs, bm_e_ref, bm_c_ref, bm_r_ref,
                         pin, outs, stash,
                         sdf_hat, grad_hat, gc_hat, relit_hat, delta_hat)


def _mlp_recompute(meta, T, bf16, w_refs, wt_refs, b_refs,
                   bm_e_ref, bm_c_ref, bm_r_ref, pin):
    """Backward-pass forward recompute: returns the five _mlp_forward
    outputs plus the stored activations the pullback needs."""
    inv_sqrt2 = 1.0 / math.sqrt(2.0)
    inv_scale = 1.0 / meta.scale
    featd = meta.feat_dim
    # activation-storage dtype (upcast on use); f32 when the dots are
    # f32 (interpret/oracle mode) so interpret is bit-faithful — the
    # production bf16-store error is quantified by tools/grad_audit.py.
    # The SDF chain gets its own (possibly f32) store + dot dtype: the
    # march_bwd_precision knob (reports/grad_audit.json worst leaf).
    store = _BWD_STORE[0] if bf16 else jnp.float32
    sstore = _sdf_store(meta, bf16)
    sbf = _sdf_bf(meta, bf16)
    L = meta.n_sdf
    em, el, dl = _enc_mode(meta, bf16)

    bm_e = bm_e_ref[:]
    emb, phase_e = _encode(pin, bm_e, em, el)
    phase_c = None
    if meta.has_dirs_c:
        dirs_c, phase_c = _encode(pin, bm_c_ref[:], em, dl)
    phase_r = None
    if meta.n_relight > 0:
        bm_r = bm_r_ref[:]
        dirs_r, phase_r = _encode(pin, bm_r, em, dl)

    # ---------- SDF value forward recompute, storing inputs + gates ----
    # Layer inputs stored in `store` dtype for the GEMM transposes;
    # gates kept f32 — the beta=100 sigma' (and especially the
    # 100*g*(1-g) sigma'' factor) are too sensitive to round-trip bf16.
    Xs = []            # sdf layer inputs x_l (post concat), store dtype
    Gs = []            # gates sigmoid(100 a_l), f32
    h = emb
    for l in range(L):
        kind, in_p, out_p, out_real = meta.layers[l]
        if kind == "sdf_skip":
            h = jnp.concatenate([h, emb], axis=1) * inv_sqrt2
        # layer 0's input (the PE embedding) stays f32: it is rebuilt
        # in-kernel (never exported to HBM — _stash_stored_widths) and
        # feeds the f32 layer-0 weight-grad dot (grad-audit fix)
        Xs.append(h if l == 0 else h.astype(sstore))
        a = _kdot(h, w_refs[l][:], sbf) + b_refs[l][:]
        if l < L - 1:
            h, g = _softplus100_and_gate(a)
            Gs.append(g)
        else:
            y = a
    sdf_out_p = meta.layers[L - 1][2]
    feat = y[:, 1:1 + featd]

    # ---------- grad via reverse sweep (same as the fwd kernel) ----------
    emb_g = jnp.zeros((T, meta.d0p), jnp.float32)
    p = None
    for l in range(L - 1, -1, -1):
        kind, in_p, out_p, out_real = meta.layers[l]
        if l == L - 1:
            p = jnp.broadcast_to(wt_refs[l][:][0:1, :], (T, in_p))
        else:
            p = _kdot(p * Gs[l], wt_refs[l][:], sbf)
        if kind == "sdf_skip":
            emb_g = emb_g + p[:, in_p - meta.d0p:] * inv_sqrt2
            p = p[:, :in_p - meta.d0p] * inv_sqrt2
    emb_g = emb_g + p
    grad = _encode_vjp(phase_e, bm_e, emb_g, em, el)[:, 0:3] * inv_scale
    pts = pin[:, 0:3]
    small = jnp.concatenate([pts, grad, jnp.zeros((T, 122), jnp.float32)], axis=1)
    featp = _rup(featd)
    feat_block = feat if featd == featp else jnp.concatenate(
        [feat, jnp.zeros((T, featp - featd), jnp.float32)], axis=1)

    # color forward (store inputs)
    Cs = []
    li = L
    h = (jnp.concatenate([small, dirs_c, feat_block], axis=1)
         if meta.has_dirs_c
         else jnp.concatenate([small, feat_block], axis=1))
    for l in range(meta.n_color):
        Cs.append(h.astype(store))
        h = _kdot(h, w_refs[li][:], bf16) + b_refs[li][:]
        if l < meta.n_color - 1:
            h = jnp.maximum(h, 0.0)
        li += 1
    gc_pre = h[:, 0:3]
    gc = jax.nn.sigmoid(gc_pre) if meta.squeeze_out else gc_pre

    # relight forward (store inputs)
    Rs = []
    if meta.n_relight > 0:
        gc_block = jnp.concatenate([gc, jnp.zeros((T, 125), jnp.float32)], axis=1)
        h = jnp.concatenate([small, dirs_r], axis=1)
        for l in range(meta.n_relight):
            kind, in_p, out_p, out_real = meta.layers[li]
            if l > 0:
                h = jnp.maximum(h, 0.0)
            if kind == "relight_yin":
                h = jnp.concatenate([gc_block, h], axis=1)
            Rs.append(h.astype(store))
            h = _kdot(h, w_refs[li][:], bf16) + b_refs[li][:]
            li += 1
        delta = h[:, 0:3]
        if meta.inv_sigmoid:
            gcc = jnp.clip(gc, 0.0, 1.0)
            logit = jnp.log(jnp.maximum(gcc, 1e-5) / jnp.maximum(1.0 - gcc, 1e-5))
            relit = jax.nn.sigmoid(logit + delta)
        else:
            relit = jnp.clip(gc + jax.nn.sigmoid(delta) - 0.5, 0.0, 1.0)
    else:
        delta = jnp.zeros((T, 3), jnp.float32)
        relit = gc

    sdf = y[:, 0:1] * inv_scale
    outs = (sdf, grad, gc, relit, delta)
    stash = (Xs, Gs, Cs, Rs, phase_e, phase_c, phase_r)
    return outs, stash


# ---------------------------------------------------------------------------
# Stash externalization (saved-activations backward)
# ---------------------------------------------------------------------------
#
# The fused ray-march backward can either RECOMPUTE the forward
# activations per tile (_mlp_recompute, ~27 GEMMs + the beta=100
# softplus transcendentals) or LOAD them from HBM tensors the forward
# kernel wrote (~19 KB/point round trip vs ~1x forward FLOPs of
# recompute). These helpers flatten the (outs, stash) pair into three
# lane-aligned tensors — every segment width is a 128-multiple so the
# in-kernel slices never relayout:
#   SX  [T, sum Xs widths]       sdf layer inputs, store dtype
#   SCR [T, sum Cs + Rs widths]  color+relight layer inputs, store dtype
#   SG  [T, 128] f32             outs (13 used lanes of 128)
# Phases are NOT stored: the backward recomputes them from `pin` with
# one [T, 8] @ [8, dp] dot per encoder (cheaper than 320 f32 lanes).
# Gates are NOT stored either: h_{l+1} = softplus100(a_l) IS the next
# layer's stored input, and softplus inverts into the gate with one
# elementwise exp — sigmoid(100 a) == 1 - exp(-100 h). That identity
# holds on the zero-padded lanes too (a = 0 -> h = ln2/100 -> gate 0.5)
# and cut the stash from ~19 KB/pt to ~11 KB/pt (the f32 gate plane was
# 42% of the HBM round trip). The reconstructed gate inherits the bf16
# rounding of the stored h (the f32-stored plane was exact);
# tools/grad_audit.py quantifies the production delta.

def _stash_widths(meta):
    xw = [meta.layers[l][1] for l in range(meta.n_sdf)]
    gw = [meta.layers[l][2] for l in range(meta.n_sdf - 1)]
    cw = [meta.layers[meta.n_sdf + l][1] for l in range(meta.n_color)]
    rw = [meta.layers[meta.n_sdf + meta.n_color + l][1]
          for l in range(meta.n_relight)]
    return xw, gw, cw, rw


def _stash_stored_widths(meta):
    """Per-layer STORED widths: layer-input segments the backward can
    rebuild from `pin` + the SG outs plane are not exported at all —
    the PE embedding (layer 0 and the skip concat's emb half; one
    [T, 8] @ [8, d0p] dot + sin/cos to rebuild), the color/relight
    first-layer [small | dirs] prefix (pts from pin, grad/gc from SG),
    and the yin layer's gc block. Every dropped segment is a
    128-multiple, so the kept slices never relayout. ~21% of the
    round-2 stash bytes at the flagship config."""
    xw, gw, cw, rw = _stash_widths(meta)
    xs = []
    for l in range(meta.n_sdf):
        kind, in_p, _, _ = meta.layers[l]
        if l == 0:
            xs.append(0)                      # emb: rebuilt from pin
        elif kind == "sdf_skip":
            xs.append(in_p - meta.d0p)        # h half only
        else:
            xs.append(in_p)
    featp = _rup(meta.feat_dim)
    cs = [featp if l == 0 else cw[l] for l in range(meta.n_color)]
    rs = []
    for l in range(meta.n_relight):
        kind, in_p, _, _ = meta.layers[meta.n_sdf + meta.n_color + l]
        if kind == "relight_first":
            rs.append(0)                      # [small | dirs_r]: rebuilt
        elif kind == "relight_yin":
            rs.append(in_p - 128)             # h half only (gc from SG)
        else:
            rs.append(in_p)
    return xs, cs, rs


def stash_lane_widths(meta):
    """(DX, DCR, DG): lane widths of the flattened stash tensors."""
    xs, cs, rs = _stash_stored_widths(meta)
    return sum(xs), sum(cs) + sum(rs), 128


def flatten_stash(meta, outs, stash):
    """(outs, stash) -> (SX, SCR, SG) for HBM export (phases dropped,
    rebuildable layer-input segments sliced off — _stash_stored_widths)."""
    Xs, _Gs, Cs, Rs, _pe, _pc, _pr = stash
    sdf, grad, gc, relit, delta = outs
    T = sdf.shape[0]
    xs, cs, rs = _stash_stored_widths(meta)
    # skip layers keep the PREFIX (input = [h | emb]); color_first /
    # relight_yin keep the SUFFIX (input = [rebuildable | kept])
    xparts = [Xs[l][:, :xs[l]] for l in range(meta.n_sdf) if xs[l] > 0]
    cparts = [Cs[l][:, Cs[l].shape[1] - cs[l]:] for l in range(meta.n_color)
              if cs[l] > 0]
    rparts = [Rs[l][:, Rs[l].shape[1] - rs[l]:] for l in range(meta.n_relight)
              if rs[l] > 0]
    # Xs[0] is f32 (rebuilt in-kernel, layer-0 grad-audit fix); the
    # exported parts all carry the store dtype — take it from Xs[-1]
    store = Xs[-1].dtype
    SX = (jnp.concatenate(xparts, axis=1) if xparts
          else jnp.zeros((T, 0), store))
    SCR = jnp.concatenate(cparts + rparts, axis=1)
    SG = jnp.concatenate(
        [sdf, grad, gc, relit, delta, jnp.zeros((T, 115), jnp.float32)],
        axis=1)
    return SX, SCR, SG


def unflatten_stash(meta, pin, bm_e_ref, bm_c_ref, bm_r_ref, SX, SCR, SG,
                    bf16=True):
    """(SX, SCR, SG) + pin -> (outs, stash), phases recomputed from pin.

    Inverse of flatten_stash up to the dropped phases and gates; the
    values are what _mlp_recompute would return (the store dtypes
    match and outs travel f32), equal up to compiler fma/fusion
    reassociation plus the store-dtype rounding of the reconstructed
    gates (exact when the store dtype is f32 — interpret/oracle).

    Dropped segments (_stash_stored_widths) are rebuilt here: the PE
    embeddings from pin (the dots the phases already need), `small`
    from pin + the SG grad lanes, and the yin gc block from the SG gc
    lanes. The rebuilt values are f32 of the same expressions the
    forward stored; every consumer casts to the dot dtype on use, so
    production gradients are unchanged (bf16(f32 x) == stored bf16 x)
    and the interpret/oracle path stays exact."""
    T = pin.shape[0]
    store = SX.dtype       # sdf-chain store (f32 under f32stash/f32)
    crstore = SCR.dtype    # color/relight store (always _BWD_STORE)
    inv_sqrt2 = 1.0 / math.sqrt(2.0)
    outs = (SG[:, 0:1], SG[:, 1:4], SG[:, 4:7], SG[:, 7:10], SG[:, 10:13])
    grad_sg = SG[:, 1:4]
    gc_sg = SG[:, 4:7]
    em, el, dl = _enc_mode(meta, bf16)

    emb, phase_e = _encode(pin, bm_e_ref[:], em, el)
    dirs_c = phase_c = None
    if meta.has_dirs_c:
        dirs_c, phase_c = _encode(pin, bm_c_ref[:], em, dl)
    dirs_r = phase_r = None
    if meta.n_relight > 0:
        dirs_r, phase_r = _encode(pin, bm_r_ref[:], em, dl)
    small = jnp.concatenate(
        [pin[:, 0:3], grad_sg, jnp.zeros((T, 122), jnp.float32)], axis=1)

    xs, cs, rs = _stash_stored_widths(meta)
    Xs, o = [], 0
    for l in range(meta.n_sdf):
        kind, in_p, _, _ = meta.layers[l]
        kept = SX[:, o:o + xs[l]]
        o += xs[l]
        if l == 0:
            # f32 on purpose — see _mlp_recompute (layer-0 grad-audit fix)
            Xs.append(emb)
        elif kind == "sdf_skip":
            Xs.append(jnp.concatenate(
                [kept, (emb * inv_sqrt2).astype(store)], axis=1))
        else:
            Xs.append(kept)
    Cs, o = [], 0
    for l in range(meta.n_color):
        kept = SCR[:, o:o + cs[l]]
        o += cs[l]
        if l == 0:
            pre = ([small.astype(crstore), dirs_c.astype(crstore)]
                   if meta.has_dirs_c else [small.astype(crstore)])
            Cs.append(jnp.concatenate(pre + [kept], axis=1))
        else:
            Cs.append(kept)
    Rs = []
    for l in range(meta.n_relight):
        kind, in_p, _, _ = meta.layers[meta.n_sdf + meta.n_color + l]
        kept = SCR[:, o:o + rs[l]]
        o += rs[l]
        if kind == "relight_first":
            Rs.append(jnp.concatenate(
                [small, dirs_r], axis=1).astype(crstore))
        elif kind == "relight_yin":
            gc_block = jnp.concatenate(
                [gc_sg, jnp.zeros((T, 125), jnp.float32)], axis=1)
            Rs.append(jnp.concatenate(
                [gc_block.astype(crstore), kept], axis=1))
        else:
            Rs.append(kept)
    # gate reconstruction: layer l's gate from layer l+1's stored input
    # (undoing the skip concat's 1/sqrt(2) scaling where needed)
    sqrt2 = math.sqrt(2.0)
    Gs = []
    for l in range(meta.n_sdf - 1):
        kind_n, in_p_n, _out_p_n, _ = meta.layers[l + 1]
        h = Xs[l + 1].astype(jnp.float32)
        if kind_n == "sdf_skip":
            h = h[:, : in_p_n - meta.d0p] * sqrt2
        Gs.append(1.0 - jnp.exp(-100.0 * h))
    # phase_e/phase_c/phase_r come straight from _encode above — the
    # same dot the recomputed embeddings already needed.
    return outs, (Xs, Gs, Cs, Rs, phase_e, phase_c, phase_r)


def _mlp_pullback(meta, T, bf16, w_refs, wt_refs, b_refs,
                  w_hat_refs, b_hat_refs, bm_e_ref, bm_c_ref, bm_r_ref,
                  pin, outs, stash,
                  sdf_hat, grad_hat, gc_hat, relit_hat, delta_hat):
    """Pullback half of the backward: consumes the recompute's outputs
    and stored activations, accumulates parameter gradients, returns
    pin_hat [T, 8]."""
    inv_sqrt2 = 1.0 / math.sqrt(2.0)
    inv_scale = 1.0 / meta.scale
    featd = meta.feat_dim
    store = _BWD_STORE[0] if bf16 else jnp.float32
    sstore = _sdf_store(meta, bf16)
    sbf = _sdf_bf(meta, bf16)
    L = meta.n_sdf
    em, el, dl = _enc_mode(meta, bf16)
    sdf_out_p = meta.layers[L - 1][2]
    bm_e = bm_e_ref[:]
    if meta.has_dirs_c:
        bm_c = bm_c_ref[:]
    if meta.n_relight > 0:
        bm_r = bm_r_ref[:]
    _sdf, grad, gc, relit, delta = outs
    Xs, Gs, Cs, Rs, phase_e, phase_c, phase_r = stash

    pts_hat = jnp.zeros((T, 3), jnp.float32)

    # relit / relight backward
    if meta.n_relight > 0:
        if meta.inv_sigmoid:
            sbar = relit * (1.0 - relit) * relit_hat
            delta_tot = delta_hat + sbar
            dlogit = jnp.where(gc > 1e-5, 1.0 / jnp.maximum(gc, 1e-5), 0.0) + \
                jnp.where(1.0 - gc > 1e-5, 1.0 / jnp.maximum(1.0 - gc, 1e-5), 0.0)
            inside = ((gc > 0.0) & (gc < 1.0)).astype(jnp.float32)
            gc_from_relit = sbar * dlogit * inside
        else:
            sd = jax.nn.sigmoid(delta)
            pre = gc + sd - 0.5
            gate = ((pre > 0.0) & (pre < 1.0)).astype(jnp.float32)
            gc_from_relit = gate * relit_hat
            delta_tot = delta_hat + gate * relit_hat * sd * (1.0 - sd)

        # reverse the relight chain
        li_r = meta.n_sdf + meta.n_color + meta.n_relight - 1
        kindL, in_pL, out_pL, _ = meta.layers[li_r]
        hbar = jnp.concatenate(
            [delta_tot, jnp.zeros((T, out_pL - 3), jnp.float32)], axis=1)
        gc_from_yin = jnp.zeros((T, 3), jnp.float32)
        dirs_r_hat = jnp.zeros((T, 128), jnp.float32)
        for l in range(meta.n_relight - 1, -1, -1):
            li_l = meta.n_sdf + meta.n_color + l
            kind, in_p, out_p, out_real = meta.layers[li_l]
            # Rs[l] stays in its store dtype: _kdot_b casts to the dot
            # dtype itself, and the relu-gate compares work on bf16
            Xl = Rs[l]
            w_hat_refs[li_l][:] += _kdot_b(Xl, hbar, bf16)
            b_hat_refs[li_l][:] += jnp.sum(hbar, axis=0, keepdims=True)
            xbar = _kdot(hbar, wt_refs[li_l][:], bf16)
            if kind == "relight_yin":
                gc_from_yin = gc_from_yin + xbar[:, 0:3]
                xbar = xbar[:, 128:]
            if l > 0:
                # relu between layer l-1's output and this input
                # (compare in f32 — the VPU has no bf16 cmpf)
                relu_gate = (Xl[:, 128:128 + xbar.shape[1]] if kind == "relight_yin"
                             else Xl)
                hbar = xbar * (relu_gate[:, :xbar.shape[1]]
                               .astype(jnp.float32) > 0.0)
            else:
                pts_hat = pts_hat + xbar[:, 0:3]
                grad_hat = grad_hat + xbar[:, 3:6]
                dirs_r_hat = xbar[:, 128:256]
        gc_tot = gc_hat + gc_from_relit + gc_from_yin
    else:
        gc_tot = gc_hat + relit_hat  # relit aliases gc for plain neus
        dirs_r_hat = jnp.zeros((T, 128), jnp.float32)

    # squeeze sigmoid
    if meta.squeeze_out:
        c_hat3 = gc * (1.0 - gc) * gc_tot
    else:
        c_hat3 = gc_tot

    # reverse the color chain
    liC0 = meta.n_sdf
    kindL, in_pL, out_pL, _ = meta.layers[liC0 + meta.n_color - 1]
    hbar = jnp.concatenate([c_hat3, jnp.zeros((T, out_pL - 3), jnp.float32)], axis=1)
    for l in range(meta.n_color - 1, -1, -1):
        li_l = liC0 + l
        kind, in_p, out_p, out_real = meta.layers[li_l]
        Xl = Cs[l]
        w_hat_refs[li_l][:] += _kdot_b(Xl, hbar, bf16)
        b_hat_refs[li_l][:] += jnp.sum(hbar, axis=0, keepdims=True)
        xbar = _kdot(hbar, wt_refs[li_l][:], bf16)
        if l > 0:
            hbar = xbar * (Xl.astype(jnp.float32) > 0.0)
    pts_hat = pts_hat + xbar[:, 0:3]
    grad_hat = grad_hat + xbar[:, 3:6]
    dblk = 128 if meta.has_dirs_c else 0
    if meta.has_dirs_c:
        dirs_c_hat = xbar[:, 128:256]
    feat_hat = xbar[:, 128 + dblk:128 + dblk + featd]

    # ---------- sdf chain: second-order reverse-over-forward ----------
    # <grad, grad_hat> = inv_scale * directional derivative of f0_raw
    # along grad_hat, so run ONE tangent stream v along grad_hat through
    # the (recomputed) value chain, then reverse value+tangent jointly.
    # The last layer's tangent cotangent is inv_scale*e0, so its GEMMs
    # degenerate: u_{L-1} only enters via a column-0 rank-1 update and
    # u_bar_{L-1} is just a broadcast weight column.
    if em == "highest":
        phase_t = jnp.dot(grad_hat, bm_e[0:3],
                          preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)  # [T, d0p]
    elif em == "hilo":
        ghi, glo = _hilo(grad_hat)
        bmb = bm_e[0:3].astype(jnp.bfloat16)
        _kw = dict(preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.DEFAULT)
        phase_t = jnp.dot(ghi, bmb, **_kw) + jnp.dot(glo, bmb, **_kw)
    else:
        # K=3 contraction as 3 exact-f32 VPU FMAs (see _encode)
        phase_t = (grad_hat[:, 0:1] * bm_e[0:1]
                   + grad_hat[:, 1:2] * bm_e[1:2]
                   + grad_hat[:, 2:3] * bm_e[2:3])
    J_e = (bm_e[8:9] + jnp.cos(phase_e) * bm_e[9:10]
           - jnp.sin(phase_e) * bm_e[10:11])
    v0 = phase_t * J_e                                  # d emb . grad_hat
    Us = []            # tangent layer inputs u_l (l < L-1), store dtype
    Zs = []            # tangent pre-gates z_l (l < L-1), store dtype
    v = v0
    for l in range(L - 1):
        kind, in_p, out_p, out_real = meta.layers[l]
        if kind == "sdf_skip":
            v = jnp.concatenate([v, v0], axis=1) * inv_sqrt2
        Us.append(v if l == 0 else v.astype(sstore))
        z = _kdot(v, w_refs[l][:], sbf)
        Zs.append(z.astype(sstore))
        v = Gs[l] * z
    kindL, in_pL, out_pL, _ = meta.layers[L - 1]
    uL = (jnp.concatenate([v, v0], axis=1) * inv_sqrt2
          if kindL == "sdf_skip" else v)                # [T, in_pL]

    emb_hat = jnp.zeros((T, meta.d0p), jnp.float32)
    v0_hat = jnp.zeros((T, meta.d0p), jnp.float32)

    # last layer: value cotangent ybar, tangent cotangent inv_scale*e0
    ybar = jnp.concatenate(
        [sdf_hat * inv_scale, feat_hat,
         jnp.zeros((T, sdf_out_p - 1 - featd), jnp.float32)], axis=1)
    wtL = wt_refs[L - 1][:]
    col0 = (jax.lax.broadcasted_iota(jnp.int32, (in_pL, out_pL), 1)
            == 0).astype(jnp.float32)
    w_hat_refs[L - 1][:] += _kdot_b(Xs[L - 1], ybar, sbf) \
        + col0 * (inv_scale * jnp.sum(uL, axis=0))[:, None]
    b_hat_refs[L - 1][:] += jnp.sum(ybar, axis=0, keepdims=True)
    hbar = _kdot(ybar, wtL, sbf)                        # cot of x_{L-1}
    ubar = jnp.broadcast_to(wtL[0:1, :], (T, in_pL)) * inv_scale
    if kindL == "sdf_skip":
        h_p = in_pL - meta.d0p
        emb_hat = emb_hat + hbar[:, h_p:] * inv_sqrt2
        v0_hat = v0_hat + ubar[:, h_p:] * inv_sqrt2
        hbar = hbar[:, :h_p] * inv_sqrt2
        ubar = ubar[:, :h_p] * inv_sqrt2

    for l in range(L - 2, -1, -1):
        kind, in_p, out_p, out_real = meta.layers[l]
        # incoming: hbar = cot of h_{l+1} = softplus(a_l),
        #           ubar = cot of v_{l+1} = g_l * z_l
        g = Gs[l]
        z = Zs[l].astype(jnp.float32)
        abar = g * hbar + (ubar * z) * (100.0 * g * (1.0 - g))
        zbar = g * ubar
        # layer 0's weight grad keeps its input operand at f32-grade
        # precision: its input rows are the PE embedding (rebuilt
        # in-kernel, kept f32), whose bf16 rounding was the dominant
        # term of the sdf/lin0 gradient error (grad audit r3: 9.46%
        # norm-rel-err). Under thin='vpu' the f32 operand is hi+lo
        # split (2 bf16 passes, _kdot_b_split); thin='mxu' keeps the
        # 6-pass HIGHEST dot. Every other layer stays bf16 (or f32
        # under the march_bwd_precision='f32' knob).
        if l == 0 and sbf and _lin0_split(meta):
            w_hat_refs[l][:] += _kdot_b_split(Xs[l], abar) \
                + _kdot_b_split(Us[l], zbar)
        else:
            bfl = sbf and l > 0
            w_hat_refs[l][:] += _kdot_b(Xs[l], abar, bfl) \
                + _kdot_b(Us[l], zbar, bfl)
        b_hat_refs[l][:] += jnp.sum(abar, axis=0, keepdims=True)
        hbar = _kdot(abar, wt_refs[l][:], sbf)
        ubar = _kdot(zbar, wt_refs[l][:], sbf)
        if kind == "sdf_skip":
            h_p = in_p - meta.d0p
            emb_hat = emb_hat + hbar[:, h_p:] * inv_sqrt2
            v0_hat = v0_hat + ubar[:, h_p:] * inv_sqrt2
            hbar = hbar[:, :h_p] * inv_sqrt2
            ubar = ubar[:, :h_p] * inv_sqrt2
    emb_hat = emb_hat + hbar
    v0_hat = v0_hat + ubar

    # ---------- pullback through the in-kernel encoders ----------
    # to the packed input lanes: pts in 0..2, dirs in 4..6
    pin_hat = _encode_vjp(phase_e, bm_e, emb_hat, em, el)
    # encoder second-derivative: v0 = phase_t * J_e(phase_e); only the
    # J_e factor depends on pin (phase_t is linear in the constant
    # cotangent direction grad_hat)
    dJ = (-jnp.sin(phase_e) * bm_e[9:10] - jnp.cos(phase_e) * bm_e[10:11])
    pin_hat = pin_hat + _bm_pullback(v0_hat * phase_t * dJ, bm_e, em, el)
    if meta.has_dirs_c:
        pin_hat = pin_hat + _encode_vjp(phase_c, bm_c, dirs_c_hat, em, dl)
    if meta.n_relight > 0:
        pin_hat = pin_hat + _encode_vjp(phase_r, bm_r, dirs_r_hat, em, dl)
    # pts also used directly via `small`
    pin_hat = pin_hat + jnp.concatenate(
        [pts_hat, jnp.zeros((T, 5), jnp.float32)], axis=1)
    return pin_hat


def _bwd_kernel_entry(meta, T, bf16, *refs):
    _bwd_kernel(meta, T, bf16, refs)


# ---------------------------------------------------------------------------
# custom_vjp plumbing
# ---------------------------------------------------------------------------

def _pallas_fwd_call(meta, T, interpret, ws, bs, pin, bm_e, bm_c, bm_r):
    n_pad = pin.shape[0]
    grid = (n_pad // T,)
    in_specs = [
        pl.BlockSpec((T, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(bm_e.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(bm_c.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(bm_r.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    # weights as bf16 kernel inputs (sdf layers stay f32 under the
    # march_bwd_precision='f32' knob — cast_kernel_weights).
    # wts = pre-transposed sdf weights for the reverse grad sweep (the
    # transpose happens ONCE per step in XLA, not per tile in the kernel)
    ws_in = cast_kernel_weights(meta, ws, interpret)
    wts_in = tuple(w.T for w in ws_in[:meta.n_sdf])
    for w in ws_in:
        in_specs.append(pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM))
    for wt in wts_in:
        in_specs.append(pl.BlockSpec(wt.shape, lambda i: (0, 0), memory_space=pltpu.VMEM))
    for b in bs:
        in_specs.append(pl.BlockSpec(b.shape, lambda i: (0, 0), memory_space=pltpu.VMEM))
    kw = {} if interpret else {
        # the fully-unrolled 17-layer chain's stack exceeds the default
        # 16 MB scoped-vmem cap; v5e has 128 MB of VMEM
        "compiler_params": pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)}
    return pl.pallas_call(
        partial(_fwd_kernel_entry, meta, T, not interpret),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((T, 16), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, 16), jnp.float32),
        interpret=interpret,
        **kw,
    )(pin, bm_e, bm_c, bm_r, *ws_in, *wts_in, *bs)


def _pallas_bwd_call(meta, T, interpret, ws, bs, pin, bm_e, bm_c, bm_r,
                     gbar):
    n_pad = pin.shape[0]
    grid = (n_pad // T,)
    in_specs = [
        pl.BlockSpec((T, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(bm_e.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(bm_c.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(bm_r.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((T, 16), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ]
    # weights as bf16 kernel inputs (sdf layers stay f32 under the
    # march_bwd_precision='f32' knob; grad accumulators stay f32).
    # wts = ALL weights pre-transposed (once per step in XLA) for the
    # x_bar pullback dots
    ws_in = cast_kernel_weights(meta, ws, interpret)
    wts_in = tuple(w.T for w in ws_in)
    for w in ws_in:
        in_specs.append(pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM))
    for wt in wts_in:
        in_specs.append(pl.BlockSpec(wt.shape, lambda i: (0, 0), memory_space=pltpu.VMEM))
    for b in bs:
        in_specs.append(pl.BlockSpec(b.shape, lambda i: (0, 0), memory_space=pltpu.VMEM))

    out_specs = [
        pl.BlockSpec((T, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((n_pad, 8), jnp.float32),
    ]
    for w in ws:
        out_specs.append(pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct(w.shape, jnp.float32))
    for b in bs:
        out_specs.append(pl.BlockSpec(b.shape, lambda i: (0, 0), memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct(b.shape, jnp.float32))

    kw = {} if interpret else {
        # grid steps accumulate into the same w_hat/b_hat blocks: the
        # grid axis must stay sequential ("arbitrary"); stack see fwd
        "compiler_params": pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024)}
    outs = pl.pallas_call(
        partial(_bwd_kernel_entry, meta, T, not interpret),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        **kw,
    )(pin, bm_e, bm_c, bm_r, gbar, *ws_in, *wts_in, *bs)
    n_w = len(ws)
    pin_hat = outs[0]
    w_hats = list(outs[1:1 + n_w])
    b_hats = list(outs[1 + n_w:])
    return pin_hat, w_hats, b_hats


@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _pipeline_core(meta, T, interpret, ws, bs, pin, bm_e, bm_c, bm_r):
    return _pallas_fwd_call(meta, T, interpret, ws, bs, pin, bm_e, bm_c, bm_r)


def _pipeline_core_fwd(meta, T, interpret, ws, bs, pin, bm_e, bm_c, bm_r):
    out = _pallas_fwd_call(meta, T, interpret, ws, bs, pin, bm_e, bm_c, bm_r)
    return out, (ws, bs, pin, bm_e, bm_c, bm_r)


def _pipeline_core_bwd(meta, T, interpret, res, gbar):
    ws, bs, pin, bm_e, bm_c, bm_r = res
    # the bwd kernel stores per-layer activations in VMEM — use a smaller
    # tile than the (storage-free) forward so the working set fits
    T_bwd = math.gcd(T, _BWD_TILE[0])
    pin_hat, w_hats, b_hats = _pallas_bwd_call(
        meta, T_bwd, interpret, ws, bs, pin, bm_e, bm_c, bm_r, gbar)
    # the pe bases are constants: zero cotangents
    return (tuple(w_hats), tuple(b_hats), pin_hat,
            jnp.zeros_like(bm_e), jnp.zeros_like(bm_c), jnp.zeros_like(bm_r))


_pipeline_core.defvjp(_pipeline_core_fwd, _pipeline_core_bwd)


def fused_point_pipeline(dense: dict, rcfg: RendererConfig,
                         pts: jnp.ndarray, dirs: jnp.ndarray,
                         tile: int = 256, interpret: bool = False):
    """Differentiable fused pipeline: outputs match point_pipeline_ref;
    gradients flow to `dense` (through the padding pack) and to pts/dirs
    (through the packed-input pullback computed in the backward kernel —
    including the PE second-derivative path feeding the tangent seeds)."""
    ws, bs, meta = pack_pipeline_weights(dense, rcfg)
    n = pts.shape[0]
    n_pad = _rup(max(n, tile), tile)
    pts_p = jnp.zeros((n_pad, 3), pts.dtype).at[:n].set(pts)
    dirs_p = jnp.zeros((n_pad, 3), dirs.dtype).at[:n].set(dirs)
    pin = pack_point_inputs(pts_p, dirs_p)
    bm_e, bm_c, bm_r = pe_bases(rcfg)
    out = _pipeline_core(meta, tile, interpret, tuple(ws), tuple(bs),
                         pin, jax.lax.stop_gradient(bm_e),
                         jax.lax.stop_gradient(bm_c),
                         jax.lax.stop_gradient(bm_r))
    return (out[:n, 0:1], out[:n, 1:4], out[:n, 4:7],
            out[:n, 7:10], out[:n, 10:13])
