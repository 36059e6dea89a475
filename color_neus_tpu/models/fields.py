"""Neural fields as functional param pytrees.

Every network is a pair (init_* -> params, *_apply(params, ...) -> out) of
pure functions; params are dicts of jnp arrays, jit/vmap/shard-friendly.

Semantics tracked against the reference (/root/reference/lib/models/renderers/fields.py):
  * SDFNetwork (fields.py:12-116): geometric init, weight-norm reparam,
    softplus(beta=100), skip connection with /sqrt(2), the x3.0 input /
    ÷3.0 output "scale trick" (fields.py:82,97)
  * RenderingNetwork (fields.py:119-188): idr/no_view_dir/no_normal modes
  * SingleVariance (fields.py:277-286): inv_s = exp(10 * v)
  * RelightNetwork (fields.py:289-368): mid-network rgb injection and
    inverse-sigmoid residual
  * NeRF background net (fields.py:192-274)

Matmul precision: callers should run under
jax.default_matmul_precision('float32') (or 'highest') for parity tests;
production training can drop to bf16 via the trainer's precision flag.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from color_neus_tpu.models.configs import (
    SDFConfig, ColorConfig, RelightConfig, VarianceConfig, NeRFConfig,
)
from color_neus_tpu.ops.embedding import positional_encoding, embedding_dim
from color_neus_tpu.ops.transforms import inverse_sigmoid


# ---------------------------------------------------------------------------
# Linear layers (optionally weight-normed)
# ---------------------------------------------------------------------------

def _torch_default_linear(key, d_in: int, d_out: int, dtype=jnp.float32):
    """PyTorch's default nn.Linear init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))
    for both weight and bias (kaiming_uniform(a=sqrt(5)) reduces to this).
    Kept so convergence behavior matches networks the reference leaves at
    default init (color/relight nets)."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(d_in)
    w = jax.random.uniform(kw, (d_out, d_in), dtype, -bound, bound)
    b = jax.random.uniform(kb, (d_out,), dtype, -bound, bound)
    return w, b


def make_linear(w: jnp.ndarray, b: jnp.ndarray, weight_norm: bool) -> dict:
    """Wrap a dense (w [out,in], b [out]) into (optionally) weight-norm params.

    Weight-norm (torch nn.utils.weight_norm, dim=0): w = g * v / ||v||_row
    with g initialized to the row norms so the wrapped layer starts
    identical to the plain one.
    """
    if not weight_norm:
        return {"w": w, "b": b}
    g = jnp.linalg.norm(w, axis=1)
    return {"v": w, "g": g, "b": b}


import contextlib

# Trace-time compute dtype for the MLP matmuls: params stay f32 (master
# weights), inputs/weights are cast per-layer, accumulation is f32
# (preferred_element_type). None = full f32. Set via compute_dtype().
_COMPUTE_DTYPE = [None]


@contextlib.contextmanager
def compute_dtype(dtype):
    """Context manager: run MLP matmuls in `dtype` (e.g. jnp.bfloat16)."""
    _COMPUTE_DTYPE.append(dtype)
    try:
        yield
    finally:
        _COMPUTE_DTYPE.pop()


def linear_apply(p: dict, x: jnp.ndarray) -> jnp.ndarray:
    if "v" in p:
        v = p["v"]
        w = v * (p["g"] / jnp.linalg.norm(v, axis=1).clip(1e-12))[:, None]
    else:
        w = p["w"]
    dt = _COMPUTE_DTYPE[-1]
    if dt is not None:
        y = jnp.dot(x.astype(dt), w.T.astype(dt),
                    preferred_element_type=jnp.float32)
        return y + p["b"]
    return x @ w.T + p["b"]


# ---------------------------------------------------------------------------
# SDF network
# ---------------------------------------------------------------------------

def _sdf_dims(cfg: SDFConfig):
    d0 = embedding_dim(cfg.d_in, cfg.multires) if cfg.multires > 0 else cfg.d_in
    return [d0] + [cfg.d_hidden] * cfg.n_layers + [cfg.d_out]


def init_sdf(key, cfg: SDFConfig, dtype=jnp.float32) -> dict:
    """Geometric initialization (reference fields.py:52-70): the net starts
    as an approximate sphere SDF of radius `bias`, which is load-bearing
    for convergence."""
    dims = _sdf_dims(cfg)
    n_lin = len(dims) - 1
    keys = jax.random.split(key, n_lin)
    params = {}
    for l in range(n_lin):
        out_dim = dims[l + 1] - dims[0] if (l + 1) in cfg.skip_in else dims[l + 1]
        kl = keys[l]
        if cfg.geometric_init:
            if l == n_lin - 1:
                mean = math.sqrt(math.pi) / math.sqrt(dims[l])
                if cfg.inside_outside:
                    mean, bias = -mean, cfg.bias
                else:
                    bias = -cfg.bias
                w = mean + 1e-4 * jax.random.normal(kl, (out_dim, dims[l]), dtype)
                b = jnp.full((out_dim,), bias, dtype)
            elif cfg.multires > 0 and l == 0:
                std = math.sqrt(2) / math.sqrt(out_dim)
                w = jnp.zeros((out_dim, dims[l]), dtype)
                w = w.at[:, :3].set(std * jax.random.normal(kl, (out_dim, 3), dtype))
                b = jnp.zeros((out_dim,), dtype)
            elif cfg.multires > 0 and l in cfg.skip_in:
                std = math.sqrt(2) / math.sqrt(out_dim)
                w = std * jax.random.normal(kl, (out_dim, dims[l]), dtype)
                # zero the PE part of the concatenated raw input (keep xyz)
                w = w.at[:, -(dims[0] - 3):].set(0.0)
                b = jnp.zeros((out_dim,), dtype)
            else:
                std = math.sqrt(2) / math.sqrt(out_dim)
                w = std * jax.random.normal(kl, (out_dim, dims[l]), dtype)
                b = jnp.zeros((out_dim,), dtype)
        else:
            w, b = _torch_default_linear(kl, dims[l], out_dim, dtype)
        params[f"lin{l}"] = make_linear(w, b, cfg.weight_norm)
    return params


def _softplus100(x):
    # softplus with beta=100, numerically stable (jax.nn.softplus is).
    return jax.nn.softplus(x * 100.0) / 100.0


def sdf_apply(params: dict, cfg: SDFConfig, x: jnp.ndarray) -> jnp.ndarray:
    """x [N, 3] -> [N, d_out]; channel 0 is the SDF (already ÷scale)."""
    inputs = x * cfg.scale
    if cfg.multires > 0:
        inputs = positional_encoding(inputs, cfg.multires)
    h = inputs
    n_lin = cfg.n_layers + 1
    inv_sqrt2 = 1.0 / math.sqrt(2.0)
    for l in range(n_lin):
        if l in cfg.skip_in:
            h = jnp.concatenate([h, inputs], axis=-1) * inv_sqrt2
        h = linear_apply(params[f"lin{l}"], h)
        if l < n_lin - 1:
            h = _softplus100(h)
    return jnp.concatenate([h[:, :1] / cfg.scale, h[:, 1:]], axis=-1)


def sdf_value(params: dict, cfg: SDFConfig, x: jnp.ndarray) -> jnp.ndarray:
    """x [N, 3] -> sdf [N, 1]."""
    return sdf_apply(params, cfg, x)[:, :1]


def sdf_with_grad(params: dict, cfg: SDFConfig, x: jnp.ndarray):
    """Returns (sdf [N,1], features [N,d_out-1], grad [N,3]).

    The input-gradient comes from one reverse pass (jax.vjp), matching the
    reference's autograd.grad(create_graph=True) (fields.py:105-115); the
    result is itself differentiable, so eikonal and color-net paths get
    correct second-order gradients.
    """
    out, pullback = jax.vjp(lambda p: sdf_apply(params, cfg, p), x)
    cot = jnp.zeros_like(out).at[:, 0].set(1.0)
    grad = pullback(cot)[0]
    return out[:, :1], out[:, 1:], grad


# ---------------------------------------------------------------------------
# Rendering (color) network
# ---------------------------------------------------------------------------

def _color_in_dim(cfg: ColorConfig) -> int:
    d = cfg.d_in + cfg.d_feature
    if cfg.multires_view > 0:
        d += embedding_dim(3, cfg.multires_view) - 3
    return d


def init_color(key, cfg: ColorConfig, dtype=jnp.float32) -> dict:
    dims = [_color_in_dim(cfg)] + [cfg.d_hidden] * cfg.n_layers + [cfg.d_out]
    keys = jax.random.split(key, len(dims) - 1)
    params = {}
    for l in range(len(dims) - 1):
        w, b = _torch_default_linear(keys[l], dims[l], dims[l + 1], dtype)
        params[f"lin{l}"] = make_linear(w, b, cfg.weight_norm)
    return params


def color_apply(params: dict, cfg: ColorConfig, points, normals, view_dirs, features):
    """IDR-style color MLP; input layout per mode (fields.py:161-174)."""
    if cfg.multires_view > 0:
        view_dirs = positional_encoding(view_dirs, cfg.multires_view)
    if cfg.mode == "idr":
        h = jnp.concatenate([points, view_dirs, normals, features], axis=-1)
    elif cfg.mode == "no_view_dir":
        h = jnp.concatenate([points, normals, features], axis=-1)
    elif cfg.mode == "no_normal":
        h = jnp.concatenate([points, view_dirs, features], axis=-1)
    else:
        raise ValueError(f"no such color mode: {cfg.mode}")
    n_lin = cfg.n_layers + 1
    for l in range(n_lin):
        h = linear_apply(params[f"lin{l}"], h)
        if l < n_lin - 1:
            h = jax.nn.relu(h)
    if cfg.squeeze_out:
        h = jax.nn.sigmoid(h)
    return h


# ---------------------------------------------------------------------------
# Single-variance (s) network
# ---------------------------------------------------------------------------

def init_variance(cfg: VarianceConfig, dtype=jnp.float32) -> dict:
    return {"variance": jnp.asarray(cfg.init_val, dtype)}


def variance_inv_s(params: dict) -> jnp.ndarray:
    """Scalar inv_s = exp(10 * v) — the learned deviation, UNclipped,
    exactly like the reference's SingleVarianceNetwork.forward
    (fields.py:286). (The reference clips only the FIXED 64*2^i inv_s
    of its up_sample path, NeuS.py:234 — not this learned one.)"""
    return jnp.exp(params["variance"] * 10.0)


# ---------------------------------------------------------------------------
# Relight network (Color-NeuS residual branch)
# ---------------------------------------------------------------------------

def _relight_in_dim(cfg: RelightConfig) -> int:
    d = cfg.d_in
    if cfg.include_grad:
        d += 3
    if cfg.multires_view > 0:
        d += embedding_dim(3, cfg.multires_view) - 3
    return d


def init_relight(key, cfg: RelightConfig, dtype=jnp.float32) -> dict:
    keys = jax.random.split(key, cfg.n_layers + 1)
    params = {}
    w, b = _torch_default_linear(keys[0], _relight_in_dim(cfg), cfg.d_hidden, dtype)
    params["in_layer"] = {"w": w, "b": b}
    for i in range(cfg.n_layers):
        if i == cfg.y_in_layer - 1:
            d_in = cfg.d_hidden + 3
            d_out = cfg.d_out if cfg.y_in_layer == cfg.n_layers else cfg.d_hidden
        elif i == cfg.n_layers - 1:
            d_in, d_out = cfg.d_hidden, cfg.d_out
        else:
            d_in, d_out = cfg.d_hidden, cfg.d_hidden
        w, b = _torch_default_linear(keys[i + 1], d_in, d_out, dtype)
        params[f"mlp{i}"] = {"w": w, "b": b}
    return params


def relight_apply(params: dict, cfg: RelightConfig, rgb, pts, dirs, gradients):
    """Returns (relit_rgb, delta_relight), both [N, 3].

    The residual is added in inverse-sigmoid space when cfg.inv_sigmoid
    (fields.py:354-359); the zero-mean regularizer on delta lives in the
    trainer loss.
    """
    if cfg.multires_view > 0:
        dirs = positional_encoding(dirs, cfg.multires_view)
    feats = [pts, dirs]
    if cfg.include_grad:
        feats.append(gradients)
    h = linear_apply(params["in_layer"], jnp.concatenate(feats, axis=-1))
    for i in range(cfg.n_layers):
        h = jax.nn.relu(h)
        if i == cfg.y_in_layer - 1:
            h = linear_apply(params[f"mlp{i}"], jnp.concatenate([rgb, h], axis=-1))
        else:
            h = linear_apply(params[f"mlp{i}"], h)
    drgb = h
    if cfg.inv_sigmoid:
        out = jax.nn.sigmoid(inverse_sigmoid(rgb) + drgb)
    else:
        out = jnp.clip(rgb + jax.nn.sigmoid(drgb) - 0.5, 0.0, 1.0)
    return out, drgb


# ---------------------------------------------------------------------------
# NeRF background network (NeRF++ outside-sphere model)
# ---------------------------------------------------------------------------

def init_nerf(key, cfg: NeRFConfig, dtype=jnp.float32) -> dict:
    in_pts = embedding_dim(cfg.d_in, cfg.multires) if cfg.multires > 0 else cfg.d_in
    in_view = embedding_dim(cfg.d_in_view, cfg.multires_view) if cfg.multires_view > 0 else cfg.d_in_view
    W = cfg.width
    keys = iter(jax.random.split(key, cfg.depth + 4))
    params = {}
    d_prev = in_pts
    for i in range(cfg.depth):
        w, b = _torch_default_linear(next(keys), d_prev, W, dtype)
        params[f"pts{i}"] = {"w": w, "b": b}
        d_prev = W + in_pts if i in cfg.skips else W
    w, b = _torch_default_linear(next(keys), in_view + W, W // 2, dtype)
    params["views0"] = {"w": w, "b": b}
    w, b = _torch_default_linear(next(keys), W, W, dtype)
    params["feature"] = {"w": w, "b": b}
    w, b = _torch_default_linear(next(keys), W, 1, dtype)
    params["alpha"] = {"w": w, "b": b}
    w, b = _torch_default_linear(next(keys), W // 2, 3, dtype)
    params["rgb"] = {"w": w, "b": b}
    return params


def nerf_apply(params: dict, cfg: NeRFConfig, pts, view_dirs):
    """pts [N, d_in] (inverted-sphere coords), dirs [N, 3] -> (density [N,1], rgb [N,3])."""
    if cfg.multires > 0:
        pts = positional_encoding(pts, cfg.multires)
    if cfg.multires_view > 0:
        view_dirs = positional_encoding(view_dirs, cfg.multires_view)
    h = pts
    for i in range(cfg.depth):
        h = jax.nn.relu(linear_apply(params[f"pts{i}"], h))
        if i in cfg.skips:
            h = jnp.concatenate([pts, h], axis=-1)
    alpha = linear_apply(params["alpha"], h)
    feat = linear_apply(params["feature"], h)
    h = jnp.concatenate([feat, view_dirs], axis=-1)
    h = jax.nn.relu(linear_apply(params["views0"], h))
    rgb = linear_apply(params["rgb"], h)
    return alpha, rgb


# ---------------------------------------------------------------------------
# Utilities
# ---------------------------------------------------------------------------

def param_count(params) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))
