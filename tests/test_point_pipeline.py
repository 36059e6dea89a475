"""Fused point-pipeline kernel vs the XLA oracle vs the fields-based path."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from color_neus_tpu.models.configs import (
    RendererConfig, SDFConfig, ColorConfig, RelightConfig,
)
from color_neus_tpu.models import neus, fields
from color_neus_tpu.ops.pallas import point_pipeline as PP

pytestmark = pytest.mark.slow  # interpret-mode Pallas oracles dominate CI time


SMALL_COLOR = RendererConfig(
    kind="color_neus",
    sdf=SDFConfig(d_hidden=64, n_layers=4, skip_in=(2,), multires=4),
    color=ColorConfig(mode="no_view_dir", d_in=6, d_feature=256, d_hidden=64,
                      n_layers=2, multires_view=0),
    relight=RelightConfig(d_hidden=64, n_layers=4, y_in_layer=3),
)
SMALL_NEUS = RendererConfig(
    kind="neus",
    sdf=SDFConfig(d_hidden=64, n_layers=4, skip_in=(2,), multires=4),
    color=ColorConfig(mode="idr", d_in=9, d_feature=256, d_hidden=64,
                      n_layers=2, multires_view=4),
)
FULL_COLOR = RendererConfig(
    kind="color_neus",
    color=ColorConfig(mode="no_view_dir", d_in=6, multires_view=0),
)


def _pts_dirs(n=100, seed=0):
    rng = np.random.RandomState(seed)
    pts = jnp.asarray(rng.randn(n, 3) * 0.4, jnp.float32)
    d = rng.randn(n, 3)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return pts, jnp.asarray(d, jnp.float32)


@pytest.mark.parametrize("rcfg", [SMALL_COLOR, SMALL_NEUS], ids=["color", "neus"])
def test_oracle_matches_fields_path(key, rcfg):
    """The dense oracle must equal the weight-norm fields implementation."""
    params = neus.init_renderer(key, rcfg)
    dense = PP.resolve_dense(params, rcfg)
    pts, dirs = _pts_dirs()

    sdf, grad, gc, relit, delta = PP.point_pipeline_ref(dense, rcfg, pts, dirs)

    sdf2, feat2, grad2 = fields.sdf_with_grad(params["sdf"], rcfg.sdf, pts)
    np.testing.assert_allclose(np.asarray(sdf), np.asarray(sdf2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(grad), np.asarray(grad2), atol=1e-5)
    color2 = fields.color_apply(params["color"], rcfg.color, pts, grad2, dirs, feat2)
    np.testing.assert_allclose(np.asarray(gc), np.asarray(color2), atol=1e-5)
    if rcfg.kind == "color_neus":
        relit2, delta2 = fields.relight_apply(params["relight"], rcfg.relight,
                                              color2, pts, dirs, grad2)
        np.testing.assert_allclose(np.asarray(relit), np.asarray(relit2), atol=1e-5)
        np.testing.assert_allclose(np.asarray(delta), np.asarray(delta2), atol=1e-5)


@pytest.mark.parametrize("rcfg", [SMALL_COLOR, SMALL_NEUS, FULL_COLOR],
                         ids=["color", "neus", "full"])
def test_fused_fwd_matches_oracle(key, rcfg):
    params = neus.init_renderer(key, rcfg)
    dense = PP.resolve_dense(params, rcfg)
    n = 100
    pts, dirs = _pts_dirs(n)

    ref = jax.jit(lambda d: PP.point_pipeline_ref(d, rcfg, pts, dirs))(dense)
    got = jax.jit(lambda d: PP.fused_point_pipeline_fwd(
        d, rcfg, pts, dirs, tile=128, interpret=True))(dense)
    names = ["sdf", "grad", "gc", "relit", "delta"]
    for name, a, b in zip(names, got, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5,
                                   err_msg=name)


def test_fused_fwd_padding(key):
    """Non-tile-multiple N and N < tile."""
    rcfg = SMALL_COLOR
    params = neus.init_renderer(key, rcfg)
    dense = PP.resolve_dense(params, rcfg)
    for n in (1, 127, 129):
        pts, dirs = _pts_dirs(n, seed=n)
        ref = PP.point_pipeline_ref(dense, rcfg, pts, dirs)
        got = PP.fused_point_pipeline_fwd(dense, rcfg, pts, dirs, tile=128,
                                          interpret=True)
        for a, b in zip(got, ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5)


def _loss_weights(n, seed=5):
    """Random cotangent weights so every output channel is exercised."""
    rng = np.random.RandomState(seed)
    return [jnp.asarray(rng.randn(*s).astype(np.float32))
            for s in ((n, 1), (n, 3), (n, 3), (n, 3), (n, 3))]


@pytest.mark.parametrize("rcfg", [SMALL_COLOR, SMALL_NEUS], ids=["color", "neus"])
def test_fused_bwd_matches_oracle_grad(key, rcfg):
    """The hand-written backward kernel must match jax.grad of the oracle
    for gradients w.r.t. dense weights AND pts/dirs (second order incl.)."""
    params = neus.init_renderer(key, rcfg)
    dense = PP.resolve_dense(params, rcfg)
    n = 64
    pts, dirs = _pts_dirs(n)
    lw = _loss_weights(n)

    def loss_ref(dense, pts, dirs):
        outs = PP.point_pipeline_ref(dense, rcfg, pts, dirs)
        return sum(jnp.sum(w * o) for w, o in zip(lw, outs))

    def loss_fused(dense, pts, dirs):
        outs = PP.fused_point_pipeline(dense, rcfg, pts, dirs, tile=64,
                                       interpret=True)
        return sum(jnp.sum(w * o) for w, o in zip(lw, outs))

    g_ref = jax.jit(jax.grad(loss_ref, argnums=(0, 1, 2)))(dense, pts, dirs)
    g_fus = jax.jit(jax.grad(loss_fused, argnums=(0, 1, 2)))(dense, pts, dirs)

    # bf16 activation storage in the bwd kernel: tolerances sized to it
    ref_leaves, ref_tree = jax.tree_util.tree_flatten(g_ref[0])
    fus_leaves, fus_tree = jax.tree_util.tree_flatten(g_fus[0])
    assert ref_tree == fus_tree
    for i, (a, b) in enumerate(zip(fus_leaves, ref_leaves)):
        scale = max(float(jnp.abs(b).max()), 1e-3)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=4e-3 * scale, rtol=0.05,
                                   err_msg=f"dense leaf {i}")
    for name, a, b in (("pts", g_fus[1], g_ref[1]), ("dirs", g_fus[2], g_ref[2])):
        scale = max(float(jnp.abs(b).max()), 1e-3)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=4e-3 * scale, rtol=0.05, err_msg=name)


def test_fused_bwd_exact_with_f32_storage(key):
    """With f32 activation storage the hand-written backward is exact
    (validates the math separately from storage precision)."""
    rcfg = SMALL_COLOR
    params = neus.init_renderer(key, rcfg)
    dense = PP.resolve_dense(params, rcfg)
    n = 64
    pts, dirs = _pts_dirs(n)
    lw = _loss_weights(n)

    def loss_ref(dense):
        outs = PP.point_pipeline_ref(dense, rcfg, pts, dirs)
        return sum(jnp.sum(w * o) for w, o in zip(lw, outs))

    def loss_fused(dense):
        outs = PP.fused_point_pipeline(dense, rcfg, pts, dirs, tile=64,
                                       interpret=True)
        return sum(jnp.sum(w * o) for w, o in zip(lw, outs))

    old = PP._BWD_STORE[0]
    PP._BWD_STORE[0] = jnp.float32
    try:
        g_ref = jax.grad(loss_ref)(dense)
        g_fus = jax.grad(loss_fused)(dense)
    finally:
        PP._BWD_STORE[0] = old
    for a, b in zip(jax.tree_util.tree_leaves(g_fus),
                    jax.tree_util.tree_leaves(g_ref)):
        scale = max(float(jnp.abs(b).max()), 1e-3)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4 * scale, rtol=1e-4)


def test_render_rays_fused_core_matches_plain(key):
    """Full renderer: fused_core (interpret) must match the plain path,
    forward and gradient."""
    import dataclasses
    from color_neus_tpu.ops.rays import near_far_from_sphere

    base = dataclasses.replace(SMALL_COLOR, n_samples=8, n_importance=4,
                               up_sample_steps=2, fused_sdf="off",
                               fused_core="off")
    fused = dataclasses.replace(base, fused_core="interpret", fused_tile=64)
    params = neus.init_renderer(key, base)
    rng = np.random.RandomState(2)
    n = 8
    d = rng.randn(n, 3)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    o = jnp.asarray(-2.3 * d, jnp.float32)
    dd = jnp.asarray(d, jnp.float32)
    near, far = near_far_from_sphere(o, dd)

    out0 = neus.render_rays(params, base, o, dd, near, far, perturb_overwrite=0.0)
    out1 = neus.render_rays(params, fused, o, dd, near, far, perturb_overwrite=0.0)
    for k in ("color_fine", "weight_sum", "depth", "global_color", "delta_relight"):
        np.testing.assert_allclose(np.asarray(out0[k]), np.asarray(out1[k]),
                                   atol=2e-5, err_msg=k)
    np.testing.assert_allclose(float(out0["gradient_error"]),
                               float(out1["gradient_error"]), rtol=1e-4)

    def loss(p, cfg):
        out = neus.render_rays(p, cfg, o, dd, near, far, perturb_overwrite=0.0)
        return (jnp.mean((out["color_fine"] - 0.5) ** 2)
                + 0.1 * out["gradient_error"]
                + jnp.mean(out["delta_relight"]) ** 2)

    g0 = jax.grad(lambda p: loss(p, base))(params)
    g1 = jax.grad(lambda p: loss(p, fused))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g0)):
        scale = max(float(jnp.abs(b).max()), 1e-4)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-3 * scale, rtol=0.05)


@pytest.mark.parametrize("variant", ["no_normal", "no_inv_sigmoid", "no_grad_relight"])
def test_fused_config_variants(key, variant):
    """Less-common config branches must match the oracle through the
    fused kernels: no_normal color mode, RELIGHT.INV_SIGMOID=False,
    RELIGHT.INCLUDE_GRAD=False."""
    import dataclasses
    if variant == "no_normal":
        rcfg = RendererConfig(
            kind="neus",
            sdf=SDFConfig(d_hidden=64, n_layers=4, skip_in=(2,), multires=4),
            color=ColorConfig(mode="no_normal", d_in=6, d_feature=256,
                              d_hidden=64, n_layers=2, multires_view=4))
    elif variant == "no_inv_sigmoid":
        rcfg = dataclasses.replace(
            SMALL_COLOR, relight=dataclasses.replace(SMALL_COLOR.relight,
                                                     inv_sigmoid=False))
    else:
        rcfg = dataclasses.replace(
            SMALL_COLOR, relight=dataclasses.replace(SMALL_COLOR.relight,
                                                     include_grad=False, d_in=6))
    params = neus.init_renderer(key, rcfg)
    dense = PP.resolve_dense(params, rcfg)
    n = 64
    pts, dirs = _pts_dirs(n)
    ref = PP.point_pipeline_ref(dense, rcfg, pts, dirs)
    got = PP.fused_point_pipeline_fwd(dense, rcfg, pts, dirs, tile=64,
                                      interpret=True)
    for name, a, b in zip(["sdf", "grad", "gc", "relit", "delta"], got, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5,
                                   err_msg=f"{variant}:{name}")
    # gradients too
    lw = _loss_weights(n)
    g_ref = jax.grad(lambda d_: sum(jnp.sum(w * o) for w, o in zip(
        lw, PP.point_pipeline_ref(d_, rcfg, pts, dirs))))(dense)
    g_fus = jax.grad(lambda d_: sum(jnp.sum(w * o) for w, o in zip(
        lw, PP.fused_point_pipeline(d_, rcfg, pts, dirs, tile=64,
                                    interpret=True))))(dense)
    for a, b in zip(jax.tree_util.tree_leaves(g_fus),
                    jax.tree_util.tree_leaves(g_ref)):
        scale = max(float(jnp.abs(b).max()), 1e-3)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=4e-3 * scale, rtol=0.05)

