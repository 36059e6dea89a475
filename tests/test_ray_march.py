"""Fused ray-march kernel vs the XLA render core (values + gradients)."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from color_neus_tpu.models.configs import (
    RendererConfig, SDFConfig, ColorConfig, RelightConfig,
)
from color_neus_tpu.models import neus, fields
from color_neus_tpu.models.color_neus import render_core_color_neus
from color_neus_tpu.ops.pallas.point_pipeline import resolve_dense
from color_neus_tpu.ops.pallas.ray_march import fused_ray_march


SMALL_COLOR = RendererConfig(
    kind="color_neus", n_samples=8, n_importance=8,
    fused_sdf="off", fused_core="off",
    sdf=SDFConfig(d_hidden=64, n_layers=4, skip_in=(2,), multires=4),
    color=ColorConfig(mode="no_view_dir", d_in=6, d_feature=256, d_hidden=64,
                      n_layers=2, multires_view=0),
    relight=RelightConfig(d_hidden=64, n_layers=4, y_in_layer=3),
)
SMALL_NEUS = dataclasses.replace(
    SMALL_COLOR, kind="neus",
    color=ColorConfig(mode="idr", d_in=9, d_feature=256, d_hidden=64,
                      n_layers=2, multires_view=4),
)


def _rays_z(R, S, seed=0):
    rng = np.random.RandomState(seed)
    o = rng.randn(R, 3)
    o = o / np.linalg.norm(o, axis=1, keepdims=True) * 1.4
    d = -o / 1.4 + 0.2 * rng.randn(R, 3)
    d = d / np.linalg.norm(d, axis=1, keepdims=True)
    z = np.sort(0.5 + 1.8 * rng.rand(R, S), axis=1)
    return (jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32),
            jnp.asarray(z, jnp.float32))


def _core_reduce(params, rcfg, ro, rd, z):
    """The quantities the kernel outputs, from the XLA render core."""
    core = (render_core_color_neus if rcfg.kind == "color_neus"
            else neus.render_core_neus)
    out = core(params, rcfg, ro, rd, z, 2.0 / rcfg.n_samples)
    wsum = jnp.sum(out["weights"], axis=-1)
    dsum = (jnp.sum(out["delta_relight"], axis=(1, 2))
            if "delta_relight" in out else jnp.zeros_like(wsum))
    return out["color"], wsum, dsum, out["eik_num"], out["eik_den"]


def _march_reduce(params, rcfg, ro, rd, z, interpret=True, tile_rays=2):
    dense = resolve_dense(params, rcfg)
    inv_s = fields.variance_inv_s(params["variance"])
    o16 = fused_ray_march(dense, rcfg, ro, rd, z, inv_s,
                          tile_rays=tile_rays, interpret=interpret)
    return (o16[:, 0:3], o16[:, 3], o16[:, 4],
            jnp.sum(o16[:, 5]), jnp.sum(o16[:, 6]))


@pytest.mark.parametrize("rcfg", [SMALL_COLOR, SMALL_NEUS],
                         ids=["color", "neus"])
def test_march_fwd_matches_core(key, rcfg):
    params = neus.init_renderer(key, rcfg)
    R, S = 4, rcfg.n_samples + rcfg.n_importance
    ro, rd, z = _rays_z(R, S)
    ref = jax.jit(lambda p: _core_reduce(p, rcfg, ro, rd, z))(params)
    got = jax.jit(lambda p: _march_reduce(p, rcfg, ro, rd, z))(params)
    for name, a, b in zip(("color", "wsum", "dsum", "ekn", "ekd"), got, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5,
                                   err_msg=name)


def test_march_fwd_ray_padding(key):
    rcfg = SMALL_COLOR
    params = neus.init_renderer(key, rcfg)
    S = rcfg.n_samples + rcfg.n_importance
    for R in (1, 3, 5):
        ro, rd, z = _rays_z(R, S, seed=R)
        ref = jax.jit(lambda p: _core_reduce(p, rcfg, ro, rd, z))(params)
        got = jax.jit(lambda p: _march_reduce(p, rcfg, ro, rd, z))(params)
        for a, b in zip(got, ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)


@pytest.mark.parametrize("rcfg", [SMALL_COLOR, SMALL_NEUS],
                         ids=["color", "neus"])
def test_march_bwd_matches_core_grad(key, rcfg):
    """Gradients wrt params (incl. weight-norm + variance via the outer
    autodiff), rays_o, and rays_d must match jax.grad of the XLA core."""
    params = neus.init_renderer(key, rcfg)
    R, S = 4, rcfg.n_samples + rcfg.n_importance
    ro, rd, z = _rays_z(R, S, seed=3)
    rng = np.random.RandomState(7)
    lw_c = jnp.asarray(rng.randn(R, 3), jnp.float32)
    lw_w = jnp.asarray(rng.randn(R), jnp.float32)
    lw_d = jnp.asarray(rng.randn(R), jnp.float32)

    def scalar(parts):
        color, wsum, dsum, ekn, _ekd = parts
        return (jnp.sum(lw_c * color) + jnp.sum(lw_w * wsum)
                + jnp.sum(lw_d * dsum) + 0.7 * ekn)

    def loss_ref(params, ro, rd):
        return scalar(_core_reduce(params, rcfg, ro, rd, z))

    def loss_march(params, ro, rd):
        return scalar(_march_reduce(params, rcfg, ro, rd, z))

    # jit: eager interpret-mode dispatch dominates wall time otherwise
    v_ref, g_ref = jax.jit(jax.value_and_grad(loss_ref, argnums=(0, 1, 2)))(
        params, ro, rd)
    v_m, g_m = jax.jit(jax.value_and_grad(loss_march, argnums=(0, 1, 2)))(
        params, ro, rd)
    np.testing.assert_allclose(float(v_m), float(v_ref), rtol=2e-5)

    flat_ref = jax.tree_util.tree_leaves_with_path(g_ref)
    flat_m = jax.tree_util.tree_leaves(g_m)
    assert len(flat_ref) == len(flat_m)
    for (path, a), b in zip(flat_ref, flat_m):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(a).max() + 1e-4
        np.testing.assert_allclose(b / scale, a / scale, atol=4e-4,
                                   err_msg=jax.tree_util.keystr(path))


SMALL_COLOR_VAR = dataclasses.replace(
    SMALL_COLOR,
    relight=dataclasses.replace(SMALL_COLOR.relight, include_grad=False,
                                inv_sigmoid=False, d_in=6))


@pytest.mark.parametrize("rcfg", [SMALL_COLOR, SMALL_NEUS, SMALL_COLOR_VAR],
                         ids=["color", "neus", "color_variant"])
def test_march_save_acts_matches_recompute(key, rcfg):
    """save_acts=True (stash through HBM) must reproduce the recompute
    backward: same ops, same store dtypes, only the transport differs —
    equal up to compiler fma/fusion reassociation (~1e-5 rel)."""
    params = neus.init_renderer(key, rcfg)
    R, S = 4, rcfg.n_samples + rcfg.n_importance
    ro, rd, z = _rays_z(R, S, seed=11)
    rng = np.random.RandomState(13)
    lw = jnp.asarray(rng.randn(R, 16), jnp.float32)

    def loss(params, ro, rd, save):
        dense = resolve_dense(params, rcfg)
        inv_s = fields.variance_inv_s(params["variance"])
        o16 = fused_ray_march(dense, rcfg, ro, rd, z, inv_s,
                              tile_rays=2, interpret=True, save_acts=save)
        return jnp.sum(lw * o16)

    vg = jax.jit(jax.value_and_grad(loss, argnums=(0, 1, 2)),
                 static_argnums=(3,))
    v_r, g_r = vg(params, ro, rd, False)
    v_s, g_s = vg(params, ro, rd, True)
    np.testing.assert_allclose(float(v_s), float(v_r), rtol=1e-6)
    flat_r = jax.tree_util.tree_leaves_with_path(g_r)
    flat_s = jax.tree_util.tree_leaves(g_s)
    assert len(flat_r) == len(flat_s)
    for (path, a), b in zip(flat_r, flat_s):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(a).max() + 1e-6
        np.testing.assert_allclose(b / scale, a / scale, atol=1e-5,
                                   err_msg=jax.tree_util.keystr(path))


def test_resolve_save_acts_policy(key, monkeypatch):
    """'auto' saves iff the stash fits the HBM budget; explicit values
    pass through; junk raises."""
    from color_neus_tpu.ops.pallas.point_pipeline import pack_pipeline_weights
    from color_neus_tpu.ops.pallas.ray_march import (
        march_stash_bytes, resolve_save_acts)

    params = neus.init_renderer(key, SMALL_COLOR)
    dense = resolve_dense(params, SMALL_COLOR)
    _, _, meta = pack_pipeline_weights(dense, SMALL_COLOR)

    n_pts = 4 * (SMALL_COLOR.n_samples + SMALL_COLOR.n_importance)
    bts = march_stash_bytes(meta, n_pts)
    assert bts > 0 and march_stash_bytes(meta, 2 * n_pts) == 2 * bts

    for v in (True, "save"):
        assert resolve_save_acts(v, meta, n_pts) is True
    for v in (False, "recompute", None):
        assert resolve_save_acts(v, meta, n_pts) is False
    with pytest.raises(ValueError):
        resolve_save_acts("sometimes", meta, n_pts)

    monkeypatch.setenv("MARCH_STASH_BUDGET_GB", str(bts / 1024 ** 3))
    assert resolve_save_acts("auto", meta, n_pts) is True
    assert resolve_save_acts("auto", meta, n_pts + 1) is False


def test_march_bwd_precision_modes(key):
    """march_bwd_precision plumbing: in interpret mode (all-f32 dots and
    stores already) every mode must be numerically IDENTICAL to the
    default — the knob only widens dtypes, never changes the math. Also
    checks the stash accounting grows for the f32 SX plane and that the
    meta carries the knob. save_acts=True exercises the mode-dependent
    stash export/import path (the recompute path shares the same helper
    code, covered by the base save/recompute equality test)."""
    from color_neus_tpu.ops.pallas.point_pipeline import (
        pack_pipeline_weights)
    from color_neus_tpu.ops.pallas.ray_march import march_stash_bytes

    # production default flipped to f32stash in round 4 (free on chip,
    # closes the 5k quality gap — reports/r4); pin the base arm to bf16
    # so the mode-equivalence comparison below still spans all modes
    assert RendererConfig().march_bwd_precision == "f32stash"
    base = dataclasses.replace(SMALL_COLOR, march_bwd_precision="bf16")
    params = neus.init_renderer(key, base)
    dense = resolve_dense(params, base)
    _, _, meta_b = pack_pipeline_weights(dense, base)
    assert meta_b.sdf_prec == "bf16"

    R, S = 4, base.n_samples + base.n_importance
    ro, rd, z = _rays_z(R, S, seed=17)
    rng = np.random.RandomState(19)
    lw = jnp.asarray(rng.randn(R, 16), jnp.float32)

    def loss(cfg):
        def f(params, ro, rd):
            dense = resolve_dense(params, cfg)
            inv_s = fields.variance_inv_s(params["variance"])
            o16 = fused_ray_march(dense, cfg, ro, rd, z, inv_s,
                                  tile_rays=2, interpret=True,
                                  save_acts=True)
            return jnp.sum(lw * o16)
        return jax.jit(jax.value_and_grad(f, argnums=(0, 1, 2)))

    v_b, g_b = loss(base)(params, ro, rd)
    for prec in ("f32stash", "f32"):
        rp = dataclasses.replace(base, march_bwd_precision=prec)
        _, _, meta_p = pack_pipeline_weights(dense, rp)
        assert meta_p.sdf_prec == prec
        # f32 SX stash plane costs HBM (only) in the widened modes
        assert march_stash_bytes(meta_p, 1024) > march_stash_bytes(meta_b, 1024)
        v_p, g_p = loss(rp)(params, ro, rd)
        np.testing.assert_allclose(float(v_p), float(v_b), rtol=1e-6)
        flat_b = jax.tree_util.tree_leaves_with_path(g_b)
        flat_p = jax.tree_util.tree_leaves(g_p)
        for (path, a), b in zip(flat_b, flat_p):
            a, b = np.asarray(a), np.asarray(b)
            scale = np.abs(a).max() + 1e-6
            np.testing.assert_allclose(b / scale, a / scale, atol=1e-6,
                                       err_msg=jax.tree_util.keystr(path))
