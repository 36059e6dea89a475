"""Fused Pallas kernels vs the plain-XLA oracle (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from color_neus_tpu.models.configs import SDFConfig
from color_neus_tpu.models import fields
from color_neus_tpu.ops.pallas.sdf_mlp import (
    pack_sdf_weights, make_fused_sdf_fn, resolve_sdf_fn,
)


def _check(cfg, key, n=300, atol=2e-5):
    params = fields.init_sdf(key, cfg)
    pts = jax.random.normal(jax.random.fold_in(key, 1), (n, 3)) * 0.4
    ref = fields.sdf_value(params, cfg, pts)[:, 0]
    got = make_fused_sdf_fn(params, cfg, tile=256, interpret=True)(pts)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=atol, rtol=1e-5)


def test_fused_sdf_full_size(key):
    _check(SDFConfig(), key)  # 8x256, skip at 4, PE 6 — the flagship shape


def test_fused_sdf_no_skip(key):
    _check(SDFConfig(d_hidden=64, n_layers=3, skip_in=(), multires=4), key)


def test_fused_sdf_small_skip(key):
    _check(SDFConfig(d_hidden=64, n_layers=4, skip_in=(2,), multires=4), key)


def test_fused_sdf_no_weight_norm(key):
    _check(SDFConfig(weight_norm=False), key)


def test_fused_sdf_padding_boundary(key):
    """n not a multiple of the tile, and n < tile."""
    cfg = SDFConfig(d_hidden=64, n_layers=2, skip_in=(), multires=4)
    params = fields.init_sdf(key, cfg)
    for n in (1, 255, 257):
        pts = jax.random.normal(jax.random.fold_in(key, n), (n, 3)) * 0.3
        ref = fields.sdf_value(params, cfg, pts)[:, 0]
        got = make_fused_sdf_fn(params, cfg, tile=256, interpret=True)(pts)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_pack_exactness(key):
    """Padded weights must reproduce the dense layer exactly."""
    cfg = SDFConfig(d_hidden=64, n_layers=2, skip_in=(), multires=4)
    params = fields.init_sdf(key, cfg)
    ws, bs, meta = pack_sdf_weights(params, cfg)
    # layer 0: emb(27 real) @ W
    from color_neus_tpu.ops.embedding import positional_encoding
    pts = jax.random.normal(key, (5, 3)) * 0.2
    emb = positional_encoding(pts * cfg.scale, cfg.multires)
    embp = jnp.zeros((5, meta["d0p"])).at[:, :meta["d0"]].set(emb)
    h_kernel = embp @ ws[0] + bs[0]
    from color_neus_tpu.models.fields import linear_apply
    h_ref = linear_apply(params["lin0"], emb)
    np.testing.assert_allclose(np.asarray(h_kernel[:, :64]), np.asarray(h_ref),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(h_kernel[:, 64:]), 0.0, atol=0)


def test_fused_sdf_rays_variant(key):
    """Rays+z sweep kernel (pts built in-kernel) vs the pts-based path,
    including R not a multiple of the ray tile."""
    from color_neus_tpu.ops.pallas.sdf_mlp import make_fused_sdf_rays_fn
    cfg = SDFConfig()
    params = fields.init_sdf(key, cfg)
    for R, S in ((5, 48), (4, 16), (1, 64)):
        k1, k2, k3 = jax.random.split(jax.random.fold_in(key, R * S), 3)
        ro = jax.random.normal(k1, (R, 3)) * 0.3
        rd = jax.random.normal(k2, (R, 3))
        rd = rd / jnp.linalg.norm(rd, axis=1, keepdims=True)
        z = jnp.sort(jax.random.uniform(k3, (R, S)) * 2.0, axis=1)
        pts = (ro[:, None] + rd[:, None] * z[..., None]).reshape(-1, 3)
        ref = fields.sdf_value(params, cfg, pts)[:, 0].reshape(R, S)
        got = make_fused_sdf_rays_fn(params, cfg, tile_pts=256,
                                     interpret=True)(ro, rd, z)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-5, rtol=1e-5)


def test_hierarchical_z_with_rays_sweep(key):
    """hierarchical_z_vals via the rays+z sweep matches the XLA path."""
    from color_neus_tpu.models.configs import RendererConfig
    from color_neus_tpu.models import neus
    from color_neus_tpu.ops.pallas.sdf_mlp import resolve_sdf_sweep_fn
    from color_neus_tpu.models.configs import SDFConfig
    # small skip MLP: the sweep-vs-XLA equality is independent of width,
    # and the skip layout is the only structural case worth covering
    rcfg = RendererConfig(kind="neus", n_samples=16, n_importance=8,
                          up_sample_steps=2,
                          sdf=SDFConfig(d_hidden=64, n_layers=4,
                                        skip_in=(2,), multires=4))
    params = neus.init_renderer(key, rcfg)
    k1, k2 = jax.random.split(jax.random.fold_in(key, 7))
    R = 6
    ro = jax.random.normal(k1, (R, 3)) * 0.3
    rd = jax.random.normal(k2, (R, 3))
    rd = rd / jnp.linalg.norm(rd, axis=1, keepdims=True)
    near = jnp.full((R,), 0.5)
    far = jnp.full((R,), 2.5)
    z_ref = jax.jit(lambda p: neus.hierarchical_z_vals(
        p, rcfg, ro, rd, near, far, key=None, perturb_overwrite=0.0))(params)

    def z_sweep(p):
        fn = resolve_sdf_sweep_fn(p["sdf"], rcfg.sdf, "interpret")
        return neus.hierarchical_z_vals(p, rcfg, ro, rd, near, far, key=None,
                                        perturb_overwrite=0.0, sdf_rays_fn=fn)

    z_new = jax.jit(z_sweep)(params)
    np.testing.assert_allclose(np.asarray(z_new), np.asarray(z_ref), atol=1e-5)


def test_resolve_modes(key):
    cfg = SDFConfig(d_hidden=64, n_layers=2, skip_in=(), multires=4)
    params = fields.init_sdf(key, cfg)
    assert resolve_sdf_fn(params, cfg, "off") is None
    assert resolve_sdf_fn(params, cfg, "auto") is None  # CPU in tests
    fn = resolve_sdf_fn(params, cfg, "interpret")
    pts = jax.random.normal(key, (17, 3)) * 0.3
    ref = fields.sdf_value(params, cfg, pts)[:, 0]
    np.testing.assert_allclose(np.asarray(fn(pts)), np.asarray(ref), atol=2e-5)


def test_render_rays_with_interpret_kernel(key):
    """Full renderer with the fused sweep must match the plain path."""
    from color_neus_tpu.models.configs import RendererConfig, ColorConfig
    from color_neus_tpu.models import neus
    from color_neus_tpu.ops.rays import near_far_from_sphere

    cfg = RendererConfig(
        kind="neus", n_samples=16, n_importance=8, up_sample_steps=2,
        fused_sdf="off",
        sdf=SDFConfig(d_hidden=64, n_layers=4, skip_in=(2,), multires=4),
        color=ColorConfig(mode="idr", d_in=9, d_feature=256, d_hidden=64, n_layers=2))
    params = neus.init_renderer(key, cfg)
    o = jnp.tile(jnp.asarray([[0.0, 0.0, -2.5]]), (3, 1))
    d = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (3, 1))
    near, far = near_far_from_sphere(o, d)

    out_plain = jax.jit(lambda p: neus.render_rays(
        p, cfg, o, d, near, far, perturb_overwrite=0.0))(params)

    def render_fused(p):
        fused_fn = make_fused_sdf_fn(p["sdf"], cfg.sdf, tile=256,
                                     interpret=True)
        return neus.render_rays(p, cfg, o, d, near, far,
                                perturb_overwrite=0.0, sdf_fn=fused_fn)

    out_fused = jax.jit(render_fused)(params)
    np.testing.assert_allclose(np.asarray(out_plain["color_fine"]),
                               np.asarray(out_fused["color_fine"]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(out_plain["depth"]),
                               np.asarray(out_fused["depth"]), atol=1e-4)


def test_sweep_relu_fused_matches_xla_twin(key):
    """sweep_activation='relu': the fused sweep kernel (interpret) must
    equal make_xla_sdf_rays_fn exactly-ish, and differ from softplus by
    at most ~L*ln2/100 through the depth (the placement-only bound the
    flag's docstring claims)."""
    from color_neus_tpu.ops.pallas.sdf_mlp import (
        make_fused_sdf_rays_fn, make_xla_sdf_rays_fn, resolve_sdf_sweep_fn)
    cfg = SDFConfig(d_hidden=64, n_layers=4, skip_in=(2,), multires=4)
    params = fields.init_sdf(key, cfg)
    R, S = 5, 48
    k1, k2, k3 = jax.random.split(key, 3)
    ro = jax.random.normal(k1, (R, 3)) * 0.3
    rd = jax.random.normal(k2, (R, 3))
    rd = rd / jnp.linalg.norm(rd, axis=1, keepdims=True)
    z = jnp.sort(jax.random.uniform(k3, (R, S)) * 2.0, axis=1)

    fused = make_fused_sdf_rays_fn(params, cfg, tile_pts=256,
                                   interpret=True, act="relu")(ro, rd, z)
    xla = make_xla_sdf_rays_fn(params, cfg, act="relu")(ro, rd, z)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(xla),
                               atol=2e-5, rtol=1e-5)

    soft = make_xla_sdf_rays_fn(params, cfg, act="softplus")(ro, rd, z)
    pts = (ro[:, None] + rd[:, None] * z[..., None]).reshape(-1, 3)
    ref = fields.sdf_value(params, cfg, pts)[:, 0].reshape(R, S)
    np.testing.assert_allclose(np.asarray(soft), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)
    # relu vs softplus drift stays within the advertised placement bound
    assert float(jnp.abs(fused - soft).max()) < 0.05

    # resolver: act='relu' must yield a sweep fn even where the fused
    # kernel is unavailable (CPU auto), and it must be the XLA twin
    fn = resolve_sdf_sweep_fn(params, cfg, "auto", act="relu")
    assert fn is not None
    np.testing.assert_allclose(np.asarray(fn(ro, rd, z)), np.asarray(xla),
                               atol=1e-6)
    assert resolve_sdf_sweep_fn(params, cfg, "auto") is None  # CPU softplus


def test_f32_dots_request_highest_precision(key):
    """Regression guard for the round-4 precision discovery: TPU's
    DEFAULT f32 matmul (XLA and Mosaic alike) rounds operands to bf16,
    so every dot on an f32-exactness surface must carry an explicit
    Precision.HIGHEST. CPU execution cannot discriminate (its dots are
    always true f32), so assert at the jaxpr level instead: trace
    _sdf_layers with f32 vs bf16 weights and check the recorded dot
    precisions."""
    from color_neus_tpu.ops.pallas.sdf_mlp import _sdf_layers, \
        pack_sdf_weights

    cfg = SDFConfig(d_hidden=64, n_layers=3, skip_in=(), multires=4)
    params = fields.init_sdf(key, cfg)
    ws, bs, meta = pack_sdf_weights(params, cfg)
    emb = jnp.zeros((8, meta["d0p"]), jnp.float32)

    def dot_precisions(ws_):
        # trace under an ambient DEFAULT scope: the production entry
        # points run without any default_matmul_precision override
        # (conftest's global 'highest' would mask a missing pin)
        with jax.default_matmul_precision("default"):
            jaxpr = jax.make_jaxpr(
                lambda e: _sdf_layers(meta, meta["n_lin"], ws_, bs, e))(emb)
        return [e.params.get("precision")
                for e in jaxpr.jaxpr.eqns if e.primitive.name == "dot_general"]

    f32_precs = dot_precisions(ws)
    assert f32_precs, "no dots traced"
    assert all(p is not None and "HIGHEST" in str(p) for p in f32_precs), \
        f32_precs

    bf_precs = dot_precisions(tuple(w.astype(jnp.bfloat16) for w in ws))
    assert all(p is None or "HIGHEST" not in str(p) for p in bf_precs), \
        bf_precs

    # the bf16 branch must PIN DEFAULT (not inherit): under an ambient
    # 'highest' scope — the grad audit wraps its whole comparison in
    # one — an unpinned bf16 dot picks up contract_precision<fp32>,
    # which Mosaic rejects on bf16 operands ("Bad lhs type": the
    # round-4 on-chip gate crash). Same check for the march kernels'
    # _kdot/_kdot_b.
    from color_neus_tpu.ops.pallas.point_pipeline import _kdot, _kdot_b
    with jax.default_matmul_precision("highest"):
        jx = jax.make_jaxpr(
            lambda e: _sdf_layers(
                meta, meta["n_lin"],
                tuple(w.astype(jnp.bfloat16) for w in ws), bs, e))(emb)
        precs = [e.params.get("precision") for e in jx.jaxpr.eqns
                 if e.primitive.name == "dot_general"]
        assert all(p is not None and "DEFAULT" in str(p) for p in precs), precs
        a = jnp.zeros((8, 64), jnp.float32)
        b = jnp.zeros((64, 32), jnp.float32)
        for fn in (lambda: _kdot(a, b, True), lambda: _kdot_b(a, a, True)):
            jx = jax.make_jaxpr(fn)()
            precs = [e.params.get("precision") for e in jx.jaxpr.eqns
                     if e.primitive.name == "dot_general"]
            assert all("DEFAULT" in str(p) for p in precs), precs
