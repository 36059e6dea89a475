"""Field network tests: geometric init, weight norm, softplus numerics,
SDF gradients, relight plumbing — cross-checked with torch where useful."""

import numpy as np
import torch
import jax
import jax.numpy as jnp

from color_neus_tpu.models.configs import (
    SDFConfig, ColorConfig, RelightConfig, VarianceConfig, NeRFConfig,
)
from color_neus_tpu.models import fields as F


SMALL_SDF = SDFConfig(d_hidden=64, n_layers=4, skip_in=(2,), multires=4)


def test_weight_norm_linear_matches_torch(key):
    w = jax.random.normal(key, (8, 5))
    b = jax.random.normal(jax.random.fold_in(key, 1), (8,))
    p = F.make_linear(w, b, weight_norm=True)
    x = jax.random.normal(jax.random.fold_in(key, 2), (3, 5))
    got = F.linear_apply(p, x)

    lin = torch.nn.Linear(5, 8)
    with torch.no_grad():
        lin.weight.copy_(torch.tensor(np.asarray(w)))
        lin.bias.copy_(torch.tensor(np.asarray(b)))
    lin = torch.nn.utils.weight_norm(lin)
    ref = lin(torch.tensor(np.asarray(x))).detach().numpy()
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-5)


def test_softplus_beta100_matches_torch():
    x = jnp.asarray([-0.1, -0.01, 0.0, 0.01, 0.1, 1.0], jnp.float32)
    got = F._softplus100(x)
    ref = torch.nn.Softplus(beta=100)(torch.tensor(np.asarray(x))).numpy()
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-6)


def test_sdf_geometric_init_is_approx_sphere(key):
    """Geometric init should make sdf(x) ≈ |x*scale| - bias, scaled back:
    the zero level set sits near radius bias/scale... in reference terms,
    sdf(x) ≈ |x| - bias/1 after the scale trick (input*3, output/3):
    f(x) = (|3x| - 0.5)/3 -> zero at |x| = 1/6."""
    cfg = SDFConfig()  # full-size net, scale=3, bias=0.5
    params = F.init_sdf(key, cfg)
    rng = np.random.RandomState(0)
    dirs = rng.randn(64, 3)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    means = []
    for r in (0.05, 1.0 / 6.0, 0.4, 0.8):
        pts = jnp.asarray(dirs * r, jnp.float32)
        sdf = np.asarray(F.sdf_value(params, cfg, pts)[:, 0])
        means.append(sdf.mean())
    # zero level set at radius bias/scale = 1/6 (the init sphere)
    assert abs(means[1]) < 0.03, means
    # inside negative, outside positive, monotone in radius (the init is
    # only an approximate SDF away from the surface — no absolute check)
    assert means[0] < 0 < means[2] < means[3]


def test_sdf_gradient_matches_finite_difference(key):
    cfg = SMALL_SDF
    params = F.init_sdf(key, cfg)
    pts = jax.random.normal(jax.random.fold_in(key, 3), (16, 3)) * 0.3
    _, _, grad = F.sdf_with_grad(params, cfg, pts)
    eps = 1e-3
    for ax in range(3):
        e = jnp.zeros((1, 3)).at[0, ax].set(eps)
        fp = F.sdf_value(params, cfg, pts + e)[:, 0]
        fm = F.sdf_value(params, cfg, pts - e)[:, 0]
        fd = (fp - fm) / (2 * eps)
        np.testing.assert_allclose(np.asarray(grad[:, ax]), np.asarray(fd), atol=1e-3)


def test_sdf_gradient_near_unit_at_init(key):
    """At geometric init the SDF is near-spherical so |grad| ≈ 1."""
    cfg = SDFConfig()
    params = F.init_sdf(key, cfg)
    rng = np.random.RandomState(1)
    pts = jnp.asarray(rng.randn(128, 3) * 0.4, jnp.float32)
    _, _, grad = F.sdf_with_grad(params, cfg, pts)
    norms = np.linalg.norm(np.asarray(grad), axis=1)
    assert 0.8 < norms.mean() < 1.2


def test_sdf_second_order_grads_exist(key):
    """Eikonal-style loss must be twice differentiable (vjp-of-vjp)."""
    cfg = SMALL_SDF
    params = F.init_sdf(key, cfg)
    pts = jax.random.normal(jax.random.fold_in(key, 4), (8, 3)) * 0.3

    def loss(p):
        _, _, g = F.sdf_with_grad(p, cfg, pts)
        return jnp.mean((jnp.linalg.norm(g, axis=-1) - 1.0) ** 2)

    grads = jax.grad(loss)(params)
    total = sum(float(jnp.sum(jnp.abs(g))) for g in jax.tree_util.tree_leaves(grads))
    assert np.isfinite(total) and total > 0


def test_sdf_skip_layer_shapes(key):
    cfg = SDFConfig()
    params = F.init_sdf(key, cfg)
    # lin3 out_dim = 256 - 39 = 217 (skip layer input compensation)
    lin3 = params["lin3"]
    v = lin3["v"] if "v" in lin3 else lin3["w"]
    assert v.shape == (217, 256)
    out = F.sdf_apply(params, cfg, jnp.zeros((2, 3)))
    assert out.shape == (2, 257)


def test_variance_inv_s():
    p = F.init_variance(VarianceConfig(init_val=0.3))
    np.testing.assert_allclose(float(F.variance_inv_s(p)), np.exp(3.0), rtol=1e-6)


def test_color_net_modes(key):
    n = 5
    pts = jax.random.normal(key, (n, 3))
    nrm = jax.random.normal(jax.random.fold_in(key, 1), (n, 3))
    dirs = jax.random.normal(jax.random.fold_in(key, 2), (n, 3))
    feat = jax.random.normal(jax.random.fold_in(key, 3), (n, 32))
    for mode, mv in (("idr", 4), ("no_view_dir", 0), ("no_normal", 4)):
        cfg = ColorConfig(mode=mode, d_feature=32, d_hidden=64, n_layers=2,
                          multires_view=mv, d_in=9 if mode == "idr" else 6)
        p = F.init_color(jax.random.fold_in(key, hash(mode) % 100), cfg)
        out = F.color_apply(p, cfg, pts, nrm, dirs, feat)
        assert out.shape == (n, 3)
        assert float(jnp.min(out)) >= 0.0 and float(jnp.max(out)) <= 1.0  # sigmoid


def test_relight_residual_and_inv_sigmoid(key):
    cfg = RelightConfig(d_hidden=64, n_layers=4, y_in_layer=3)
    p = F.init_relight(key, cfg)
    n = 7
    rgb = jax.nn.sigmoid(jax.random.normal(key, (n, 3)))
    pts = jax.random.normal(jax.random.fold_in(key, 1), (n, 3))
    dirs = jax.random.normal(jax.random.fold_in(key, 2), (n, 3))
    grad = jax.random.normal(jax.random.fold_in(key, 3), (n, 3))
    out, delta = F.relight_apply(p, cfg, rgb, pts, dirs, grad)
    assert out.shape == (n, 3) and delta.shape == (n, 3)
    # inverse-sigmoid residual: sigmoid(logit(rgb) + delta)
    from color_neus_tpu.ops.transforms import inverse_sigmoid
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(jax.nn.sigmoid(inverse_sigmoid(rgb) + delta)), atol=1e-6)
    # zero delta would mean identity: check it's differentiable wrt rgb
    g = jax.grad(lambda r: jnp.sum(F.relight_apply(p, cfg, r, pts, dirs, grad)[0]))(rgb)
    assert np.isfinite(np.asarray(g)).all()


def test_relight_view_dependence(key):
    cfg = RelightConfig(d_hidden=32, n_layers=4, y_in_layer=3)
    p = F.init_relight(key, cfg)
    rgb = jnp.full((1, 3), 0.5)
    pts = jnp.zeros((1, 3))
    g = jnp.ones((1, 3))
    d1 = jnp.asarray([[1.0, 0, 0]])
    d2 = jnp.asarray([[0.0, 1, 0]])
    _, delta1 = F.relight_apply(p, cfg, rgb, pts, d1, g)
    _, delta2 = F.relight_apply(p, cfg, rgb, pts, d2, g)
    assert not np.allclose(np.asarray(delta1), np.asarray(delta2))


def test_nerf_bg_apply(key):
    cfg = NeRFConfig(depth=4, width=32, multires=4, multires_view=2, skips=(2,))
    p = F.init_nerf(key, cfg)
    pts = jax.random.normal(key, (6, 4))
    dirs = jax.random.normal(jax.random.fold_in(key, 1), (6, 3))
    a, rgb = F.nerf_apply(p, cfg, pts, dirs)
    assert a.shape == (6, 1) and rgb.shape == (6, 3)


def test_param_count_full_model(key):
    """Reference model ≈ 1.4M params (SURVEY §6)."""
    from color_neus_tpu.models.configs import RendererConfig, ColorConfig
    from color_neus_tpu.models.neus import init_renderer
    rcfg = RendererConfig(kind="color_neus",
                          color=ColorConfig(mode="no_view_dir", d_in=6, multires_view=0))
    params = init_renderer(jax.random.PRNGKey(0), rcfg)
    n = F.param_count(params)
    # sdf 529k + color ~265k + relight ~207k + variance (SURVEY's "≈1.4M"
    # overcounts; the exact architecture sums to ~1.0M)
    assert 0.9e6 < n < 1.3e6, n
