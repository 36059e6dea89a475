"""Ray-chunked remat must be numerically identical to the unchunked core."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from color_neus_tpu.models.configs import RendererConfig, SDFConfig, ColorConfig, RelightConfig
from color_neus_tpu.models import neus
from color_neus_tpu.ops.rays import near_far_from_sphere


def _cfg(kind, ray_chunk):
    return RendererConfig(
        kind=kind, n_samples=8, n_importance=4, up_sample_steps=2,
        ray_chunk=ray_chunk, fused_sdf="off",
        sdf=SDFConfig(d_hidden=32, n_layers=2, skip_in=(), multires=2),
        color=ColorConfig(mode="no_view_dir" if kind == "color_neus" else "idr",
                          d_in=6 if kind == "color_neus" else 9,
                          d_feature=256, d_hidden=32, n_layers=1,
                          multires_view=0 if kind == "color_neus" else 2),
        relight=RelightConfig(d_hidden=16, n_layers=4, y_in_layer=3),
    )


def _rays(n=16):
    rng = np.random.RandomState(0)
    d = rng.randn(n, 3)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    o = -2.2 * d + 0.05 * rng.randn(n, 3)
    o = jnp.asarray(o, jnp.float32)
    d = jnp.asarray(d, jnp.float32)
    near, far = near_far_from_sphere(o, d)
    return o, d, near, far


# color_neus covers the superset (relight head); the neus-only pieces of
# the chunk path are exercised by test_chunk_not_dividing_falls_back
@pytest.mark.parametrize("kind", ["color_neus"])
def test_chunked_matches_unchunked(key, kind):
    cfg0 = _cfg(kind, 0)
    cfg4 = _cfg(kind, 4)
    params = neus.init_renderer(key, cfg0)
    o, d, near, far = _rays(16)

    # jit per config: eager CPU dispatch dominates this test's wall time
    render = lambda cfg: jax.jit(lambda p: neus.render_rays(
        p, cfg, o, d, near, far, perturb_overwrite=0.0))
    out0 = render(cfg0)(params)
    out4 = render(cfg4)(params)
    for k in ("color_fine", "weight_sum", "depth", "weights"):
        np.testing.assert_allclose(np.asarray(out0[k]), np.asarray(out4[k]),
                                   atol=1e-6, err_msg=k)
    np.testing.assert_allclose(float(out0["gradient_error"]),
                               float(out4["gradient_error"]), rtol=1e-6)

    def loss(p, cfg):
        out = neus.render_rays(p, cfg, o, d, near, far, perturb_overwrite=0.0)
        return jnp.mean(out["color_fine"]) + out["gradient_error"]

    g0 = jax.jit(jax.grad(lambda p: loss(p, cfg0)))(params)
    g4 = jax.jit(jax.grad(lambda p: loss(p, cfg4)))(params)
    for l0, l4 in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g4)):
        np.testing.assert_allclose(np.asarray(l0), np.asarray(l4), atol=2e-5)


def test_chunk_not_dividing_falls_back(key):
    cfg = _cfg("neus", 5)  # 16 % 5 != 0 -> unchunked path
    params = neus.init_renderer(key, cfg)
    o, d, near, far = _rays(16)
    out = jax.jit(lambda p: neus.render_rays(
        p, cfg, o, d, near, far, perturb_overwrite=0.0))(params)
    assert out["color_fine"].shape == (16, 3)
