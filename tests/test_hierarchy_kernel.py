"""Fused hierarchy kernel (interpret mode) vs the XLA sampling path."""

import numpy as np
import jax
import jax.numpy as jnp

from color_neus_tpu.models.configs import RendererConfig, ColorConfig, SDFConfig

# hierarchy logic is independent of the SDF width: a small no-skip MLP
# keeps these interpret-mode tests fast (one skip-config test below
# covers the skip layout)
_SMALL_SDF = SDFConfig(d_hidden=64, n_layers=2, skip_in=(), multires=4)
from color_neus_tpu.models import neus
from color_neus_tpu.ops.pallas.hierarchy import (
    fused_hierarchy_z, resolve_hierarchy_mode)
from color_neus_tpu.ops.rays import near_far_from_sphere


def _rays(key, R, spread=0.3):
    k1, k2 = jax.random.split(key)
    rd = jax.random.normal(k2, (R, 3))
    rd = rd / jnp.linalg.norm(rd, axis=1, keepdims=True)
    ro = -2.5 * rd + spread * jax.random.normal(k1, (R, 3))
    near, far = near_far_from_sphere(ro, rd)
    return ro, rd, near, far


def test_hierarchy_kernel_matches_xla(key):
    rcfg = RendererConfig(kind="neus", n_samples=16, n_importance=8,
                          up_sample_steps=4, sdf=_SMALL_SDF)
    params = neus.init_renderer(key, rcfg)
    ro, rd, near, far = _rays(jax.random.fold_in(key, 1), R=6)

    z_ref = neus.hierarchical_z_vals(params, rcfg, ro, rd, near, far,
                                     key=None, perturb_overwrite=0.0)
    z_got = fused_hierarchy_z(params["sdf"], rcfg, ro, rd, near, far,
                              t_rand=None, interpret=True)
    # 5e-4: the in-kernel cdf uses a doubling scan (different float
    # summation order than XLA's cumsum); where the cdf is nearly flat
    # the inverse-CDF interpolation amplifies the ~1e-7 cdf difference.
    np.testing.assert_allclose(np.asarray(z_got), np.asarray(z_ref),
                               atol=5e-4)


def test_hierarchy_kernel_perturbed(key):
    """Same perturb draw (t_rand = uniform(key) - 0.5) as the XLA path."""
    rcfg = RendererConfig(kind="neus", n_samples=16, n_importance=8,
                          up_sample_steps=4, sdf=_SMALL_SDF)
    params = neus.init_renderer(key, rcfg)
    ro, rd, near, far = _rays(jax.random.fold_in(key, 2), R=5)
    pk = jax.random.fold_in(key, 3)
    t_rand = jax.random.uniform(pk, (5, 1)) - 0.5

    z_ref = neus.hierarchical_z_vals(params, rcfg, ro, rd, near, far, key=pk)
    z_got = fused_hierarchy_z(params["sdf"], rcfg, ro, rd, near, far,
                              t_rand=t_rand, interpret=True)
    np.testing.assert_allclose(np.asarray(z_got), np.asarray(z_ref),
                               atol=5e-4)
    assert bool(jnp.all(jnp.diff(z_got, axis=1) >= -1e-6))


def test_hierarchy_kernel_ray_padding(key):
    """R not a multiple of the ray tile."""
    rcfg = RendererConfig(kind="neus", n_samples=16, n_importance=8,
                          up_sample_steps=2, sdf=_SMALL_SDF)
    params = neus.init_renderer(key, rcfg)
    ro, rd, near, far = _rays(jax.random.fold_in(key, 4), R=7)
    z_ref = neus.hierarchical_z_vals(params, rcfg, ro, rd, near, far,
                                     key=None, perturb_overwrite=0.0)
    z_got = fused_hierarchy_z(params["sdf"], rcfg, ro, rd, near, far,
                              t_rand=None, tile_rays=3, interpret=True)
    np.testing.assert_allclose(np.asarray(z_got), np.asarray(z_ref),
                               atol=5e-4)


def test_render_rays_train_with_fused_hierarchy(key):
    """Full training-loss render: fused hierarchy (interpret) vs the
    XLA sampling, both through the fused march (interpret)."""
    import dataclasses
    from color_neus_tpu.models.configs import RelightConfig
    rcfg = RendererConfig(
        kind="color_neus", n_samples=16, n_importance=8, up_sample_steps=4,
        perturb=0.0, fused_march="interpret", fused_sdf="interpret",
        fused_hierarchy="off", sdf=_SMALL_SDF,
        color=ColorConfig(mode="no_view_dir", d_in=6, multires_view=0,
                          d_hidden=64, n_layers=2),
        relight=RelightConfig(d_hidden=64, n_layers=4, y_in_layer=3))
    params = neus.init_renderer(key, rcfg)
    ro, rd, near, far = _rays(jax.random.fold_in(key, 5), R=6)

    out_ref = neus.render_rays_train(params, rcfg, ro, rd, near, far)
    rcfg_h = dataclasses.replace(rcfg, fused_hierarchy="interpret")
    out_got = neus.render_rays_train(params, rcfg_h, ro, rd, near, far)
    for k in ("color_fine", "weight_sum", "gradient_error", "delta_sum"):
        np.testing.assert_allclose(np.asarray(out_got[k]),
                                   np.asarray(out_ref[k]),
                                   atol=2e-5, rtol=1e-4)


def test_resolve_hierarchy_mode():
    rcfg = RendererConfig(kind="neus", n_samples=16, n_importance=8,
                          up_sample_steps=4, sdf=_SMALL_SDF)
    import dataclasses
    assert resolve_hierarchy_mode(
        dataclasses.replace(rcfg, fused_hierarchy="off")) is False
    assert resolve_hierarchy_mode(
        dataclasses.replace(rcfg, fused_hierarchy="on")) is True
    assert resolve_hierarchy_mode(
        dataclasses.replace(rcfg, fused_hierarchy="interpret")) == "interpret"
    # auto on CPU -> off
    assert resolve_hierarchy_mode(rcfg) is False
    # no importance sampling -> nothing to fuse
    assert resolve_hierarchy_mode(
        dataclasses.replace(rcfg, n_importance=0,
                            fused_hierarchy="on")) is False
