"""Render + gradient parity against the independent torch oracle.

The BASELINE parity gate is "allclose render + pixel-gradient parity with
the reference". RNG parity with torch is impossible (different streams),
so identical rays are injected with perturb=0 and the same weights are
loaded into both implementations (torch in float64 = ground truth; the
JAX renderer runs float32)."""

import numpy as np
import torch
import jax
import jax.numpy as jnp
import pytest

from color_neus_tpu.models.configs import (
    RendererConfig, SDFConfig, ColorConfig, RelightConfig, VarianceConfig,
)
from color_neus_tpu.models import neus, fields
from color_neus_tpu.ops.rays import near_far_from_sphere
from tests import torch_ref as TREF


def _dense(params, n):
    from color_neus_tpu.ops.pallas.sdf_mlp import _resolve_linear
    ws, bs = [], []
    for l in range(n):
        w, b = _resolve_linear(params[f"lin{l}"])
        ws.append(np.asarray(w, np.float64))
        bs.append(np.asarray(b, np.float64))
    return ws, bs


def _build(kind, key):
    rcfg = RendererConfig(
        kind=kind, n_samples=16, n_importance=8, up_sample_steps=4,
        fused_sdf="off",
        sdf=SDFConfig(d_hidden=64, n_layers=4, skip_in=(2,), multires=4),
        color=ColorConfig(mode="no_view_dir" if kind == "color_neus" else "idr",
                          d_in=6 if kind == "color_neus" else 9,
                          d_feature=256, d_hidden=64, n_layers=2,
                          multires_view=0 if kind == "color_neus" else 4),
        relight=RelightConfig(d_hidden=32, n_layers=4, y_in_layer=3),
        variance=VarianceConfig(init_val=0.3),
    )
    params = neus.init_renderer(key, rcfg)

    sdf_ws, sdf_bs = _dense(params["sdf"], rcfg.sdf.n_layers + 1)
    t_sdf = TREF.TorchSDF(sdf_ws, sdf_bs, rcfg.sdf.skip_in, rcfg.sdf.multires,
                          rcfg.sdf.scale)
    col_ws, col_bs = _dense(params["color"], rcfg.color.n_layers + 1)
    t_col = TREF.TorchColor(col_ws, col_bs, rcfg.color.mode, rcfg.color.multires_view)

    t_rel = None
    if kind == "color_neus":
        rp = params["relight"]
        t_rel = TREF.TorchRelight(
            np.asarray(rp["in_layer"]["w"], np.float64),
            np.asarray(rp["in_layer"]["b"], np.float64),
            [np.asarray(rp[f"mlp{i}"]["w"], np.float64) for i in range(4)],
            [np.asarray(rp[f"mlp{i}"]["b"], np.float64) for i in range(4)],
            rcfg.relight.y_in_layer, rcfg.relight.multires_view,
            rcfg.relight.include_grad)
    inv_s = float(np.exp(10.0 * np.asarray(params["variance"]["variance"])))
    return rcfg, params, t_sdf, t_col, t_rel, inv_s


def _rays(n=6):
    rng = np.random.RandomState(3)
    d = rng.randn(n, 3)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    o = -2.2 * d + 0.1 * rng.randn(n, 3)
    return o, d


@pytest.mark.parametrize("kind", ["neus", "color_neus"])
def test_render_parity(key, kind):
    rcfg, params, t_sdf, t_col, t_rel, inv_s = _build(kind, key)
    o_np, d_np = _rays()
    rays_o = jnp.asarray(o_np, jnp.float32)
    rays_d = jnp.asarray(d_np, jnp.float32)
    near, far = near_far_from_sphere(rays_o, rays_d)

    out_j = neus.render_rays(params, rcfg, rays_o, rays_d, near, far,
                             perturb_overwrite=0.0)

    to = torch.tensor(o_np, dtype=torch.float64)
    td = torch.tensor(d_np, dtype=torch.float64)
    tnear = torch.tensor(np.asarray(near), dtype=torch.float64)
    tfar = torch.tensor(np.asarray(far), dtype=torch.float64)
    out_t = TREF.render_torch(t_sdf, t_col, inv_s, to, td, tnear, tfar,
                              rcfg.n_samples, rcfg.n_importance,
                              rcfg.up_sample_steps, relight=t_rel)

    # hierarchical z values must match (same up-sample math + det sample_pdf)
    np.testing.assert_allclose(np.asarray(out_j["weights"].shape),
                               np.asarray(out_t["weights"].shape))
    np.testing.assert_allclose(np.asarray(out_j["color_fine"]),
                               out_t["color_fine"].detach().numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(out_j["weight_sum"]),
                               out_t["weight_sum"].detach().numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(out_j["depth"]),
                               out_t["depth"].detach().numpy(), atol=1e-3)
    np.testing.assert_allclose(float(out_j["gradient_error"]),
                               float(out_t["gradient_error"]), atol=2e-4)
    if kind == "color_neus":
        np.testing.assert_allclose(np.asarray(out_j["delta_relight"]),
                                   out_t["delta_relight"].detach().numpy(), atol=2e-4)


# color_neus only: its pixel-gradient graph is a strict superset of
# neus's (adds the relight head on top of the same second-order SDF
# path), and the neus forward is covered by test_render_parity
@pytest.mark.parametrize("kind", ["color_neus"])
def test_pixel_gradient_parity(key, kind):
    """d(mean color + eikonal)/d rays_o — exercises the second-order path
    through the SDF spatial gradient in both frameworks. 2 up-sample
    rounds (the 4-round render itself is covered by test_render_parity)
    keep the CPU trace affordable."""
    import dataclasses as _dc
    rcfg, params, t_sdf, t_col, t_rel, inv_s = _build(kind, key)
    rcfg = _dc.replace(rcfg, up_sample_steps=2)
    o_np, d_np = _rays(4)
    rays_d = jnp.asarray(d_np, jnp.float32)

    def loss_j(o):
        near, far = near_far_from_sphere(o, rays_d)
        out = neus.render_rays(params, rcfg, o, rays_d, near, far,
                               perturb_overwrite=0.0)
        return jnp.mean(out["color_fine"]) + out["gradient_error"]

    g_j = np.asarray(jax.grad(loss_j)(jnp.asarray(o_np, jnp.float32)))

    to = torch.tensor(o_np, dtype=torch.float64, requires_grad=True)
    td = torch.tensor(d_np, dtype=torch.float64)
    near, far = near_far_from_sphere(jnp.asarray(o_np, jnp.float32), rays_d)
    tnear = torch.tensor(np.asarray(near), dtype=torch.float64)
    tfar = torch.tensor(np.asarray(far), dtype=torch.float64)
    out_t = TREF.render_torch(t_sdf, t_col, inv_s, to, td, tnear, tfar,
                              rcfg.n_samples, rcfg.n_importance,
                              rcfg.up_sample_steps, relight=t_rel)
    loss_t = out_t["color_fine"].mean() + out_t["gradient_error"]
    g_t = torch.autograd.grad(loss_t, to)[0].numpy()

    # f32 forward + double-backprop accumulates roundoff; compare with a
    # mixed tolerance scaled to the gradient magnitude
    scale = np.abs(g_t).max()
    np.testing.assert_allclose(g_j, g_t, atol=3e-3 * max(scale, 1.0), rtol=2e-3)
