"""Golden-activation parity vs the ACTUAL reference code.

Imports /root/reference/lib (PyTorch, CPU) through the dependency shims
in tools/_ref_shims.py, injects IDENTICAL dense weights into the real
``NeuS`` / ``Color_NeuS`` renderers
(/root/reference/lib/models/renderers/NeuS.py:294-408, fields.py:105-115)
and into our JAX renderer, feeds both the same rays at the FLAGSHIP
config (SDF 8x256 PE6 skip(4,), 64+64x4 hierarchical samples — the
config/Color_NeuS_dtu.yml shape), and asserts allclose on:

  * color_fine, weight_sum, depth, s_val
  * gradient_error (the second-order eikonal term)
  * global_color / delta_relight (Color-NeuS)
  * pixel input-gradients d sum(color_fine) / d rays_o  (autograd vs
    jax.grad — exercises the full double-backprop path)

This is the SURVEY §7.2-step-3 gate: if any SURVEY-transcribed formula
were wrong, our renderer and the independently written torch oracle
(tests/torch_ref.py) would drift together — this test pins us to the
reference itself.

Marked slow: the reference forward at the flagship config on CPU takes
~30-60 s per renderer.
"""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REF = "/root/reference"
TOOLS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "tools")

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def ref_renderers():
    """Import the actual reference renderer classes (CPU torch)."""
    if TOOLS not in sys.path:
        sys.path.insert(0, TOOLS)
    import _ref_shims
    _ref_shims.install()
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from lib.models.renderers.NeuS import NeuS           # noqa: E402
    from lib.models.renderers.Color_NeuS import Color_NeuS  # noqa: E402
    from _ref_shims import CfgNode
    return NeuS, Color_NeuS, CfgNode


def _flagship_rcfg_dict(kind: str) -> dict:
    """The RENDERER section of config/Color_NeuS_dtu.yml / NeuS_dtu.yml,
    with PERTURB 0 so both sides are deterministic."""
    d = {
        "TYPE": "Color_NeuS" if kind == "color_neus" else "NeuS",
        "N_SAMPLES": 64, "N_IMPORTANCE": 64, "N_OUTSIDE": 0,
        "UP_SAMPLE_STEPS": 4, "PERTURB": 0.0,
        "SDF": {"D_OUT": 257, "D_IN": 3, "D_HIDDEN": 256, "N_LAYERS": 8,
                "SKIP_IN": [4], "MULTIRES": 6, "BIAS": 0.5, "SCALE": 3.0,
                "GEOMETRIC_INIT": True, "WEIGHT_NORM": True},
        "DEVIATION": {"INIT_VAL": 0.3},
    }
    if kind == "color_neus":
        d["COLOR"] = {"D_FEATURE": 256, "MODE": "no_view_dir", "D_IN": 6,
                      "D_OUT": 3, "D_HIDDEN": 256, "N_LAYERS": 4,
                      "WEIGHT_NORM": True, "MULTIRES_VIEW": 0,
                      "SQUEEZE_OUT": True}
        d["RELIGHT"] = {"D_IN": 6, "D_OUT": 3, "D_HIDDEN": 256, "N_LAYERS": 4,
                        "Y_IN_LAYER": 3, "MULTIRES_VIEW": 4,
                        "INCLUDE_GRAD": True, "INV_SIGMOID": True}
    else:
        d["COLOR"] = {"D_FEATURE": 256, "MODE": "idr", "D_IN": 9,
                      "D_OUT": 3, "D_HIDDEN": 256, "N_LAYERS": 4,
                      "WEIGHT_NORM": True, "MULTIRES_VIEW": 4,
                      "SQUEEZE_OUT": True}
    return d


def _inject_state(ref_model, params, rcfg):
    """Copy our JAX param pytree into the torch reference model, exactly."""
    import torch

    sd = {}

    def t(x):
        return torch.from_numpy(np.array(x, np.float32, copy=True))

    for l in range(rcfg.sdf.n_layers + 1):
        p = params["sdf"][f"lin{l}"]
        sd[f"sdf_network.lin{l}.weight_v"] = t(p["v"])
        sd[f"sdf_network.lin{l}.weight_g"] = t(p["g"]).reshape(-1, 1)
        sd[f"sdf_network.lin{l}.bias"] = t(p["b"])
    for l in range(rcfg.color.n_layers + 1):
        p = params["color"][f"lin{l}"]
        sd[f"color_network.lin{l}.weight_v"] = t(p["v"])
        sd[f"color_network.lin{l}.weight_g"] = t(p["g"]).reshape(-1, 1)
        sd[f"color_network.lin{l}.bias"] = t(p["b"])
    sd["deviation_network.variance"] = t(params["variance"]["variance"]).reshape(())
    if "relight" in params:
        rl = params["relight"]
        sd["relight_network.in_layer.weight"] = t(rl["in_layer"]["w"])
        sd["relight_network.in_layer.bias"] = t(rl["in_layer"]["b"])
        for i in range(rcfg.relight.n_layers):
            sd[f"relight_network.rl_mlp.{i}.weight"] = t(rl[f"mlp{i}"]["w"])
            sd[f"relight_network.rl_mlp.{i}.bias"] = t(rl[f"mlp{i}"]["b"])
    ref_model.load_state_dict(sd, strict=True)
    return ref_model


def _rays(n=24, seed=3):
    rng = np.random.RandomState(seed)
    d = rng.randn(n, 3)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    o = (-2.4 * d + 0.1 * rng.randn(n, 3)).astype(np.float32)
    return o, d.astype(np.float32)


@pytest.mark.parametrize("kind", ["color_neus", "neus"])
def test_flagship_render_and_pixel_grads_match_reference(ref_renderers, kind):
    import torch
    from color_neus_tpu.models.configs import renderer_config_from_cfg
    from color_neus_tpu.models import neus as our_neus
    from color_neus_tpu.ops.rays import near_far_from_sphere

    NeuS, Color_NeuS, CfgNode = ref_renderers
    rdict = _flagship_rcfg_dict(kind)
    rcfg = renderer_config_from_cfg(rdict)
    # plain XLA path, f32 matmuls: this test pins the MATH, not the kernels
    import dataclasses
    rcfg = dataclasses.replace(rcfg, fused_sdf="off", fused_core="off")

    params = our_neus.init_renderer(jax.random.PRNGKey(11), rcfg)

    torch.manual_seed(0)
    cls = Color_NeuS if kind == "color_neus" else NeuS
    ref = cls(CfgNode(rdict))
    _inject_state(ref, params, rcfg)
    ref.eval()

    o_np, d_np = _rays()
    near_np = None

    # ---- reference forward + pixel gradients ----
    rays_o_t = torch.from_numpy(o_np).requires_grad_(True)
    rays_d_t = torch.from_numpy(d_np)
    near_t, far_t = None, None
    # near_far_from_sphere semantics (ray_utils.py:7-13)
    a = torch.sum(rays_d_t ** 2, dim=-1, keepdim=True)
    b = 2.0 * torch.sum(rays_o_t.detach() * rays_d_t, dim=-1, keepdim=True)
    mid = 0.5 * (-b) / a
    near_t, far_t = mid - 1.0, mid + 1.0

    # the reference passes near/far squeezed to [n] (ray_utils.py:13)
    out_ref = ref(rays_o_t, rays_d_t, near_t.squeeze(-1), far_t.squeeze(-1),
                  perturb_overwrite=0)
    ref_color = out_ref["color_fine"]
    g_ref = torch.autograd.grad(ref_color.sum(), rays_o_t, retain_graph=False)[0]

    # ---- ours ----
    o_j = jnp.asarray(o_np)
    d_j = jnp.asarray(d_np)
    near_j, far_j = near_far_from_sphere(jax.lax.stop_gradient(o_j), d_j)

    with jax.default_matmul_precision("highest"):
        out_our = our_neus.render_rays(params, rcfg, o_j, d_j, near_j, far_j,
                                       perturb_overwrite=0.0)

        def color_sum(o):
            near, far = near_far_from_sphere(jax.lax.stop_gradient(o), d_j)
            out = our_neus.render_rays(params, rcfg, o, d_j, near, far,
                                       perturb_overwrite=0.0)
            return jnp.sum(out["color_fine"])

        g_our = jax.grad(color_sum)(o_j)

    def close(name, ours, theirs, atol, rtol=1e-4):
        a = np.asarray(ours).reshape(-1)
        b = theirs.detach().numpy().reshape(-1)
        np.testing.assert_allclose(a, b, atol=atol, rtol=rtol, err_msg=name)

    close("color_fine", out_our["color_fine"], out_ref["color_fine"], 2e-4)
    close("weight_sum", out_our["weight_sum"], out_ref["weight_sum"], 2e-4)
    close("depth", out_our["depth"], out_ref["depth"], 5e-4)
    close("s_val", out_our["s_val"], out_ref["s_val"], 1e-5)
    close("gradient_error", out_our["gradient_error"], out_ref["gradient_error"],
          1e-4, rtol=1e-3)
    if kind == "color_neus":
        close("global_color", out_our["global_color"], out_ref["global_color"], 2e-4)
        close("delta_relight", out_our["delta_relight"],
              out_ref["delta_relight"].reshape(*out_our["delta_relight"].shape), 2e-4)

    scale = max(float(np.abs(g_ref.numpy()).max()), 1e-3)
    np.testing.assert_allclose(np.asarray(g_our), g_ref.numpy(),
                               atol=2e-3 * scale, rtol=0.02,
                               err_msg="pixel input-gradients d color / d rays_o")


def test_sdf_network_activations_match_reference(ref_renderers):
    """Layer-0 check at the field level: raw SDF + autograd gradient of the
    real SDFNetwork vs ours, same weights (fields.py:81-115)."""
    import torch
    from color_neus_tpu.models.configs import renderer_config_from_cfg
    from color_neus_tpu.models import neus as our_neus, fields

    NeuS, _, CfgNode = ref_renderers
    rdict = _flagship_rcfg_dict("neus")
    rcfg = renderer_config_from_cfg(rdict)
    params = our_neus.init_renderer(jax.random.PRNGKey(5), rcfg)

    torch.manual_seed(0)
    ref = NeuS(CfgNode(rdict))
    _inject_state(ref, params, rcfg)

    rng = np.random.RandomState(7)
    pts = (rng.randn(257, 3) * 0.5).astype(np.float32)

    out_t = ref.sdf_network(torch.from_numpy(pts))
    grad_t = ref.sdf_network.gradient(torch.from_numpy(pts)).squeeze(1)

    with jax.default_matmul_precision("highest"):
        sdf_j, feat_j, grad_j = fields.sdf_with_grad(params["sdf"], rcfg.sdf,
                                                     jnp.asarray(pts))

    np.testing.assert_allclose(np.asarray(sdf_j), out_t[:, :1].detach().numpy(),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(feat_j), out_t[:, 1:].detach().numpy(),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(grad_j), grad_t.detach().numpy(),
                               atol=5e-5, rtol=1e-4)
