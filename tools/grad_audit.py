"""On-device gradient audit of the fused Pallas backward kernel.

Compares parameter gradients of the production path (fused point-pipeline
kernels, bf16 activation storage in the hand-written second-order VJP)
against the plain XLA f32 path on IDENTICAL inputs at the flagship
Color-NeuS config (SDF 8x256 PE6, 64+64x4 hierarchical sampling), through
the REAL training loss (rgb MSE + eikonal + mask BCE + relight zero-mean
— NeuS_Trainer.py:129-171 semantics).

Prints one JSON object with per-parameter-group max relative error and
writes it to GRAD_AUDIT.json. Run on the TPU (the fused path does not
exist elsewhere):

    python tools/grad_audit.py            # full bench-shape audit
    GRAD_AUDIT_RAYS=256 python tools/grad_audit.py
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def tree_group_errors(g_ref, g_fused):
    """Per top-level param group: max |fused - ref| / scale, where scale is
    the max |ref| of the group (relative-to-group-scale error)."""
    import jax

    report = {}
    for group in g_ref:
        ref_leaves = jax.tree_util.tree_leaves(g_ref[group])
        fus_leaves = jax.tree_util.tree_leaves(g_fused[group])
        scale = max(max(float(abs(l).max()) for l in ref_leaves), 1e-12)
        max_abs = max(float(abs(a - b).max())
                      for a, b in zip(fus_leaves, ref_leaves))
        report[group] = {
            "ref_scale": scale,
            "max_abs_err": max_abs,
            "max_rel_err": max_abs / scale,
        }
    return report


def main():
    import jax
    import jax.numpy as jnp
    import dataclasses
    from color_neus_tpu.models.configs import RendererConfig, ColorConfig
    from color_neus_tpu.models import neus
    from color_neus_tpu.ops.rays import near_far_from_sphere

    n_rays = int(os.environ.get("GRAD_AUDIT_RAYS", 512))

    base = RendererConfig(
        kind="color_neus",
        n_samples=64, n_importance=64, up_sample_steps=4,
        color=ColorConfig(mode="no_view_dir", d_in=6, multires_view=0),
    )
    plain = dataclasses.replace(base, fused_sdf="off", fused_core="off")
    fused = dataclasses.replace(base, fused_sdf="on", fused_core="on")

    params = neus.init_renderer(jax.random.PRNGKey(3), base)

    rng = np.random.RandomState(0)
    d = rng.randn(n_rays, 3)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    o = (-2.4 * d + 0.1 * rng.randn(n_rays, 3)).astype(np.float32)
    rays_o = jnp.asarray(o)
    rays_d = jnp.asarray(d, jnp.float32)
    near, far = near_far_from_sphere(rays_o, rays_d)
    rgb_gt = jnp.asarray(rng.rand(n_rays, 3), jnp.float32)
    mask = jnp.asarray((rng.rand(n_rays) > 0.4), jnp.float32)

    def loss_fn(params, rcfg):
        out = neus.render_rays(params, rcfg, rays_o, rays_d, near, far,
                               perturb_overwrite=0.0)
        rgb = jnp.mean((out["color_fine"] - rgb_gt) ** 2)
        eik = out["gradient_error"]
        ws = jnp.clip(out["weight_sum"].squeeze(-1), 1e-3, 1 - 1e-3)
        m = -jnp.mean(mask * jnp.log(ws) + (1 - mask) * jnp.log(1 - ws))
        rel = jnp.mean(out["delta_relight"] * mask[:, None, None]) ** 2
        return rgb + 0.1 * eik + 0.1 * m + rel

    g_plain = jax.jit(jax.grad(lambda p: loss_fn(p, plain)))(params)
    g_fused = jax.jit(jax.grad(lambda p: loss_fn(p, fused)))(params)
    g_plain = jax.tree_util.tree_map(np.asarray, g_plain)
    g_fused = jax.tree_util.tree_map(np.asarray, g_fused)

    report = {
        "workload": f"{n_rays} rays x 128 samples, flagship Color-NeuS, "
                    "real training loss",
        "platform": jax.devices()[0].platform,
        "device": str(jax.devices()[0]),
        "groups": tree_group_errors(g_plain, g_fused),
    }
    report["max_rel_err_overall"] = max(
        g["max_rel_err"] for g in report["groups"].values())
    out_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "GRAD_AUDIT.json")
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
