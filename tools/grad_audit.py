"""On-TPU gradient audit of the fused backward kernel (VERDICT r1 #4).

Compares jax.grad of a composite scalar loss over the FULL render
(hierarchical sampling + core + second-order eikonal) between

  * the production fused path   (rcfg.fused_core='on': Pallas kernels,
    bf16 activation stores, bf16 MXU dots), and
  * the pure-XLA f32 oracle     (rcfg.fused_core='off')

on identical flagship-config inputs (Color-NeuS 8x256/PE6 SDF,
4x256 color, 4x256 relight, 256+256 samples/ray), and reports max
relative error and cosine similarity per parameter group as ONE JSON
line (also written to reports/grad_audit.json when WRITE_REPORT=1).

The no-grad sampling sweeps run the XLA path in BOTH variants
(fused_sdf='off') so the two gradients see identical sample positions —
the audit isolates the backward kernel, not z-jitter.

Run on the bench chip:   python tools/grad_audit.py
CI (CPU, interpret):     AUDIT_INTERPRET=1 python tools/grad_audit.py

Reference semantics audited: NeuS.py:294-408 forward + the
fields.py:105-115 double-backprop path.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _flatten(prefix, tree, out):
    if isinstance(tree, dict):
        for k, v in tree.items():
            _flatten(f"{prefix}/{k}" if prefix else k, v, out)
    else:
        out[prefix] = np.asarray(tree, np.float64)


def main():
    if os.environ.get("AUDIT_INTERPRET"):
        import jax
        jax.config.update("jax_platforms", "cpu")
    import dataclasses

    import jax
    import jax.numpy as jnp

    from color_neus_tpu.models.configs import ColorConfig, RendererConfig
    from color_neus_tpu.models import neus
    from color_neus_tpu.ops.rays import near_far_from_sphere

    n_rays = int(os.environ.get("AUDIT_N_RAYS", 512))
    interpret = bool(os.environ.get("AUDIT_INTERPRET"))
    rcfg = RendererConfig(
        kind="color_neus", n_samples=256, n_importance=256, up_sample_steps=4,
        color=ColorConfig(mode="no_view_dir", d_in=6, multires_view=0),
    )
    if interpret:
        rcfg = dataclasses.replace(rcfg, n_samples=64, n_importance=64,
                                   up_sample_steps=2)
        n_rays = min(n_rays, 32)

    params = neus.init_renderer(jax.random.PRNGKey(0), rcfg)
    ko, kd = jax.random.split(jax.random.PRNGKey(1))
    o = jax.random.normal(ko, (n_rays, 3))
    o = o / jnp.linalg.norm(o, axis=1, keepdims=True) * 1.5
    d = -o / 1.5 + 0.15 * jax.random.normal(kd, (n_rays, 3))
    d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
    near, far = near_far_from_sphere(o, d)

    def loss_fn(p, variant):
        # audit the TRAINING path (render_rays_train -> ray-march kernel
        # when variant != 'off'); the sampling sweeps stay XLA in both
        # variants so the two losses see identical sample positions
        cfg2 = dataclasses.replace(rcfg, fused_march=variant,
                                   fused_core="off", fused_sdf="off")
        out = neus.render_rays_train(p, cfg2, o, d, near, far,
                                     key=jax.random.PRNGKey(2),
                                     perturb_overwrite=0.0)
        return (jnp.mean(out["color_fine"])
                + out["gradient_error"]
                + jnp.mean(out["weight_sum"])
                + jnp.mean(out["delta_sum"]) ** 2)

    fused_variant = "interpret" if interpret else "on"
    g_fused = jax.jit(jax.grad(lambda p: loss_fn(p, fused_variant)))(params)
    g_xla = jax.jit(jax.grad(lambda p: loss_fn(p, "off")))(params)

    # ---- minibatch-noise floor: the same f32 oracle on a FRESH ray
    # batch. The kernel's rounding error only matters if it is not
    # dwarfed by the gradient's intrinsic stochasticity at this batch
    # size — cos(oracle_b1, oracle_b2) is that floor.
    ko2, kd2 = jax.random.split(jax.random.PRNGKey(11))
    o2 = jax.random.normal(ko2, (n_rays, 3))
    o2 = o2 / jnp.linalg.norm(o2, axis=1, keepdims=True) * 1.5
    d2 = -o2 / 1.5 + 0.15 * jax.random.normal(kd2, (n_rays, 3))
    d2 = d2 / jnp.linalg.norm(d2, axis=1, keepdims=True)
    near2, far2 = near_far_from_sphere(o2, d2)

    def loss_fn2(p):
        cfg2 = dataclasses.replace(rcfg, fused_march="off",
                                   fused_core="off", fused_sdf="off")
        out = neus.render_rays_train(p, cfg2, o2, d2, near2, far2,
                                     key=jax.random.PRNGKey(3),
                                     perturb_overwrite=0.0)
        return (jnp.mean(out["color_fine"])
                + out["gradient_error"]
                + jnp.mean(out["weight_sum"])
                + jnp.mean(out["delta_sum"]) ** 2)

    g_xla_b2 = jax.jit(jax.grad(loss_fn2))(params)

    ff, fx, fb2 = {}, {}, {}
    _flatten("", jax.device_get(g_fused), ff)
    _flatten("", jax.device_get(g_xla), fx)
    _flatten("", jax.device_get(g_xla_b2), fb2)

    groups = {}
    worst = {"leaf": None, "rel": 0.0}
    for name in sorted(fx):
        a, b = ff[name].ravel(), fx[name].ravel()
        nb = float(np.linalg.norm(b))
        rel = float(np.linalg.norm(a - b) / (nb + 1e-30)) if nb > 0 else \
            float(np.linalg.norm(a))
        cos = float(np.dot(a, b) / ((np.linalg.norm(a) * nb) + 1e-30)) \
            if nb > 0 else 1.0
        c = fb2[name].ravel()
        nc = float(np.linalg.norm(c))
        cos_mb = float(np.dot(b, c) / ((nb * nc) + 1e-30)) \
            if nb > 0 and nc > 0 else 1.0
        grp = name.split("/")[0]
        g = groups.setdefault(grp, {"max_rel_err": 0.0, "min_cos": 1.0,
                                    "min_minibatch_cos": 1.0})
        g["max_rel_err"] = max(g["max_rel_err"], rel)
        g["min_cos"] = min(g["min_cos"], cos)
        # the noise floor: same oracle, different ray batch
        g["min_minibatch_cos"] = min(g["min_minibatch_cos"], cos_mb)
        if rel > worst["rel"]:
            worst = {"leaf": name, "rel": rel}

    # ---- attribution for the worst leaf: where does its error live?
    # Row-wise (rows of lin0/v = PE input rows: raw xyz then sin/cos per
    # frequency), plus an UPDATE-WEIGHTED error: each row's absolute
    # error relative to the LEAF's gradient norm. A large norm-rel-err
    # confined to rows whose own gradient is ~zero contributes nothing
    # to the parameter update (VERDICT r2 #4 benignity criterion).
    attribution = None
    wname = worst["leaf"]
    if wname is not None and ff[wname].ndim == 2:
        a2, b2 = ff[wname], fx[wname]
        leaf_norm = float(np.linalg.norm(b2)) + 1e-30
        rows = []
        for r in range(a2.shape[0]):
            d = float(np.linalg.norm(a2[r] - b2[r]))
            nb_r = float(np.linalg.norm(b2[r]))
            rows.append({
                "row": r,
                "row_grad_frac": round(nb_r / leaf_norm, 6),
                "rel_err": round(d / (nb_r + 1e-30), 4),
                "err_vs_leaf": round(d / leaf_norm, 6),
            })
        rows.sort(key=lambda x: -x["rel_err"])
        weighted = float(np.linalg.norm(a2 - b2)) / leaf_norm
        attribution = {
            "leaf": wname,
            "update_weighted_err": round(weighted, 6),
            "worst_rows_by_rel_err": rows[:6],
            "note": ("rows are the PE input dims of lin0 "
                     "(raw xyz, then sin/cos per frequency); "
                     "err_vs_leaf is the row's absolute error over the "
                     "whole leaf's gradient norm"),
        }

    report = {
        "config": "color_neus 8x256/PE6 + 4x256 color + 4x256 relight",
        "samples_per_ray": rcfg.n_samples + rcfg.n_importance,
        "n_rays": n_rays,
        "fused_variant": fused_variant,
        "platform": jax.devices()[0].platform,
        "groups": {k: {kk: round(vv, 6) for kk, vv in v.items()}
                   for k, v in sorted(groups.items())},
        "worst_leaf": {"name": worst["leaf"], "rel_err": round(worst["rel"], 6)},
    }
    if attribution is not None:
        report["worst_leaf_attribution"] = attribution
    print(json.dumps(report))
    if os.environ.get("WRITE_REPORT"):
        os.makedirs("reports", exist_ok=True)
        with open("reports/grad_audit.json", "w") as f:
            json.dump(report, f, indent=1)
    return report


if __name__ == "__main__":
    main()
