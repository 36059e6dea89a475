"""Trained-quality regression gate (VERDICT r1 #5): one command, one JSON.

Trains the flagship Color-NeuS model on the analytic-sphere synthetic
dataset for QG_STEPS steps (default 1000) on whatever platform JAX
selects (the bench TPU in the bench environment; CPU in CI with
QG_STEPS lowered), then:

  * renders a held-out view and computes PSNR/SSIM vs the analytic GT,
  * extracts the mesh at QG_RES^3 (default 128) and measures the mean /
    p95 absolute radial error of the vertices against the true sphere
    (radius 0.5 — a chamfer-to-analytic-surface distance),

and prints ONE JSON line with a pass/fail verdict.

    python tools/quality_gate.py
    QG_STEPS=200 QG_RES=64 QG_CPU=1 python tools/quality_gate.py   # smoke

Thresholds (QG_STEPS>=1000): PSNR >= 30 dB, radial error mean <= 0.03.
Justified by the measured A/B at identical settings on the bench v5e
(reports/quality_gate_ab.json): all-f32 XLA path 36.14 dB / 0.0206,
fused bf16 kernels 35.61 dB / 0.0200, round-1 code 34.14 dB / 0.0197.
(A round-1 ad-hoc figure of 41.2 dB was not reproducible under this
protocol and is retired.) Set QG_FUSED=on/off to force the kernel path
for A/B runs. Reference equivalent: the eyeballed validate_image /
validate_mesh loop of NeuS_Trainer.py:216-307.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    steps = int(os.environ.get("QG_STEPS", 1000))
    res = int(os.environ.get("QG_RES", 128))
    if os.environ.get("QG_CPU"):
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax

    from color_neus_tpu.utils.config import get_config
    from color_neus_tpu.runtime import TrainLoop
    from color_neus_tpu.models import trainer as TR
    from color_neus_tpu.utils.metrics import mse2psnr, ssim as ssim_fn

    class _A:  # minimal arg shim for get_config overrides
        batch_size = None
        reload = None
        obj_id = None
        iterations = steps
        data_root = None

    # QG_SCENE=blob runs the textured non-convex CSG scene (VERDICT r4
    # #6) with its own mesh metric (|analytic sdf| at the vertices).
    scene = os.environ.get("QG_SCENE", "sphere")
    cfg_path = ("config/Color_NeuS_synthetic_blob.yml" if scene == "blob"
                else "config/Color_NeuS_synthetic.yml")
    cfg = get_config(cfg_path, _A())
    # viz/mesh validation cadence: the synthetic config's 250-step
    # default makes the 5k/20k gate arms mesh-extraction-bound (~10x
    # the train time). The gate's own metrics come from its FINAL
    # render+mesh below; mid-run viz is progress logging only, so the
    # long arms raise it (QG_VIZ_EVERY overrides; same value in every
    # arm of a comparison so validation key draws stay identical).
    viz_every = int(os.environ.get("QG_VIZ_EVERY", max(250, steps // 4)))
    # QG_SEED: train under a different MANUAL_SEED. A same-config,
    # different-seed arm gives the TRAJECTORY-NOISE floor for reading
    # fused-vs-off PSNR gaps — at the ~50 dB saturation these arms reach
    # by 5k steps, seed variance alone moves PSNR by >1 dB (same
    # self-calibration philosophy as tools/grad_audit.py's cross-batch
    # floor).
    seed = int(os.environ.get("QG_SEED", 0))
    cfg = cfg.thaw_copy()
    if seed:
        cfg["TRAIN"]["MANUAL_SEED"] = seed
    cfg["TRAIN"]["VIZ_IMAGE_INTERVAL"] = viz_every
    cfg["TRAIN"]["VIZ_MESH_INTERVAL"] = viz_every
    cfg["TRAIN"]["SAVE_INTERVAL"] = max(int(cfg["TRAIN"]["SAVE_INTERVAL"]),
                                        steps)
    cfg.freeze()
    fused = os.environ.get("QG_FUSED", "")  # '' = config default (auto)
    prec = os.environ.get("QG_PREC", "")    # march_bwd_precision A/B
    sweep_act = os.environ.get("QG_SWEEP_ACT", "")  # sweep_activation A/B
    sweep_dt = os.environ.get("QG_SWEEP_DTYPE", "")  # sweep_dtype A/B
    if fused or prec or sweep_act or sweep_dt:
        cfg = cfg.thaw_copy()
        r = cfg["MODEL"]["RENDERER"]
        if fused:
            for k in ("FUSED_MARCH", "FUSED_CORE", "FUSED_SDF"):
                r[k] = fused
        if prec:
            r["MARCH_BWD_PRECISION"] = prec
        if sweep_act:
            r["SWEEP_ACTIVATION"] = sweep_act
        if sweep_dt:
            r["SWEEP_DTYPE"] = sweep_dt
        cfg.freeze()
    # QG_MATMUL=highest: run the WHOLE arm under true-f32 XLA matmuls.
    # TPU's default f32 matmul rounds operands to bf16 (single MXU
    # pass), so the plain QG_FUSED=off arm is an "XLA default-precision"
    # baseline, NOT a true-f32 oracle; this knob provides the latter.
    matmul = os.environ.get("QG_MATMUL", "")
    if matmul:
        # whole-process scope (train + render + mesh): entered and never
        # exited on purpose — the tool prints one verdict and exits
        jax.default_matmul_precision(matmul).__enter__()
    tag = "_".join(x for x in (fused or "auto", prec, sweep_act, sweep_dt,
                               matmul, f"s{seed}" if seed else "") if x)
    loop = TrainLoop(cfg, exp_id=f"quality_gate_{steps}_{tag}",
                     require_clean_git=False)
    loop.run()

    # held-out view: camera 0, deterministic key
    if loop._chunk_fn is None:
        loop._chunk_fn = TR.make_render_image_fn(loop.tcfg)
    rgb, _depth = TR.render_image(loop.state["params"], loop.scene, loop.tcfg,
                                  0, loop.H, loop.W, jax.random.PRNGKey(7),
                                  chunk_fn=loop._chunk_fn)
    gt = np.asarray(loop.images[0])
    rgbc = np.clip(rgb, 0, 1)
    p = float(mse2psnr(float(np.mean((rgbc - gt) ** 2))))
    s = float(ssim_fn(jax.numpy.asarray(rgbc), jax.numpy.asarray(gt)))

    out = loop.validate_mesh(steps, resolution=res, world_space=True)
    if out is None:
        verdict = {"psnr": round(p, 2), "ssim": round(s, 4), "mesh": "EMPTY",
                   "pass": False}
        print(json.dumps(verdict))
        return verdict
    verts, tris, _colors = out
    if scene == "blob":
        # surface error = |analytic CSG sdf| at the extracted vertices
        # (exact outside, conservative across the union seams)
        from color_neus_tpu.data.synthetic import blob_sdf
        rad_err = np.abs(blob_sdf(verts))
    else:
        r = np.linalg.norm(verts, axis=1)
        rad_err = np.abs(r - 0.5)
    mean_err = float(rad_err.mean())
    p95_err = float(np.percentile(rad_err, 95))

    # thresholds calibrated at the gate's OWN settings (VERDICT r3 #5):
    #   200 steps @ 64^3 on the bench v5e (round-4 code, fused auto):
    #     psnr 32.26, radial_err_mean 0.0246
    #     (reports/tpu_gates_r4/quality_short.json)
    #   1000 steps @ 128^3: fused 35.61 / f32-XLA 36.14, radial ~0.020
    #     (reports/quality_gate_ab.json)
    # margins: ~1.6 dB PSNR, ~30% radial — tight enough that a one-line
    # numeric sabotage (e.g. an f32 stash lane dropped to bf16) fails.
    if scene == "blob":
        # blob thresholds: CALIBRATED on the bench v5e round 5 —
        # measured at 1k steps: fused 34.40 dB / 0.01424 surface err,
        # off 34.40 / 0.01417 (reports/r5/qg_blob_fused.json,
        # qg_blob_off.json) — margins mirror the sphere's (~1.9 dB
        # PSNR, ~35% surface error)
        gate_psnr = 32.5 if steps >= 1000 else 26.0
        gate_err = 0.019 if steps >= 1000 else 0.025
    else:
        gate_psnr = 34.0 if steps >= 1000 else 30.5
        gate_err = 0.027 if steps >= 1000 else 0.033
    # report the RESOLVED renderer config, not the env-var fallbacks
    # (ADVICE r4: with QG_PREC unset the run trains at the config
    # default — e.g. f32stash — and the artifact must say so)
    rr = loop.tcfg.renderer
    verdict = {
        "steps": steps, "resolution": res, "scene": scene,
        "seed": seed or 1,
        "fused": fused or "auto",
        "march_bwd_precision": rr.march_bwd_precision,
        "thin_dots": rr.thin_dots,
        "sweep_activation": rr.sweep_activation,
        "sweep_dtype": rr.sweep_dtype,
        "matmul_precision": matmul or "default",
        "platform": jax.devices()[0].platform,
        "psnr": round(p, 2), "ssim": round(s, 4),
        "n_verts": int(len(verts)), "n_tris": int(len(tris)),
        "radial_err_mean": round(mean_err, 5),
        "radial_err_p95": round(p95_err, 5),
        "gates": {"psnr_min": gate_psnr, "radial_err_mean_max": gate_err},
        "pass": bool(p >= gate_psnr and mean_err <= gate_err),
    }
    print(json.dumps(verdict))
    if os.environ.get("WRITE_REPORT"):
        os.makedirs("reports", exist_ok=True)
        with open("reports/quality_gate.json", "w") as f:
            json.dump(verdict, f, indent=1)
    return verdict


if __name__ == "__main__":
    main()
