"""On-chip equality gate for the fused eval paths (VERDICT r2 #8).

Compares, on the real TPU:
  * extract_vertex_colors with the fused point-pipeline kernel
    (fused_core='auto' -> on) vs the plain-XLA chunk fn
    (fused_core='off'), in both color modes ('no_view_dir' = one pass,
    'idr' = two-pass grad->dirs), and
  * evaluate_sdf_grid's fused f32 Pallas SDF evaluator vs the XLA
    fields.sdf_value path,
then prints ONE JSON line {"pass": bool, ...}. Reference surface:
NeuS.py:26-64 (validate_mesh / vertex colors).

    python tools/tpu_eval_fused_check.py
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    from color_neus_tpu.models.configs import RendererConfig, ColorConfig
    from color_neus_tpu.models import neus, fields
    from color_neus_tpu.ops import mesh as M

    rep = {"platform": jax.devices()[0].platform, "checks": {}}
    ok = True

    rng = np.random.RandomState(0)
    verts = (rng.randn(5000, 3) * 0.3).astype(np.float32)

    for mode, d_in, mrv in (("no_view_dir", 6, 0), ("idr", 9, 4)):
        rcfg = RendererConfig(
            kind="color_neus" if mode == "no_view_dir" else "neus",
            color=ColorConfig(mode=mode, d_in=d_in, multires_view=mrv))
        params = neus.init_renderer(jax.random.PRNGKey(3), rcfg)
        fused = M.extract_vertex_colors(params, rcfg, verts)
        off = M.extract_vertex_colors(
            params, dataclasses.replace(rcfg, fused_core="off"), verts)
        err = float(np.abs(fused - off).max())
        # bf16 kernel dots vs f32 XLA on a sigmoid output: loose bound
        rep["checks"][f"vertex_colors_{mode}_max_abs_err"] = round(err, 5)
        ok &= err < 5e-2 and np.isfinite(fused).all()

    rcfg = RendererConfig(
        kind="color_neus",
        color=ColorConfig(mode="no_view_dir", d_in=6, multires_view=0))
    params = neus.init_renderer(jax.random.PRNGKey(3), rcfg)
    bmin, bmax = np.full(3, -1.01, np.float32), np.full(3, 1.01, np.float32)
    grid_f = M.evaluate_sdf_grid(params, rcfg, bmin, bmax, 64)

    # the XLA oracle must run true-f32 dots: TPU's DEFAULT f32 matmul
    # precision is a single bf16 pass (~1e-2 abs error on this grid —
    # the fields.py:16-18 contract the first on-chip run of this gate
    # caught being violated here); the Pallas kernel's dots are real f32
    def xla_chunk(p):
        with jax.default_matmul_precision("highest"):
            return -fields.sdf_value(params["sdf"], rcfg.sdf, p)[:, 0]

    grid_x = M.evaluate_sdf_grid(params, rcfg, bmin, bmax, 64,
                                 sdf_chunk_fn=jax.jit(xla_chunk))
    err = float(np.abs(grid_f - grid_x).max())
    rep["checks"]["sdf_grid_max_abs_err"] = round(err, 6)
    # both paths now f32; only fma/fusion reassociation differs
    ok &= err < 1e-4

    rep["pass"] = bool(ok)
    print(json.dumps(rep))


if __name__ == "__main__":
    main()
