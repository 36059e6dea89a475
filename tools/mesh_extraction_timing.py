"""512^3 (and 128^3) mesh-extraction wall time on the bench chip.

Replicates the round-3 measurement protocol (reports/
mesh_extraction_timing.json): geometric-init Color-NeuS renderer,
evaluate_sdf_grid at 128^3 first (pays the jit/Pallas compile), then
512^3 (steady state), marching cubes, fused vertex colors. Prints ONE
JSON line. Round-4 context: the grid-eval kernel's dots now run
Precision.HIGHEST (true f32 — see sdf_mlp._sdf_layers); this tool
measures what that costs (expected: little — the grid eval is
sin/cos + softplus VPU-bound, not MXU-bound).

    python tools/mesh_extraction_timing.py        # MET_RES=512 default
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    from color_neus_tpu.models.configs import RendererConfig, ColorConfig
    from color_neus_tpu.models import neus
    from color_neus_tpu.ops import mesh as M
    from color_neus_tpu.ops.marching_cubes import marching_cubes

    res = int(os.environ.get("MET_RES", 512))
    rcfg = RendererConfig(
        kind="color_neus",
        color=ColorConfig(mode="no_view_dir", d_in=6, multires_view=0))
    params = neus.init_renderer(jax.random.PRNGKey(3), rcfg)
    bmin = np.full(3, -1.01, np.float32)
    bmax = np.full(3, 1.01, np.float32)

    rep = {"what": "mesh extraction wall time, true-f32 grid eval "
                   "(Precision.HIGHEST dots)",
           "platform": jax.devices()[0].platform}

    for r in (128, res):
        t0 = time.perf_counter()
        u = M.evaluate_sdf_grid(params, rcfg, bmin, bmax, r)
        t1 = time.perf_counter()
        verts, tris = marching_cubes(u, 0.0)
        t2 = time.perf_counter()
        # grid-index -> world coords (the evaluation.py convention)
        vw = (verts / (r - 1.0) * (bmax - bmin) + bmin).astype(np.float32)
        colors = M.extract_vertex_colors(params, rcfg, vw)
        t3 = time.perf_counter()
        rep[f"res{r}"] = {
            "grid_eval_s": round(t1 - t0, 2),
            "marching_s": round(t2 - t1, 2),
            "vertex_colors_s": round(t3 - t2, 2),
            "n_verts": int(len(verts)),
        }
        assert np.isfinite(colors).all()
    rep[f"res{128}"]["note"] = "includes jit/Pallas compile"
    print(json.dumps(rep))


if __name__ == "__main__":
    main()
