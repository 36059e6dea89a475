"""512^3 (and 128^3) mesh-extraction wall time on the bench chip.

Replicates the round-3 measurement protocol (reports/
mesh_extraction_timing.json): geometric-init Color-NeuS renderer,
evaluate_sdf_grid at 128^3 first (pays the jit/Pallas compile), then
MET_RES (steady state), marching cubes, fused vertex colors, ALSO the
round-5 overlapped pipeline (extract_geometry overlap=True: host
marching slabs hidden under the device sweep) and the extraction
precision ladder. Prints ONE JSON line.

    python tools/mesh_extraction_timing.py             # MET_RES=512
    MET_PREC=f32x3 python tools/mesh_extraction_timing.py
"""

from __future__ import annotations

import dataclasses
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
    prec = os.environ.get("MET_PREC", "f32")
    rcfg = RendererConfig(
        kind="color_neus", extract_precision=prec,
        color=ColorConfig(mode="no_view_dir", d_in=6, multires_view=0))
    params = neus.init_renderer(jax.random.PRNGKey(3), rcfg)
    bmin = np.full(3, -1.01, np.float32)
    bmax = np.full(3, 1.01, np.float32)

    rep = {"what": f"mesh extraction wall time, extract_precision={prec}",
           "platform": jax.devices()[0].platform}

    u_ref = None
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
        # round-5: the overlapped pipeline (device sweep + threaded
        # slab marching + weld) end-to-end
        v2, t2_ = M.extract_geometry(params, rcfg, bmin, bmax, r,
                                     overlap=True)
        t4 = time.perf_counter()
        # round-5: sparse coarse-to-fine (grid + marching, active blocks
        # only; vertices bitwise equal to the dense sweep's). Run twice:
        # the first pays the res-specific jit of the coarse/fine
        # evaluators, the second is the steady state
        v3, t3_ = M.extract_geometry(params, rcfg, bmin, bmax, r,
                                     sparse=True)
        t5 = time.perf_counter()
        v3, t3_ = M.extract_geometry(params, rcfg, bmin, bmax, r,
                                     sparse=True)
        t6 = time.perf_counter()
        rep[f"res{r}"] = {
            "grid_eval_s": round(t1 - t0, 2),
            "marching_s": round(t2 - t1, 2),
            "vertex_colors_s": round(t3 - t2, 2),
            "overlapped_grid_plus_marching_s": round(t4 - t3, 2),
            "sparse_grid_plus_marching_s": round(t5 - t4, 2),
            "sparse_steady_s": round(t6 - t5, 2),
            "n_verts": int(len(verts)),
            "n_verts_overlapped": int(len(v2)),
            "n_verts_sparse": int(len(v3)),
        }
        assert np.isfinite(colors).all()
        if r == res:
            u_ref = u
    # precision-ladder error vs the measured arm's own f32 reference
    if prec != "f32":
        rcfg_f32 = dataclasses.replace(rcfg, extract_precision="f32")
        t0 = time.perf_counter()
        u_f32 = M.evaluate_sdf_grid(params, rcfg_f32, bmin, bmax, res)
        t1 = time.perf_counter()
        rep["f32_reference"] = {
            "grid_eval_s": round(t1 - t0, 2),
            "max_abs_sdf_err_vs_f32": float(np.abs(u_ref - u_f32).max()),
            "voxel": float((bmax[0] - bmin[0]) / (res - 1)),
        }
    rep[f"res{128}"]["note"] = "includes jit/Pallas compile"
    print(json.dumps(rep))


if __name__ == "__main__":
    main()
