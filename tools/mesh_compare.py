"""Offline mesh evaluation: chamfer distance between two PLY meshes.

Counterpart of the reference's manual compute_chamfer_distance workflow
(lib/utils/mesh_tools.py:59-70): load two meshes (prediction + GT scan),
optionally normalize, sample the vertex sets, report symmetric chamfer.

Usage:
    python tools/mesh_compare.py pred.ply gt.ply [--normalize] [--n 100000]
"""

from __future__ import annotations

import argparse

import numpy as np


def main():
    p = argparse.ArgumentParser("chamfer mesh comparison")
    p.add_argument("pred")
    p.add_argument("gt")
    p.add_argument("--normalize", action="store_true",
                   help="center + unit-scale both clouds before comparing")
    p.add_argument("--n", type=int, default=100000, help="max points per cloud")
    args = p.parse_args()

    from color_neus_tpu.ops.mesh import read_ply, normalize_point_cloud
    from color_neus_tpu.utils.metrics import chamfer_distance

    va, _, _ = read_ply(args.pred)
    vb, _, _ = read_ply(args.gt)
    rng = np.random.RandomState(0)
    if len(va) > args.n:
        va = va[rng.choice(len(va), args.n, replace=False)]
    if len(vb) > args.n:
        vb = vb[rng.choice(len(vb), args.n, replace=False)]
    if args.normalize:
        va = normalize_point_cloud(va)
        vb = normalize_point_cloud(vb)
    d = chamfer_distance(va, vb)
    print(f"chamfer({args.pred}, {args.gt}) = {d:.6e}")


if __name__ == "__main__":
    main()
