"""Mesh extraction pipeline: sharded SDF grid eval -> marching tetrahedra
-> per-vertex color query -> PLY export.

Reference counterpart: NeuS.py:14-64 (extract_fields/geometry/color) and
NeuS_Trainer.validate_mesh (279-307). TPU-first: the res^3 grid is
evaluated in fixed-size jitted chunks that stay on device until the full
grid is assembled (no per-64^3-block host sync like NeuS.py:26), and
vertex colors are queried in fixed-size batches.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from color_neus_tpu.models import fields
from color_neus_tpu.models.configs import RendererConfig
from color_neus_tpu.ops.marching_cubes import extract_geometry_from_grid


def _default_sdf_chunk_fn(params, rcfg: RendererConfig):
    try:
        on_tpu = jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        on_tpu = False
    if on_tpu:
        from color_neus_tpu.ops.pallas.sdf_mlp import make_fused_sdf_fn
        base = make_fused_sdf_fn(params["sdf"], rcfg.sdf,
                                 prec=rcfg.extract_precision)
        return lambda p: -base(p)
    return lambda p: -fields.sdf_value(params["sdf"], rcfg.sdf, p)[:, 0]


def _grid_eval_stream(params, rcfg: RendererConfig, bound_min, bound_max,
                      resolution: int, chunk: int, sdf_chunk_fn,
                      super_chunks: int, max_in_flight: int):
    """Async grid evaluation: yields (flat_offset, np.ndarray) pieces of
    -sdf in flat (x-major) index order.

    TPU-first structure (vs the reference's per-64^3-block host sync,
    NeuS.py:26):
      * grid points are generated ON DEVICE from the flat chunk start
        index (one scalar per dispatch — no [res^3, 3] host array, no
        H2D point transfers at all),
      * each dispatch evaluates `super_chunks` chunks under one
        lax.map (fewer tunnel round trips),
      * dispatches run ASYNC with a bounded in-flight window, so chunk
        k+1..k+max_in_flight compute while chunk k's result is fetched
        (the old synchronous loop paid ~30 ms of launch latency per
        chunk on the tunneled chip — ~15 s at 512^3),
      * on TPU the fused Pallas SDF kernel evaluates the MLP at
        rcfg.extract_precision ('f32' HIGHEST default; 'f32x3' ~2x
        faster at ~2^-16 relative error; 'bf16' preview).
    """
    from collections import deque

    bmin = np.asarray(bound_min, np.float32)
    bmax = np.asarray(bound_max, np.float32)
    res = resolution
    axes = [jnp.asarray(np.linspace(bmin[i], bmax[i], res, dtype=np.float32))
            for i in range(3)]

    if sdf_chunk_fn is None:
        sdf_chunk_fn = _default_sdf_chunk_fn(params, rcfg)

    n = res ** 3
    # don't over-dispatch small grids: the clamped tail would evaluate
    # up to super_chunks*chunk points for n << that (e.g. the res-64
    # quality-gate smoke is 262k points = exactly one chunk)
    K = min(super_chunks, (n + chunk - 1) // chunk)
    stride = K * chunk
    n_pad = (n + stride - 1) // stride * stride

    @jax.jit
    def eval_super(start):
        flat = start + jnp.arange(stride)
        flat = jnp.minimum(flat, n - 1)          # clamp the tail pad
        px = axes[0][flat // (res * res)]
        py = axes[1][(flat // res) % res]
        pz = axes[2][flat % res]
        p = jnp.stack([px, py, pz], axis=-1).reshape(K, chunk, 3)
        return jax.lax.map(sdf_chunk_fn, p)

    pending = deque()
    for i in range(0, n_pad, stride):
        pending.append((i, eval_super(jnp.asarray(i, jnp.int32))))
        if len(pending) >= max_in_flight:
            j, o = pending.popleft()
            yield j, np.asarray(o).reshape(-1)
    while pending:
        j, o = pending.popleft()
        yield j, np.asarray(o).reshape(-1)


def evaluate_sdf_grid(params, rcfg: RendererConfig, bound_min, bound_max,
                      resolution: int, chunk: int = 1 << 18,
                      sdf_chunk_fn=None, super_chunks: int = 4,
                      max_in_flight: int = 8) -> np.ndarray:
    """-sdf on a dense grid [res, res, res] (the reference queries -sdf,
    NeuS.py:416). See _grid_eval_stream for the dispatch structure."""
    n = resolution ** 3
    out = np.empty(n, np.float32)
    for j, piece in _grid_eval_stream(params, rcfg, bound_min, bound_max,
                                      resolution, chunk, sdf_chunk_fn,
                                      super_chunks, max_in_flight):
        out[j:min(j + piece.size, n)] = piece[:max(0, min(piece.size, n - j))]
    return out.reshape(resolution, resolution, resolution)


def extract_geometry(params, rcfg: RendererConfig, bound_min, bound_max,
                     resolution: int, threshold: float = 0.0,
                     sdf_chunk_fn=None, overlap: bool = True):
    """Dense grid + isosurface at `threshold` (NeuS.py:410-417 contract).

    overlap=True (default) runs the host marching-tetrahedra pass on
    completed x-slabs IN A WORKER THREAD while the device evaluates the
    next slabs of the grid (VERDICT r4 #4) — the ~9 s host marching at
    512^3 hides entirely under the device sweep. Slab meshes weld
    exactly: shared boundary-plane vertices are interpolated from the
    same grid values, so they are bitwise identical and np.unique merges
    them; every cube belongs to exactly one slab (cubes [x0, x1) of a
    slab owning planes [x0, x1]).
    """
    if not overlap:
        u = evaluate_sdf_grid(params, rcfg, bound_min, bound_max, resolution,
                              sdf_chunk_fn=sdf_chunk_fn)
        return extract_geometry_from_grid(u, bound_min, bound_max, threshold)

    import queue
    import threading

    from color_neus_tpu.ops.marching_cubes import marching_cubes

    res = resolution
    n = res ** 3
    plane = res * res
    u = np.empty(n, np.float32)

    jobs: "queue.Queue" = queue.Queue()
    results = []
    worker_err = []

    def _worker():
        while True:
            item = jobs.get()
            if item is None:
                return
            if worker_err:      # drain remaining jobs after a failure
                continue
            x0, x1 = item  # march cubes between planes [x0, x1] inclusive
            try:
                v, t = marching_cubes(
                    u.reshape(res, res, res)[x0:x1 + 1], threshold)
            except BaseException as e:  # re-raised on the main thread
                worker_err.append(e)
                continue
            if len(v):
                v[:, 0] += x0
                results.append((v, t))

    th = threading.Thread(target=_worker, daemon=True)
    th.start()

    filled = 0          # flat points filled so far (contiguous prefix)
    marched = 0         # first x-plane not yet handed to the worker
    for j, piece in _grid_eval_stream(params, rcfg, bound_min, bound_max,
                                      resolution, 1 << 18, sdf_chunk_fn,
                                      4, 8):
        m = max(0, min(piece.size, n - j))
        u[j:j + m] = piece[:m]
        filled = j + m
        avail = filled // plane          # planes 0..avail-1 complete
        if avail - marched >= 32 and avail < res:
            jobs.put((marched, avail - 1))
            marched = avail - 1          # re-own the boundary plane
    if marched < res - 1:
        jobs.put((marched, res - 1))
    jobs.put(None)
    th.join()
    if worker_err:
        raise worker_err[0]

    if not results:
        return (np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int64))
    # weld slab meshes: boundary-plane vertices are bitwise-equal floats
    verts = np.concatenate([v for v, _t in results], axis=0)
    off = 0
    tris = []
    for v, t in results:
        tris.append(t + off)
        off += len(v)
    tris = np.concatenate(tris, axis=0)
    vv = np.ascontiguousarray(verts)
    view = vv.view([("x", vv.dtype), ("y", vv.dtype), ("z", vv.dtype)])[:, 0]
    _uniq, first, inv = np.unique(view, return_index=True,
                                  return_inverse=True)
    verts = vv[first]
    tris = inv[tris]
    bmin = np.asarray(bound_min, np.float64)
    bmax = np.asarray(bound_max, np.float64)
    verts = verts / (res - 1.0) * (bmax - bmin)[None, :] + bmin[None, :]
    return verts.astype(np.float32), tris


def extract_vertex_colors(params, rcfg: RendererConfig, vertices: np.ndarray,
                          chunk: int = 1 << 15) -> np.ndarray:
    """Per-vertex colors: the reference passes the raw SDF gradient and
    its negation as normals/view-dirs (NeuS.py:44-64). For Color-NeuS
    (no_view_dir mode) this is exactly the view-independent global color.

    On TPU the fused point-pipeline kernel evaluates the chunk. The
    color net only sees view dirs in 'idr'/'no_normal' modes; there a
    first fused pass supplies grad so dirs = -grad feed the second —
    still far cheaper than the per-op XLA chain.
    """
    from color_neus_tpu.models.neus import _use_fused_core

    if _use_fused_core(rcfg):
        from color_neus_tpu.ops.pallas.point_pipeline import (
            resolve_dense, fused_point_pipeline)
        dense = resolve_dense(params, rcfg)
        # same resolver semantics as the training path: 'interpret'
        # runs the kernel in interpret mode instead of silently
        # compiling it (ADVICE r3)
        interp = rcfg.fused_core == "interpret"

        def chunk_fn(pts):
            dirs = jnp.zeros_like(pts)
            if rcfg.color.mode != "no_view_dir":
                _, grad, _, _, _ = fused_point_pipeline(
                    dense, rcfg, pts, dirs, interpret=interp)
                dirs = -grad
            _, _, gc, _, _ = fused_point_pipeline(
                dense, rcfg, pts, dirs, interpret=interp)
            return gc
    else:
        def chunk_fn(pts):
            sdf, feat, grad = fields.sdf_with_grad(params["sdf"], rcfg.sdf,
                                                   pts)
            return fields.color_apply(params["color"], rcfg.color, pts,
                                      grad, -grad, feat)

    n = vertices.shape[0]
    pad = (-n) % chunk
    pts = np.concatenate([vertices.astype(np.float32),
                          np.zeros((pad, 3), np.float32)], axis=0)

    @jax.jit
    def all_chunks(p):
        return jax.lax.map(chunk_fn, p.reshape(-1, chunk, 3))

    out = np.asarray(all_chunks(jnp.asarray(pts))).reshape(-1, 3)
    return out[:n]


# ---------------------------------------------------------------------------
# PLY I/O (replaces trimesh/plyfile, neither of which is available)
# ---------------------------------------------------------------------------

def write_ply(path: str, vertices: np.ndarray, triangles: np.ndarray,
              vertex_colors: np.ndarray | None = None):
    """Binary little-endian PLY with optional uchar vertex colors."""
    v = np.asarray(vertices, np.float32)
    t = np.asarray(triangles, np.int32)
    header = ["ply", "format binary_little_endian 1.0",
              f"element vertex {len(v)}",
              "property float x", "property float y", "property float z"]
    if vertex_colors is not None:
        header += ["property uchar red", "property uchar green", "property uchar blue"]
    header += [f"element face {len(t)}",
               "property list uchar int vertex_indices", "end_header"]
    with open(path, "wb") as f:
        f.write(("\n".join(header) + "\n").encode("ascii"))
        if vertex_colors is None:
            f.write(v.astype("<f4").tobytes())
        else:
            c = np.clip(np.asarray(vertex_colors) * 255.0, 0, 255).astype(np.uint8)
            rec = np.zeros(len(v), dtype=[("xyz", "<f4", 3), ("rgb", "u1", 3)])
            rec["xyz"] = v
            rec["rgb"] = c
            f.write(rec.tobytes())
        face = np.zeros(len(t), dtype=[("n", "u1"), ("idx", "<i4", 3)])
        face["n"] = 3
        face["idx"] = t
        f.write(face.tobytes())


def read_ply(path: str):
    """Read a PLY written by write_ply (binary LE, optional uchar colors).
    Returns (vertices, triangles, colors|None)."""
    with open(path, "rb") as f:
        line = f.readline().strip()
        assert line == b"ply", "not a ply file"
        n_vert = n_face = 0
        props = []
        while True:
            line = f.readline().strip().decode("ascii")
            if line == "end_header":
                break
            parts = line.split()
            if parts[0] == "element" and parts[1] == "vertex":
                n_vert = int(parts[2])
            elif parts[0] == "element" and parts[1] == "face":
                n_face = int(parts[2])
            elif parts[0] == "property" and parts[1] != "list":
                props.append(parts[2])
        has_color = "red" in props
        if has_color:
            rec = np.frombuffer(f.read(n_vert * 15),
                                dtype=[("xyz", "<f4", 3), ("rgb", "u1", 3)])
            verts = rec["xyz"].copy()
            colors = rec["rgb"].astype(np.float32) / 255.0
        else:
            verts = np.frombuffer(f.read(n_vert * 12), dtype="<f4").reshape(-1, 3).copy()
            colors = None
        face = np.frombuffer(f.read(n_face * 13), dtype=[("n", "u1"), ("idx", "<i4", 3)])
        return verts, face["idx"].copy(), colors


def normalize_point_cloud(pts: np.ndarray) -> np.ndarray:
    """Center + unit-scale (mesh_tools.py point-cloud normalize semantics)."""
    pts = np.asarray(pts, np.float32)
    center = pts.mean(axis=0)
    pts = pts - center
    scale = np.abs(pts).max()
    return pts / max(scale, 1e-12)


def write_glb(path: str, vertices: np.ndarray, triangles: np.ndarray,
              vertex_colors: np.ndarray | None = None):
    """Minimal binary glTF 2.0 export (replaces the reference's aspose-3d
    ply->glb conversion, mesh_tools.py capability)."""
    import json
    import struct

    v = np.asarray(vertices, np.float32)
    t = np.asarray(triangles, np.uint32).reshape(-1)
    buffers = [v.tobytes(), t.tobytes()]
    accessors = [
        {"bufferView": 0, "componentType": 5126, "count": len(v), "type": "VEC3",
         "min": v.min(0).tolist(), "max": v.max(0).tolist()},
        {"bufferView": 1, "componentType": 5125, "count": len(t), "type": "SCALAR"},
    ]
    attributes = {"POSITION": 0}
    if vertex_colors is not None:
        c = np.clip(np.asarray(vertex_colors, np.float32), 0, 1)
        buffers.append(c.tobytes())
        accessors.append({"bufferView": 2, "componentType": 5126,
                          "count": len(c), "type": "VEC3"})
        attributes["COLOR_0"] = 2

    views, offset = [], 0
    for b in buffers:
        views.append({"buffer": 0, "byteOffset": offset, "byteLength": len(b)})
        offset += len(b) + (-len(b)) % 4

    gltf = {
        "asset": {"version": "2.0", "generator": "color_neus_tpu"},
        "scene": 0,
        "scenes": [{"nodes": [0]}],
        "nodes": [{"mesh": 0}],
        "meshes": [{"primitives": [{"attributes": attributes, "indices": 1}]}],
        "bufferViews": views,
        "accessors": accessors,
        "buffers": [{"byteLength": offset}],
    }
    js = json.dumps(gltf).encode()
    js += b" " * ((-len(js)) % 4)
    bin_chunk = b"".join(b + b"\x00" * ((-len(b)) % 4) for b in buffers)

    with open(path, "wb") as f:
        total = 12 + 8 + len(js) + 8 + len(bin_chunk)
        f.write(struct.pack("<III", 0x46546C67, 2, total))
        f.write(struct.pack("<II", len(js), 0x4E4F534A))  # JSON chunk
        f.write(js)
        f.write(struct.pack("<II", len(bin_chunk), 0x004E4942))  # BIN chunk
        f.write(bin_chunk)
