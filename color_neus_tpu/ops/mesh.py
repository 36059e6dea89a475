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


def _sdf_points(params, rcfg: RendererConfig, pts):
    """-sdf at pts with TRACED params (fused Pallas kernel on TPU, plain
    fields otherwise). Called inside the module-level jitted workers
    below — the platform/extract_precision branch resolves at trace
    time (rcfg is a static argument)."""
    try:
        on_tpu = jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        on_tpu = False
    if on_tpu:
        from color_neus_tpu.ops.pallas.sdf_mlp import make_fused_sdf_fn
        return -make_fused_sdf_fn(params["sdf"], rcfg.sdf,
                                  prec=rcfg.extract_precision)(pts)
    return -fields.sdf_value(params["sdf"], rcfg.sdf, pts)[:, 0]


def _default_sdf_chunk_fn(params, rcfg: RendererConfig):
    return lambda p: _sdf_points(params, rcfg, p)


# Module-level jitted workers: `params` is an ARGUMENT, not a closure
# constant. A per-call closure would retrace (and re-link the Pallas
# kernels) on every extraction — ~5-15 s per validate_mesh call on the
# tunneled chip, paid at every viz interval of a training run. With
# params as a pytree argument the trace caches on (rcfg, shapes) and a
# repeat extraction costs only the dispatches. `axes` are the host-side
# np.linspace grids passed in as arrays so every caller (dense stream,
# sparse coarse/fine, custom-chunk paths) interpolates the bitwise-same
# lattice.

from functools import partial as _partial


@_partial(jax.jit, static_argnames=("rcfg", "res", "K", "chunk"))
def _eval_super_jit(params, axes, start, *, rcfg, res, K, chunk):
    n = res ** 3
    flat = start + jnp.arange(K * chunk)
    flat = jnp.minimum(flat, n - 1)              # clamp the tail pad
    px = axes[0][flat // (res * res)]
    py = axes[1][(flat // res) % res]
    pz = axes[2][flat % res]
    p = jnp.stack([px, py, pz], axis=-1).reshape(K, chunk, 3)
    return jax.lax.map(lambda q: _sdf_points(params, rcfg, q), p)


@_partial(jax.jit, static_argnames=("rcfg",))
def _eval_points_jit(params, pts, *, rcfg):
    return _sdf_points(params, rcfg, pts)


@_partial(jax.jit, static_argnames=("rcfg", "nb", "f"))
def _eval_blocks_jit(params, axes, bid, *, rcfg, nb, f):
    offs = np.stack(np.meshgrid(np.arange(f), np.arange(f), np.arange(f),
                                indexing="ij"), -1).reshape(-1, 3)
    bx = bid // (nb * nb)
    by = (bid // nb) % nb
    bz = bid % nb
    base = jnp.stack([bx, by, bz], -1).astype(jnp.int32) * f
    idx = base[:, None, :] + jnp.asarray(offs, jnp.int32)[None]
    p = jnp.stack([axes[0][idx[..., 0]], axes[1][idx[..., 1]],
                   axes[2][idx[..., 2]]], -1)
    return _sdf_points(params, rcfg, p.reshape(-1, 3)).reshape(
        bid.shape[0], f ** 3)


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
    axes = tuple(jnp.asarray(np.linspace(bmin[i], bmax[i], res,
                                         dtype=np.float32))
                 for i in range(3))

    n = res ** 3
    # don't over-dispatch small grids: the clamped tail would evaluate
    # up to super_chunks*chunk points for n << that (e.g. the res-64
    # quality-gate smoke is 262k points = exactly one chunk)
    K = min(super_chunks, (n + chunk - 1) // chunk)
    stride = K * chunk
    n_pad = (n + stride - 1) // stride * stride

    if sdf_chunk_fn is None:
        # cached module-level worker (no per-call retrace)
        def eval_super(start):
            return _eval_super_jit(params, axes, start, rcfg=rcfg, res=res,
                                   K=K, chunk=chunk)
    else:
        @jax.jit
        def eval_super(start):
            flat = start + jnp.arange(stride)
            flat = jnp.minimum(flat, n - 1)      # clamp the tail pad
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


def evaluate_sdf_grid_sparse(params, rcfg: RendererConfig, bound_min,
                             bound_max, resolution: int,
                             factor: int | None = None,
                             safety: float = 2.0, sdf_chunk_fn=None,
                             chunk_blocks: int = 512,
                             return_active: bool = False,
                             level: float = 0.0):
    """Coarse-to-fine -sdf grid: only fine voxels near the surface are
    evaluated (the idiomatic fix for the dense 512^3 sweep, VERDICT r4
    #4 — a dense sweep spends >95% of its FLOPs on voxels marching
    cubes never reads).

    Soundness: an eikonal-trained SDF is ~1-Lipschitz in world units, so
    a zero crossing inside a factor^3 block forces some block corner to
    satisfy |sdf| <= diag/2 (the block center is the farthest interior
    point from its nearest corner). A block is ACTIVE when its coarse
    min-|sdf| <= safety * diag/2 (safety=2 covers learned-SDF Lipschitz
    slack; the eikonal loss bounds |grad| near 1 inside the 1.2 sphere,
    NeuS.py:277-279) or its corner signs disagree. Inactive blocks are
    filled with their base-corner coarse value — sign-constant within
    the block — so marching cubes emits nothing there and every crossing
    cube's voxels carry EXACT fine values (vertices are bitwise
    identical to the dense sweep's; tests/test_mesh_sparse.py).

    Seam self-healing: on a field that VIOLATES the Lipschitz slack
    (e.g. an early-training SDF, or one scaled by a constant), the
    surface can cross a block seam the bound missed. After the fine
    eval, any sign disagreement across a block face activates the
    offending block(s), which are evaluated exactly; the pass iterates
    to a fixed point. At convergence the filled region holds NO sign
    change anywhere (fills are blockwise constant and every seam was
    checked), so the result is exact for every surface component the
    coarse pass or the crawl reaches — only a component strictly
    interior to never-activated blocks (an undetected island) can be
    missed, and that requires the coarse corners to under-report |sdf|
    by > safety*diag/2.

    Returns u [res,res,res] (optionally (u, active [nb,nb,nb] bool)).
    Falls back to the dense sweep when factor doesn't divide res.
    """
    res = resolution
    if factor is None:
        # finer coarse pass on small grids (res 64 -> 17^3 coarse
        # corners instead of 9^3: better island detection), 8 at scale
        factor = 8 if res >= 128 else 4
    if res % factor or res < 4 * factor:
        u = evaluate_sdf_grid(params, rcfg, bound_min, bound_max, res,
                              sdf_chunk_fn=sdf_chunk_fn)
        if return_active:
            nb = max(res // factor, 1)
            return u, np.ones((nb, nb, nb), bool)
        return u

    bmin = np.asarray(bound_min, np.float32)
    bmax = np.asarray(bound_max, np.float32)
    h = (bmax - bmin) / (res - 1.0)
    nb = res // factor
    f = factor
    custom = sdf_chunk_fn is not None
    if not custom:
        sdf_chunk_fn = _default_sdf_chunk_fn(params, rcfg)

    # coarse corners at fine-grid stride f (the top corner lands one
    # voxel beyond bmax — the SDF is defined there, distances still hold)
    ax = [np.arange(nb + 1, dtype=np.float32) * (h[i] * f) + bmin[i]
          for i in range(3)]
    cg = np.stack(np.meshgrid(*ax, indexing="ij"), -1).reshape(-1, 3)
    n_c = cg.shape[0]
    # pow2-bucketed chunk (min 4096): a fixed 1<<17 pad would waste up
    # to ~126k SDF evals per call at small resolutions (code review r5)
    CH = 1 << 12
    while CH < min(n_c, 1 << 17):
        CH <<= 1
    pad = (-n_c) % CH
    cgp = np.concatenate([cg, np.zeros((pad, 3), np.float32)], axis=0)
    fn1 = (jax.jit(sdf_chunk_fn) if custom
           else (lambda p: _eval_points_jit(params, p, rcfg=rcfg)))
    cvals = np.concatenate(
        [np.asarray(fn1(jnp.asarray(cgp[i:i + CH])))
         for i in range(0, len(cgp), CH)])[:n_c]
    c = cvals.reshape(nb + 1, nb + 1, nb + 1)

    cs = [c[dx:dx + nb, dy:dy + nb, dz:dz + nb]
          for dx in (0, 1) for dy in (0, 1) for dz in (0, 1)]
    min_abs = np.minimum.reduce([np.abs(x - level) for x in cs])
    sign_change = ((np.minimum.reduce(cs) < level)
                   & (np.maximum.reduce(cs) > level))
    diag = float(np.linalg.norm(h * f))
    active = (min_abs <= safety * diag / 2.0) | sign_change

    # base-corner fill (sign-constant within every inactive block)
    u = np.repeat(np.repeat(np.repeat(c[:nb, :nb, :nb], f, 0), f, 1), f, 2)
    u = np.ascontiguousarray(u, np.float32)

    CB = chunk_blocks
    jaxes = tuple(jnp.asarray(np.linspace(bmin[i], bmax[i], res,
                                          dtype=np.float32))
                  for i in range(3))

    if custom:
        joffs = jnp.asarray(
            np.stack(np.meshgrid(np.arange(f), np.arange(f), np.arange(f),
                                 indexing="ij"), -1).reshape(-1, 3),
            jnp.int32)

        @jax.jit
        def eval_blocks(bid):      # [CB] block ids -> [CB, f^3] -sdf
            bx = bid // (nb * nb)
            by = (bid // nb) % nb
            bz = bid % nb
            base = jnp.stack([bx, by, bz], -1).astype(jnp.int32) * f
            idx = base[:, None, :] + joffs[None]
            p = jnp.stack([jaxes[0][idx[..., 0]], jaxes[1][idx[..., 1]],
                           jaxes[2][idx[..., 2]]], -1)
            return sdf_chunk_fn(p.reshape(-1, 3)).reshape(
                bid.shape[0], f ** 3)
    else:
        def eval_blocks(bid):
            return _eval_blocks_jit(params, jaxes, bid, rcfg=rcfg, nb=nb,
                                    f=f)

    uv = u.reshape(nb, f, nb, f, nb, f)

    def _eval_ids(ids):
        # full CB batches, then one pow2-bucketed tail (>= 64) padded
        # with repeats of the last real id — a zero-padded full batch
        # re-evaluated up to 511 spurious blocks per healing iteration
        # (code review r5); bucket shapes keep the trace count <= log2
        pend = []
        i = 0
        while i < len(ids):
            take = min(CB, len(ids) - i)
            bsz = 64
            while bsz < take:
                bsz <<= 1
            chunk_ids = ids[i:i + take]
            if bsz != take:
                chunk_ids = np.concatenate(
                    [chunk_ids, np.repeat(chunk_ids[-1:], bsz - take)])
            pend.append((chunk_ids, take,
                         eval_blocks(jnp.asarray(chunk_ids))))
            i += take
        for bid_arr, take, dv in pend:
            dvn = np.asarray(dv)
            for j in range(take):
                b = int(bid_arr[j])
                uv[b // (nb * nb), :, (b // nb) % nb, :, b % nb, :] = \
                    dvn[j].reshape(f, f, f)

    _eval_ids(np.flatnonzero(active.ravel()).astype(np.int32))

    # seam self-healing (see docstring): activate any inactive block
    # whose face disagrees in sign with its neighbor, evaluate exactly,
    # iterate to a fixed point
    u3 = u.reshape(res, res, res)

    def _collapse(d):
        # [nb-1, res, res] seam-plane flags -> [nb-1, nb, nb] block flags
        return d.reshape(nb - 1, nb, f, nb, f).any(axis=(2, 4))

    while True:
        new = np.zeros_like(active)
        s = u3 > level
        for axis in range(3):
            sw = np.moveaxis(s, axis, 0)
            lo = sw[f - 1::f][:nb - 1]      # planes k*f-1, k=1..nb-1
            hi = sw[f::f]                   # planes k*f
            # any cross-seam voxel PAIR within a cube can be a marching
            # tet edge — check all 9 in-plane offsets, not just the
            # face-adjacent one, and flag the blocks of BOTH endpoints
            diff_lo = np.zeros_like(lo)
            diff_hi = np.zeros_like(lo)
            for dy in (-1, 0, 1):
                for dz in (-1, 0, 1):
                    hs = np.roll(hi, (dy, dz), axis=(1, 2))
                    d = lo != hs
                    if dy == 1:
                        d[:, 0, :] = False
                    elif dy == -1:
                        d[:, -1, :] = False
                    if dz == 1:
                        d[:, :, 0] = False
                    elif dz == -1:
                        d[:, :, -1] = False
                    diff_lo |= d
                    # the same flags at the hi-plane voxel's position
                    dh = np.roll(d, (-dy, -dz), axis=(1, 2))
                    if dy == -1:
                        dh[:, 0, :] = False
                    elif dy == 1:
                        dh[:, -1, :] = False
                    if dz == -1:
                        dh[:, :, 0] = False
                    elif dz == 1:
                        dh[:, :, -1] = False
                    diff_hi |= dh
            if not diff_lo.any() and not diff_hi.any():
                continue
            dbl = _collapse(diff_lo)
            dbh = _collapse(diff_hi)
            aw = np.moveaxis(active, axis, 0)
            nw = np.moveaxis(new, axis, 0)
            nw[:nb - 1] |= dbl & ~aw[:nb - 1]
            nw[1:] |= dbh & ~aw[1:]
        if not new.any():
            break
        active |= new
        _eval_ids(np.flatnonzero(new.ravel()).astype(np.int32))
    if return_active:
        return u, active
    return u


def _weld_block_meshes(results, res: int, bound_min, bound_max):
    """Concatenate per-block/slab meshes and merge bitwise-equal boundary
    vertices (shared planes are interpolated from the same grid values)."""
    if not results:
        return (np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int64))
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


def extract_geometry_sparse(params, rcfg: RendererConfig, bound_min,
                            bound_max, resolution: int,
                            threshold: float = 0.0,
                            factor: int | None = None,
                            sdf_chunk_fn=None):
    """Sparse isosurface: coarse-to-fine grid (evaluate_sdf_grid_sparse)
    + marching restricted to ACTIVE blocks. Every crossing cube lies
    inside an active block (the Lipschitz bound keeps the surface
    > diag/2 away from every inactive block), and each cube's base voxel
    belongs to exactly one block, so per-block marching over voxel slabs
    [base, base+f] inclusive covers every cube once; shared-face
    vertices weld bitwise (same grid values).
    """
    from color_neus_tpu.ops.marching_cubes import marching_cubes

    res = resolution
    if factor is None:
        factor = 8 if res >= 128 else 4
    if res % factor or res < 4 * factor:
        # misaligned resolution: march the full dense grid (a truncated
        # nb*f < res block walk would silently drop the trailing cubes
        # at the +faces)
        u = evaluate_sdf_grid(params, rcfg, bound_min, bound_max, res,
                              sdf_chunk_fn=sdf_chunk_fn)
        return extract_geometry_from_grid(u, bound_min, bound_max,
                                          threshold)
    u, active = evaluate_sdf_grid_sparse(
        params, rcfg, bound_min, bound_max, res, factor=factor,
        sdf_chunk_fn=sdf_chunk_fn, return_active=True, level=threshold)
    nb = active.shape[0]
    f = res // nb
    u3 = u.reshape(res, res, res)
    results = []
    for b in np.flatnonzero(active.ravel()):
        bx, by, bz = b // (nb * nb), (b // nb) % nb, b % nb
        x0, y0, z0 = bx * f, by * f, bz * f
        v, t = marching_cubes(
            u3[x0:x0 + f + 1, y0:y0 + f + 1, z0:z0 + f + 1], threshold,
            origin=(x0, y0, z0))
        if len(v):
            results.append((v, t))
    return _weld_block_meshes(results, res, bound_min, bound_max)


def extract_geometry(params, rcfg: RendererConfig, bound_min, bound_max,
                     resolution: int, threshold: float = 0.0,
                     sdf_chunk_fn=None, overlap: bool = True,
                     sparse: bool | None = None):
    """Dense grid + isosurface at `threshold` (NeuS.py:410-417 contract).

    overlap=True (default) runs the host marching-tetrahedra pass on
    completed x-slabs IN A WORKER THREAD while the device evaluates the
    next slabs of the grid (VERDICT r4 #4) — the ~9 s host marching at
    512^3 hides entirely under the device sweep. Slab meshes weld
    exactly: shared boundary-plane vertices are interpolated from the
    same grid values, so they are bitwise identical and np.unique merges
    them; every cube belongs to exactly one slab (cubes [x0, x1) of a
    slab owning planes [x0, x1]).

    sparse=True (or rcfg.extract_sparse when sparse is None) switches to
    the coarse-to-fine path (extract_geometry_sparse): ~25x less device
    work at 512^3, vertices bitwise identical to the dense sweep under
    the Lipschitz activation bound.
    """
    if sparse is None:
        sparse = bool(getattr(rcfg, "extract_sparse", False))
    if sparse:
        return extract_geometry_sparse(params, rcfg, bound_min, bound_max,
                                       resolution, threshold,
                                       sdf_chunk_fn=sdf_chunk_fn)
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
                    u.reshape(res, res, res)[x0:x1 + 1], threshold,
                    origin=(x0, 0, 0))
            except BaseException as e:  # re-raised on the main thread
                worker_err.append(e)
                continue
            if len(v):
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

    return _weld_block_meshes(results, res, bound_min, bound_max)


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
    n = vertices.shape[0]
    if n == 0:
        return np.zeros((0, 3), np.float32)
    pad = (-n) % chunk
    pts = np.concatenate([vertices.astype(np.float32),
                          np.zeros((pad, 3), np.float32)], axis=0)

    # fixed-[chunk] module-level jit + a host loop: no [G, chunk, 3]
    # lax.map (which recompiled for every distinct vertex count G —
    # ~12 s at 512^3) and no per-call closure retrace; the per-chunk
    # dispatches are issued async and overlap
    outs = [_vertex_colors_chunk_jit(params, jnp.asarray(pts[i:i + chunk]),
                                     rcfg=rcfg)
            for i in range(0, len(pts), chunk)]
    out = np.concatenate([np.asarray(o) for o in outs]).reshape(-1, 3)
    return out[:n]


@_partial(jax.jit, static_argnames=("rcfg",))
def _vertex_colors_chunk_jit(params, pts, *, rcfg: RendererConfig):
    from color_neus_tpu.models.neus import _use_fused_core

    if _use_fused_core(rcfg):
        from color_neus_tpu.ops.pallas.point_pipeline import (
            resolve_dense, fused_point_pipeline)
        dense = resolve_dense(params, rcfg)
        # same resolver semantics as the training path: 'interpret'
        # runs the kernel in interpret mode instead of silently
        # compiling it (ADVICE r3)
        interp = rcfg.fused_core == "interpret"
        dirs = jnp.zeros_like(pts)
        if rcfg.color.mode != "no_view_dir":
            _, grad, _, _, _ = fused_point_pipeline(
                dense, rcfg, pts, dirs, interpret=interp)
            dirs = -grad
        _, _, gc, _, _ = fused_point_pipeline(
            dense, rcfg, pts, dirs, interpret=interp)
        return gc
    _sdf, feat, grad = fields.sdf_with_grad(params["sdf"], rcfg.sdf, pts)
    return fields.color_apply(params["color"], rcfg.color, pts,
                              grad, -grad, feat)


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
