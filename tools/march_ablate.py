"""Ablate the fused march backward kernel's components on the chip.

The bwd kernel (ops/pallas/ray_march.py::_march_bwd_kernel) is the
single largest step cost (67 ms of a 121 ms step at the bench shape,
save-acts). Wall-clock on the tunneled chip carries ~30 ms dispatch
latency, so each timing dispatches k=4 chained kernel calls inside one
jit and reports the marginal per-call cost ((t4 - t1) / 3).

Variants (monkeypatched helpers, production code untouched):

  full            the real backward
  no_pullback     _mlp_pullback skipped: stash load + unflatten +
                  composite fwd/bwd + scans remain
  no_unflatten    unflatten_stash returns raw slices (no casts/concats/
                  gate exps); pullback + composite run on garbage values
  pullback_only   composite fwd returns cheap slices (no [T,1] chains,
                  no cumprod scan); unflatten + pullback remain

Run on the TPU:  python tools/march_ablate.py
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _sync(r):
    float(np.asarray(jax_tree_first(r)).reshape(-1)[0])


def jax_tree_first(r):
    import jax
    return jax.tree_util.tree_leaves(r)[0]


def timeit(fn, *args, iters=5, warmup=1):
    for _ in range(warmup):
        _sync(fn(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        _sync(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    import jax
    import jax.numpy as jnp
    from color_neus_tpu.models.configs import RendererConfig, ColorConfig
    from color_neus_tpu.models import neus
    from color_neus_tpu.ops.pallas import ray_march as RM
    from color_neus_tpu.ops.pallas import point_pipeline as PP
    from color_neus_tpu.ops.pallas.point_pipeline import (
        resolve_dense, pack_pipeline_weights, pe_bases)

    R = int(os.environ.get("ABL_N_RAYS", 1024))
    S = 512
    rcfg = RendererConfig(
        kind="color_neus", n_samples=256, n_importance=256,
        up_sample_steps=4,
        color=ColorConfig(mode="no_view_dir", d_in=6, multires_view=0))
    key = jax.random.PRNGKey(0)
    params = neus.init_renderer(key, rcfg)
    dense = resolve_dense(params, rcfg)
    ws, bs, meta = pack_pipeline_weights(dense, rcfg)
    ws, bs = tuple(ws), tuple(bs)

    kr = jax.random.split(key, 4)
    rays_o = jax.random.normal(kr[0], (R, 3)) * 0.1 + jnp.asarray([0, 0, -2.5])
    rays_d = jax.random.normal(kr[1], (R, 3)) * 0.05 + jnp.asarray([0, 0, 1.0])
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    z = jnp.sort(jax.random.uniform(kr[2], (R, S)) * 2.0 + 1.5, axis=1)
    zero1 = jnp.zeros((R, 1), jnp.float32)
    rays = jnp.concatenate([rays_o, zero1, rays_d, zero1], axis=1)
    z_pt = z.reshape(R * S, 1)
    sinv = jnp.broadcast_to(jnp.asarray(64.0).reshape(1, 1), (1, 128))
    bm_e, bm_c, bm_r = pe_bases(rcfg)
    gbars = jax.random.normal(kr[3], (4, R, 16)) * 0.01
    # ABL_TILE: kernel point-tile override (in points; default 512).
    # CAUTION: oversized tiles can wedge the TPU worker for 10 min+.
    abl_tile = int(os.environ.get("ABL_TILE", 0))
    Rt = max(1, abl_tile // S) if abl_tile else RM.default_tile_rays(S)
    TS = (Rt * S, S)
    sample_dist = 2.0 / rcfg.n_samples

    fwd_save = jax.jit(lambda: RM._march_fwd_call(
        meta, TS, False, sample_dist, ws, bs, rays, z_pt, sinv,
        bm_e, bm_c, bm_r, save=True))
    out = fwd_save()
    stashes = tuple(out[1:])
    del out

    def bwd_k(k):
        def f(stash, gb):
            acc = jnp.zeros(())
            for i in range(k):
                acc = acc + RM._march_bwd_call(
                    meta, TS, False, sample_dist, ws, bs, rays, z_pt,
                    sinv, bm_e, bm_c, bm_r, gb[i] + acc * 1e-30,
                    stashes=stash)[1].sum()
            return acc
        return jax.jit(f)

    def fwd_k(k, save):
        def f(gb):
            acc = jnp.zeros(())
            for i in range(k):
                o = RM._march_fwd_call(
                    meta, TS, False, sample_dist, ws, bs,
                    rays + acc * 1e-30, z_pt, sinv, bm_e, bm_c, bm_r,
                    save=save)
                acc = acc + (o[0] if save else o).sum() + gb[i, 0, 0]
            return acc
        return jax.jit(f)

    def marginal(mk):
        t1 = timeit(mk(1), *([stashes, gbars] if mk is bwd_k_w else [gbars]))
        t4 = timeit(mk(4), *([stashes, gbars] if mk is bwd_k_w else [gbars]))
        return (t4 - t1) / 3.0 * 1e3

    bwd_k_w = None  # set below per call form

    res = {}
    stage = os.environ.get("ABL_STAGE", "all")

    def want(name):
        return stage in ("all", name)

    def time_bwd():
        t1 = timeit(bwd_k(1), stashes, gbars)
        t4 = timeit(bwd_k(4), stashes, gbars)
        return round((t4 - t1) / 3.0 * 1e3, 2)

    def time_fwd(save):
        t1 = timeit(fwd_k(1, save), gbars)
        t4 = timeit(fwd_k(4, save), gbars)
        return round((t4 - t1) / 3.0 * 1e3, 2)

    if want("fwd"):
        res["fwd_save_ms"] = time_fwd(True)
        print("fwd_save_ms", res["fwd_save_ms"], flush=True)
        res["fwd_nosave_ms"] = time_fwd(False)
        print("fwd_nosave_ms", res["fwd_nosave_ms"], flush=True)
    if want("bwd"):
        res["bwd_full_ms"] = time_bwd()
        print("bwd_full_ms", res["bwd_full_ms"], flush=True)

    real_pullback = PP._mlp_pullback
    real_unflatten = PP.unflatten_stash
    real_composite = RM._composite_fwd

    # ---- no_pullback
    def null_pullback(meta_, T, bf16, w_refs, wt_refs, b_refs, w_hat_refs,
                      b_hat_refs, bm_e_ref, bm_c_ref, bm_r_ref, pin, outs,
                      stash, sdf_hat, grad_hat, gc_hat, relit_hat, delta_hat):
        # keep the cotangents alive without a scalar broadcast (Mosaic
        # rejects scalar + [T, 8] here)
        keep = jnp.concatenate(
            [sdf_hat, grad_hat, relit_hat, delta_hat[:, 0:1]], axis=1)
        return keep * 1e-30

    if want("no_pullback"):
        PP._mlp_pullback = null_pullback
        RM._mlp_pullback = null_pullback
        try:
            res["bwd_no_pullback_ms"] = time_bwd()
            print("bwd_no_pullback_ms", res["bwd_no_pullback_ms"], flush=True)
        finally:
            PP._mlp_pullback = real_pullback
            RM._mlp_pullback = real_pullback

    # ---- no_unflatten: raw slices, no casts/concats/gate exps
    def raw_unflatten(meta_, pin, bm_e_ref, bm_c_ref, bm_r_ref, SX, SCR, SG):
        T = pin.shape[0]
        outs = (SG[:, 0:1], SG[:, 1:4], SG[:, 4:7], SG[:, 7:10],
                SG[:, 10:13])
        phase_e = jnp.dot(pin, bm_e_ref[:][0:8],
                          preferred_element_type=jnp.float32)
        phase_c = jnp.dot(pin, bm_c_ref[:][0:8],
                          preferred_element_type=jnp.float32)
        phase_r = phase_c if meta_.n_relight > 0 else None

        def grab(src, width):
            reps = -(-width // src.shape[1])
            xl = jnp.concatenate([src] * reps, axis=1) if reps > 1 else src
            return xl[:, :width]

        Xs = [grab(SX, meta_.layers[l][1]) for l in range(meta_.n_sdf)]
        Gs = [grab(SX, meta_.layers[l + 1][1])[:, :256].astype(jnp.float32)
              for l in range(meta_.n_sdf - 1)]
        Cs = [grab(SCR, meta_.layers[meta_.n_sdf + l][1])
              for l in range(meta_.n_color)]
        Rs = [grab(SCR, meta_.layers[meta_.n_sdf + meta_.n_color + l][1])
              for l in range(meta_.n_relight)]
        return outs, (Xs, Gs, Cs, Rs, phase_e, phase_c, phase_r)

    if want("no_unflatten"):
        PP.unflatten_stash = raw_unflatten
        RM.unflatten_stash = raw_unflatten
        try:
            res["bwd_no_unflatten_ms"] = time_bwd()
            print("bwd_no_unflatten_ms", res["bwd_no_unflatten_ms"],
                  flush=True)
        finally:
            PP.unflatten_stash = real_unflatten
            RM.unflatten_stash = real_unflatten

    # ---- pullback_only: composite fwd replaced by cheap slices
    def cheap_composite(meta_, T, S_, sample_dist_, loc, seg, rays_, z_,
                        inv_s, mlp_fn, native):
        raysb = RM._seg_bcast(seg, rays_)
        rd = raysb[:, 4:7]
        mid = z_
        pin = jnp.concatenate(
            [raysb[:, 0:3], jnp.zeros((T, 1), jnp.float32), rd,
             jnp.zeros((T, 1), jnp.float32)], axis=1)
        outs, stash = mlp_fn(pin)
        sdf, grad, gc, relit, delta = outs
        one = jnp.ones((T, 1), jnp.float32)
        return dict(pin=pin, outs=outs, stash=stash, rd=rd, mid=mid,
                    dists=one * sample_dist_, tc=sdf, u=sdf, ep=sdf,
                    en=sdf, pc=one * 0.5, nc=one * 0.5, q=one * 0.5,
                    alpha=one * 0.5, xv=one * 0.5, Tr=one * 0.5,
                    w=one * 0.5, relaxed=one, normg=one, ek_err=sdf)

    if want("pullback_only"):
        RM._composite_fwd = cheap_composite
        try:
            res["bwd_pullback_only_ms"] = time_bwd()
            print("bwd_pullback_only_ms", res["bwd_pullback_only_ms"],
                  flush=True)
        finally:
            RM._composite_fwd = real_composite

    # ---- fwd_no_composite: forward kernel with the compositing chain
    # (segmented cumprod scan + the [T,1] alpha/sigmoid chain) replaced
    # by cheap slices — isolates the VPU cost of compositing inside the
    # fwd kernel (the save-mode bwd never re-runs compositing).
    if want("fwd_no_composite"):
        RM._composite_fwd = cheap_composite
        try:
            res["fwd_no_composite_ms"] = time_fwd(True)
            print("fwd_no_composite_ms", res["fwd_no_composite_ms"],
                  flush=True)
        finally:
            RM._composite_fwd = real_composite

    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
