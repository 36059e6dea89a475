"""Decompose the bench train step's time on the real chip.

Times, at the bench shape (2048 rays x 512 samples = 1.05M points):
  * full train step (the bench number)
  * fused point-pipeline fwd+bwd alone on 1.05M points
  * fused point-pipeline fwd alone
  * hierarchical_z_vals alone (coarse + 4 up-sample rounds + merges)
  * render_rays forward alone
  * train step minus its pieces -> residual glue

Prints one JSON object. Run on the TPU.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, iters=10, warmup=2):
    for _ in range(warmup):
        r = fn(*args)
        _sync(r)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        r = fn(*args)
        _sync(r)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def _sync(r):
    """block_until_ready does not truly sync on the tunneled platform —
    force a host fetch of one scalar."""
    import jax
    leaves = jax.tree_util.tree_leaves(r)
    x = leaves[0]
    float(np.asarray(x).reshape(-1)[0])


def main():
    import jax
    import jax.numpy as jnp
    import dataclasses
    from color_neus_tpu.models.configs import RendererConfig, ColorConfig
    from color_neus_tpu.models.camera import CameraConfig
    from color_neus_tpu.models import trainer as TR, neus
    from color_neus_tpu.ops.pallas.point_pipeline import (
        resolve_dense, fused_point_pipeline)
    from color_neus_tpu.ops.rays import near_far_from_sphere

    n_rays = int(os.environ.get("PROF_N_RAYS", 2048))
    S = 512

    rcfg = RendererConfig(
        kind="color_neus", n_samples=256, n_importance=256, up_sample_steps=4,
        color=ColorConfig(mode="no_view_dir", d_in=6, multires_view=0),
    )
    H = W = 256
    n_cams = 8
    cfg = TR.TrainerConfig(
        n_rays=n_rays, include_mask=True, mask_rate=(0.5, 0.8),
        iterations=100000, warm_up=5000,
        camera=CameraConfig(H=H, W=W, n_cams=n_cams, pose_mode="6d"),
        renderer=rcfg,
    )
    key = jax.random.PRNGKey(0)
    state = TR.init_state(key, cfg, init_focal_np=np.asarray([1.2 * W, 1.2 * W]))
    params = state["params"]["renderer"]

    rng = np.random.RandomState(0)
    d = rng.randn(n_rays, 3)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    o = (-2.4 * d + 0.05 * rng.randn(n_rays, 3)).astype(np.float32)
    rays_o = jnp.asarray(o)
    rays_d = jnp.asarray(d, jnp.float32)
    near, far = near_far_from_sphere(rays_o, rays_d)
    rgb_gt = jnp.asarray(rng.rand(n_rays, 3), jnp.float32)
    pts = jnp.asarray(rng.randn(n_rays * S, 3) * 0.5, jnp.float32)
    dirs = jnp.repeat(rays_d, S, axis=0)

    out = {}

    # 1) full train step (one step per dispatch to avoid scan amortization)
    poses = np.tile(np.eye(4, dtype=np.float32), (n_cams, 1, 1))
    for i in range(n_cams):
        z = rng.randn(3)
        z /= np.linalg.norm(z)
        poses[i, :3, 3] = -2.5 * z
        up = np.asarray([0.0, 0.0, 1.0]) if abs(z[2]) < 0.9 else np.asarray([0.0, 1.0, 0.0])
        x = np.cross(up, z)
        x /= np.linalg.norm(x)
        y = np.cross(z, x)
        poses[i, :3, :3] = np.stack([x, y, z], axis=1)
    scene = TR.make_scene(np.zeros(3), 1.0, poses)
    images = jnp.asarray(rng.rand(n_cams, H, W, 3), jnp.float32)
    yy, xx = np.mgrid[0:H, 0:W]
    blob = (((yy - H / 2) ** 2 + (xx - W / 2) ** 2) < (H / 3) ** 2).astype(np.float32)
    masks = jnp.asarray(np.tile(blob[None], (n_cams, 1, 1)))
    step_fn = TR.make_train_step_full(cfg, n_cams, n_cams, donate=False)
    bkey = jax.random.PRNGKey(1)
    out["train_step_ms"] = timeit(lambda: step_fn(state, scene, images, masks, bkey)[1]) * 1e3

    # 2) point pipeline fwd+bwd alone
    lw = [jnp.asarray(rng.randn(*sh).astype(np.float32))
          for sh in ((n_rays * S, 1), (n_rays * S, 3), (n_rays * S, 3),
                     (n_rays * S, 3), (n_rays * S, 3))]

    @jax.jit
    def pp_loss_grad(params, pts, dirs):
        def f(p):
            dense = resolve_dense(p, rcfg)
            outs = fused_point_pipeline(dense, rcfg, pts, dirs,
                                        tile=rcfg.fused_tile)
            return sum(jnp.sum(w * o) for w, o in zip(lw, outs))
        return jax.grad(f)(params)

    out["pipeline_fwd_bwd_ms"] = timeit(lambda: pp_loss_grad(params, pts, dirs)) * 1e3

    @jax.jit
    def pp_fwd(params, pts, dirs):
        dense = resolve_dense(params, rcfg)
        return fused_point_pipeline(dense, rcfg, pts, dirs, tile=rcfg.fused_tile)[0]

    out["pipeline_fwd_ms"] = timeit(lambda: pp_fwd(params, pts, dirs)) * 1e3

    # 3) hierarchy alone
    @jax.jit
    def hier(params, rays_o, rays_d, near, far, k):
        from color_neus_tpu.ops.pallas.sdf_mlp import resolve_sdf_fn
        sdf_fn = resolve_sdf_fn(params["sdf"], rcfg.sdf, rcfg.fused_sdf)
        return neus.hierarchical_z_vals(params, rcfg, rays_o, rays_d, near, far,
                                        key=k, sdf_fn=sdf_fn)

    out["hierarchy_ms"] = timeit(lambda: hier(params, rays_o, rays_d, near, far,
                                              jax.random.PRNGKey(2))) * 1e3

    # 4) full forward render
    @jax.jit
    def fwd(params, rays_o, rays_d, near, far, k):
        return neus.render_rays(params, rcfg, rays_o, rays_d, near, far,
                                key=k)["color_fine"]

    out["render_fwd_ms"] = timeit(lambda: fwd(params, rays_o, rays_d, near, far,
                                              jax.random.PRNGKey(2))) * 1e3

    # 5) full loss fwd+bwd (render + losses, no optimizer/sampling)
    @jax.jit
    def loss_grad(params, rays_o, rays_d, near, far, k):
        def f(p):
            r = neus.render_rays(p, rcfg, rays_o, rays_d, near, far, key=k)
            rgb = jnp.mean((r["color_fine"] - rgb_gt) ** 2)
            ws = jnp.clip(r["weight_sum"].squeeze(-1), 1e-3, 1 - 1e-3)
            m = -jnp.mean(jnp.log(1 - ws))
            rel = jnp.mean(r["delta_relight"]) ** 2
            return rgb + 0.1 * r["gradient_error"] + 0.1 * m + rel
        return jax.grad(f)(params)

    out["render_loss_bwd_ms"] = timeit(
        lambda: loss_grad(params, rays_o, rays_d, near, far,
                          jax.random.PRNGKey(2))) * 1e3

    out["residual_step_minus_lossgrad_ms"] = out["train_step_ms"] - out["render_loss_bwd_ms"]
    out["residual_lossgrad_minus_pieces_ms"] = (
        out["render_loss_bwd_ms"] - out["pipeline_fwd_bwd_ms"] - out["hierarchy_ms"])
    out = {k: round(v, 2) for k, v in out.items()}
    out["n_rays"] = n_rays
    print(json.dumps(out))


if __name__ == "__main__":
    main()
