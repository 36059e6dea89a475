"""Worker for the 2-process jax.distributed smoke test (not a test file).

Usage: python tests/_mp_worker.py <coordinator> <num_procs> <proc_id> <outdir>

Each process owns 2 virtual CPU devices; the pair forms a 4-device global
'dp' mesh. Phases (VERDICT r3 #6 — a RUN, not just one step):

  1. ONE sharded train step (params replicated, rays sharded); loss
     finite; rank-gated ScalarWriter writes on rank 0 only.
  2. A short sharded RUN: 6 steps straight vs 3 steps -> checkpoint ->
     resume -> 3 more, asserting the resumed continuation is BITWISE
     identical (losses and final params) to the uninterrupted run.
  3. Validation under the mesh-trained state: full-image render
     (validate_image capability) and mesh extraction + vertex colors
     (validate_mesh capability); per-rank results written for the
     parent to compare across ranks.

Writes loss_<pid>.txt, run_<pid>.json for the parent.
"""

import os
import sys


def main():
    coordinator, num_procs, pid, outdir = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])

    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=2")
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_procs, process_id=pid)
    assert jax.process_count() == num_procs
    assert len(jax.devices()) == 2 * num_procs, jax.devices()

    import numpy as np
    import jax.numpy as jnp
    from color_neus_tpu.models.configs import (
        RendererConfig, SDFConfig, ColorConfig)
    from color_neus_tpu.models.camera import CameraConfig
    from color_neus_tpu.models import trainer as TR
    from color_neus_tpu.parallel import make_mesh, make_sharded_train_step
    from color_neus_tpu.ops.transforms import pose_spherical
    from color_neus_tpu.utils.recorder import ScalarWriter

    H = W = 12
    n_cams = 2
    cfg = TR.TrainerConfig(
        n_rays=8 * len(jax.devices()), include_mask=False, mask_rate=None,
        iterations=10, warm_up=2,
        camera=CameraConfig(H=H, W=W, n_cams=n_cams),
        renderer=RendererConfig(
            kind="neus", n_samples=8, n_importance=4, up_sample_steps=2,
            fused_sdf="off", fused_core="off",
            sdf=SDFConfig(d_hidden=32, n_layers=2, skip_in=(), multires=2),
            color=ColorConfig(mode="idr", d_in=9, d_feature=256, d_hidden=32,
                              n_layers=1, multires_view=2)),
    )
    state = TR.init_state(jax.random.PRNGKey(0), cfg,
                          init_focal_np=np.asarray([15.0, 15.0]))
    poses = np.stack([pose_spherical(180.0 * i, -30.0, 3.0)
                      for i in range(n_cams)])
    poses[:, :, 1:3] *= -1
    scene = TR.make_scene(np.zeros(3), 1.0, poses)
    images = jnp.asarray(np.random.RandomState(0).rand(n_cams, H, W, 3),
                         jnp.float32)
    img_ids = jnp.arange(n_cams)

    mesh = make_mesh()  # all 4 global devices
    assert mesh.devices.size == 2 * num_procs
    step = make_sharded_train_step(cfg, mesh, donate=False)
    _, aux = step(state, scene, images, None, img_ids, jax.random.PRNGKey(7))
    loss = float(aux["loss"])
    assert np.isfinite(loss), loss

    # rank-gated scalar writing: only process 0 writes
    w = ScalarWriter(os.path.join(outdir, f"tb_{pid}"))
    w.add_scalar("loss", loss, 0)
    w.close()

    with open(os.path.join(outdir, f"loss_{pid}.txt"), "w") as f:
        f.write(repr(loss))

    # ---------------- phase 2: run -> checkpoint -> resume ----------------
    import json
    from color_neus_tpu.utils.checkpoint import save_pytree, load_pytree_like
    from color_neus_tpu.ops import mesh as mesh_ops

    base_key = jax.random.PRNGKey(42)

    def run_steps(st, start, n):
        losses = []
        for i in range(start, start + n):
            st, aux = step(st, scene, images, None, img_ids,
                           jax.random.fold_in(base_key, i))
            losses.append(float(aux["loss"]))
        return st, losses

    init = lambda: TR.init_state(jax.random.PRNGKey(0), cfg,
                                 init_focal_np=np.asarray([15.0, 15.0]))
    s_straight, l_straight = run_steps(init(), 0, 6)

    s_mid, l_head = run_steps(init(), 0, 3)
    ckpt = os.path.join(outdir, f"ckpt_{pid}.npz")
    save_pytree(ckpt, jax.device_get(s_mid))          # each rank saves its
    s_loaded = load_pytree_like(jax.device_get(init()), ckpt)  # own replica
    s_resumed, l_tail = run_steps(s_loaded, 3, 3)

    assert l_head + l_tail == l_straight, (l_head, l_tail, l_straight)
    for a, b in zip(jax.tree_util.tree_leaves(jax.device_get(s_straight)),
                    jax.tree_util.tree_leaves(jax.device_get(s_resumed))):
        assert np.array_equal(np.asarray(a), np.asarray(b))

    # ---------------- phase 3: validation under the mesh ----------------
    params_h = jax.device_get(s_straight)["params"]
    rgb, depth = TR.render_image(params_h, scene, cfg, 0, H, W,
                                 jax.random.PRNGKey(5))
    assert np.isfinite(rgb).all() and np.isfinite(depth).all()

    verts, tris = mesh_ops.extract_geometry(
        params_h["renderer"], cfg.renderer,
        np.full(3, -1.01, np.float32), np.full(3, 1.01, np.float32), 24)
    colors = (mesh_ops.extract_vertex_colors(params_h["renderer"],
                                             cfg.renderer, verts)
              if len(verts) else np.zeros((0, 3)))
    with open(os.path.join(outdir, f"run_{pid}.json"), "w") as f:
        json.dump({"losses": l_straight,
                   "rgb_sum": float(np.sum(rgb)),
                   "n_verts": int(len(verts)), "n_tris": int(len(tris)),
                   "color_sum": float(np.sum(colors))}, f)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
