"""Native-kernel shard_map gate: run the fused march under a 1-device
Mesh ON THE REAL CHIP and assert equality with the unsharded fused step.

The CPU test suite exercises pallas-under-shard_map only in interpret
mode (tests/test_parallel.py); this executes the exact composition real
multi-chip uses — Mosaic-compiled pallas_call inside jax.shard_map with
the transpose psum on the weight gradients — the only multi-chip risk
retirable on one chip (VERDICT r2 "Next #2").

Prints one JSON line; invoked by tests/test_tpu_gates.py with
RUN_TPU_TESTS=1.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from color_neus_tpu.models import trainer as TR
    from color_neus_tpu.models.configs import RendererConfig, ColorConfig
    from color_neus_tpu.models.camera import CameraConfig
    from color_neus_tpu.parallel import make_mesh, make_sharded_train_step
    from color_neus_tpu.ops.transforms import pose_spherical

    assert jax.devices()[0].platform == "tpu", jax.devices()
    march_acts = os.environ.get("SMC_MARCH_ACTS", "save")

    H = W = 32
    n_cams = 2
    rcfg = RendererConfig(
        kind="color_neus", n_samples=64, n_importance=64, up_sample_steps=4,
        perturb=0.0, fused_march="on", fused_sdf="on", fused_core="on",
        march_acts=march_acts,
        color=ColorConfig(mode="no_view_dir", d_in=6, multires_view=0),
    )
    cfg = TR.TrainerConfig(
        n_rays=int(os.environ.get("SMC_N_RAYS", 256)),
        include_mask=False, mask_rate=None,
        iterations=1000, warm_up=100,
        camera=CameraConfig(H=H, W=W, n_cams=n_cams, pose_mode="6d"),
        renderer=rcfg,
    )
    key = jax.random.PRNGKey(0)
    state = TR.init_state(key, cfg, init_focal_np=np.asarray([40.0, 40.0]))
    poses = np.stack([pose_spherical(120.0 * i, -30.0, 3.0)
                      for i in range(n_cams)])
    poses[:, :, 1:3] *= -1
    scene = TR.make_scene(np.zeros(3), 1.0, poses)
    images = jnp.asarray(np.random.RandomState(0).rand(n_cams, H, W, 3),
                         jnp.float32)
    img_ids = jnp.arange(n_cams)
    k = jax.random.PRNGKey(7)

    plain = TR.make_train_step(cfg, donate=False)
    s1, aux1 = plain(state, scene, images, None, img_ids, k)

    mesh = make_mesh(1)  # 1 real chip: same composition multi-chip uses
    sharded = make_sharded_train_step(cfg, mesh, donate=False)
    s2, aux2 = sharded(state, scene, images, None, img_ids, k)

    loss1, loss2 = float(aux1["loss"]), float(aux2["loss"])
    # post-update parameter comparison covers the weight-grad path
    # (transpose psum) end-to-end through the optimizer
    worst = 0.0
    worst_leaf = ""
    flat1 = jax.tree_util.tree_leaves_with_path(s1["params"])
    flat2 = jax.tree_util.tree_leaves(s2["params"])
    for (path, a), b in zip(flat1, flat2):
        a = np.asarray(a, np.float64)
        b = np.asarray(b, np.float64)
        denom = np.maximum(np.abs(a), 1e-8)
        err = float(np.max(np.abs(a - b) / denom))
        if err > worst:
            worst, worst_leaf = err, jax.tree_util.keystr(path)
    ok = abs(loss1 - loss2) <= 1e-5 * max(1.0, abs(loss1)) and worst < 5e-4
    print(json.dumps({
        "platform": jax.devices()[0].platform,
        "march_acts": march_acts,
        "loss_plain": loss1, "loss_sharded": loss2,
        "worst_param_rel_err": worst, "worst_leaf": worst_leaf,
        "pass": bool(ok),
    }))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
