"""Render-side evaluation: PSNR/SSIM of rendered views vs dataset GT.

The DTU-83 BASELINE gate is "PSNR + Chamfer parity"; evaluation.py
covers the mesh half (reference evaluation.py:37-57) and this tool the
render half: load a checkpoint, render EVERY (or --n random) dataset
view with the production renderer, and print ONE JSON line with
per-view and mean PSNR/SSIM vs the ground-truth images — the quantity
the reference only samples one view of during training
(NeuS_Trainer.validate_image:216-277).

    python tools/eval_views.py --cfg config/Color_NeuS_dtu.yml -obj 83 \
        --data_root $DATA_ROOT --reload exp/.../checkpoints/state.npz \
        [--n 5] [--out reports/dtu83_views.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args(argv=None):
    p = argparse.ArgumentParser("color_neus_tpu render-side eval")
    p.add_argument("--cfg", type=str, required=True)
    p.add_argument("-obj", "--obj_id", type=str, default=None)
    p.add_argument("--reload", type=str, required=True, help="checkpoint npz")
    p.add_argument("--data_root", type=str, default=None)
    p.add_argument("--n", type=int, default=0,
                   help="render only N evenly-spaced views (0 = all)")
    p.add_argument("--out", type=str, default=None, help="also write JSON here")
    p.add_argument("--exp_id", type=str, default=None)
    # absorbed for get_config compatibility
    p.add_argument("-b", "--batch_size", type=int, default=None)
    return p.parse_args(argv)


def main(argv=None):
    arg = parse_args(argv)
    import jax
    from color_neus_tpu.utils.config import get_config
    from color_neus_tpu.runtime import TrainLoop
    from color_neus_tpu.models import trainer as TR
    from color_neus_tpu.utils.metrics import mse2psnr, ssim as ssim_fn

    cfg = get_config(arg.cfg, arg)  # --reload -> MODEL.PRETRAINED
    exp_id = arg.exp_id or f"eval_views_{arg.obj_id or 'default'}"
    loop = TrainLoop(cfg, exp_id=exp_id, require_clean_git=False)
    if loop._chunk_fn is None:
        loop._chunk_fn = TR.make_render_image_fn(loop.tcfg)

    ids = np.arange(loop.n_imgs)
    if arg.n and arg.n < loop.n_imgs:
        ids = np.unique(np.linspace(0, loop.n_imgs - 1, arg.n).astype(int))

    views = []
    for cam_id in ids:
        k = jax.random.fold_in(jax.random.PRNGKey(7), int(cam_id))
        rgb, _depth = TR.render_image(
            loop.state["params"], loop.scene, loop.tcfg, int(cam_id),
            loop.H, loop.W, k, chunk_fn=loop._chunk_fn)
        gt = np.asarray(loop.images[cam_id])
        rgbc = np.clip(rgb, 0.0, 1.0)
        if loop.masks is not None:
            # reference protocol: masked regions carry GT * mask
            m = np.asarray(loop.masks[cam_id])[..., None]
            rgbc = rgbc * m
            gt = gt * m
        p = float(mse2psnr(float(np.mean((rgbc - gt) ** 2))))
        s = float(ssim_fn(jax.numpy.asarray(rgbc), jax.numpy.asarray(gt)))
        views.append({"cam": int(cam_id), "psnr": round(p, 3),
                      "ssim": round(s, 5)})

    rep = {
        "checkpoint": arg.reload,
        "n_views": len(views),
        "psnr_mean": round(float(np.mean([v["psnr"] for v in views])), 3),
        "ssim_mean": round(float(np.mean([v["ssim"] for v in views])), 5),
        "platform": jax.devices()[0].platform,
        "views": views,
    }
    print(json.dumps(rep))
    if arg.out:
        os.makedirs(os.path.dirname(arg.out) or ".", exist_ok=True)
        with open(arg.out, "w") as f:
            json.dump(rep, f, indent=1)
    return rep


if __name__ == "__main__":
    main()
