"""Measure the ACTUAL reference (Colmar-zlicheng/Color-NeuS) training
throughput on this machine's CPU, per BASELINE.md canonical run #1.

Drives the real reference code at /root/reference (read-only import):
real dataset loader (DTU format, synthetic scene written to /tmp), real
``NeuS_Trainer`` built through the reference registry, real optimizer /
scheduler / grad-clip, and the reference train-step body from
``/root/reference/train.py:63-77`` — on CPU (torch in this image is
CPU-only; the reference's own entry point hardcodes ``.cuda()`` at
train.py:49, so we drive ``main_worker``'s body directly).

Outputs JSON with measured steps/s + rays/s at:
  * the reference config shape (1024 rays x 64+64x4 = 128 samples/ray)
  * the BASELINE.json metric shape  (1024 rays x 256+256x4 = 512 spp)

Used by BASELINE.md to replace the estimated A100 denominator with a
measured + documented derivation.  Nothing in /root/reference is
modified or copied.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REF = "/root/reference"


def write_dtu_scene(root: str, n_imgs: int = 8, H: int = 256, W: int = 256) -> None:
    """Synthetic DTU-format scene: image/ mask/ cameras_sphere.npz.

    Format per /root/reference/lib/datasets/dtu.py:27-94 (world_mat_i =
    K[R|t], scale_mat_i, image/ and mask/ png dirs).
    """
    import cv2

    d = os.path.join(root, "DTU", "dtu_scan83")
    os.makedirs(os.path.join(d, "image"), exist_ok=True)
    os.makedirs(os.path.join(d, "mask"), exist_ok=True)
    rng = np.random.RandomState(0)
    K = np.array([[1.2 * W, 0, W / 2], [0, 1.2 * W, H / 2], [0, 0, 1]], np.float64)
    payload = {}
    yy, xx = np.mgrid[0:H, 0:W]
    disc = (((yy - H / 2) ** 2 + (xx - W / 2) ** 2) < (H / 3) ** 2)
    for i in range(n_imgs):
        img = (rng.rand(H, W, 3) * 255).astype(np.uint8)
        cv2.imwrite(os.path.join(d, "image", f"{i:03d}.png"), img)
        cv2.imwrite(os.path.join(d, "mask", f"{i:03d}.png"),
                    (disc * 255).astype(np.uint8))
        # camera on a radius-2.5 sphere looking at the origin
        z = rng.randn(3)
        z /= np.linalg.norm(z)
        up = np.array([0.0, 0.0, 1.0]) if abs(z[2]) < 0.9 else np.array([0.0, 1.0, 0.0])
        x = np.cross(up, z)
        x /= np.linalg.norm(x)
        y = np.cross(z, x)
        c2w = np.eye(4)
        c2w[:3, :3] = np.stack([x, y, z], axis=1)
        c2w[:3, 3] = -2.5 * z
        Rw2c = c2w[:3, :3].T
        t = -Rw2c @ c2w[:3, 3]
        P = np.eye(4)
        P[:3, :4] = K @ np.concatenate([Rw2c, t[:, None]], axis=1)
        payload[f"world_mat_{i}"] = P
        payload[f"scale_mat_{i}"] = np.eye(4)
    np.savez(os.path.join(d, "cameras_sphere.npz"), **payload)


class _NullSummary:
    def add_scalar(self, *a, **k):
        pass

    def add_image(self, *a, **k):
        pass


def measure(n_samples: int, n_importance: int, n_rays: int, steps: int,
            data_root: str) -> dict:
    import torch

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import _ref_shims
    _ref_shims.install()
    sys.path.insert(0, REF)
    os.chdir(REF)  # reference resolves config/ relatively
    import lib.models  # noqa: F401  (registers MODEL/RENDERER)
    import lib.datasets  # noqa: F401
    from lib.datasets import create_dataset
    from lib.utils import builder
    from lib.utils.config import get_config
    from lib.utils.net_utils import build_optimizer_nerf, clip_gradient, setup_seed
    from argparse import Namespace

    arg = Namespace(batch_size=None, reload=None, obj_id="83")
    cfg = get_config(config_file="config/Color_NeuS_dtu.yml", arg=arg, merge=True)
    cfg.defrost()
    cfg.DATASET.DATA_ROOT = data_root
    cfg.MODEL.N_RAYS = n_rays
    cfg.MODEL.RENDERER.N_SAMPLES = n_samples
    cfg.MODEL.RENDERER.N_IMPORTANCE = n_importance
    cfg.TRAIN.LOG_INTERVAL = 10 ** 9
    cfg.freeze()

    setup_seed(cfg.TRAIN.MANUAL_SEED, cfg.TRAIN.CONV_REPEATABLE)
    dataset = create_dataset(cfg.DATASET, data_preset=cfg.DATA_PRESET)
    init_data = dataset.get_init_data()
    model = builder.build_model_init(cfg.MODEL, data_preset=cfg.DATA_PRESET,
                                     train=cfg.TRAIN, data=init_data)
    model.setup(summary_writer=_NullSummary())
    device = torch.device("cpu")
    optimizer, scheduler = build_optimizer_nerf(
        model, cfg.TRAIN.OPTIMIZE, -1, iterations=cfg.TRAIN.ITERATIONS)

    dataset.get_all_init(batch_size=cfg.TRAIN.BATCH_SIZE)
    model.train()

    # exact train-step body of /root/reference/train.py:63-77
    def step(step_idx):
        optimizer.zero_grad()
        batch = dataset.get_rand_batch_smaples(device=device)
        render_dict, loss_dict = model(batch, step_idx, "train")
        loss = loss_dict["loss"]
        loss.backward()
        if cfg.TRAIN.GRAD_CLIP_ENABLED:
            clip_gradient(optimizer, cfg.TRAIN.GRAD_CLIP.NORM, cfg.TRAIN.GRAD_CLIP.TYPE)
        optimizer.step()
        optimizer.zero_grad()
        scheduler.step()
        return float(loss)

    for i in range(2):  # warmup (allocator, imports)
        step(i + 1)
    times = []
    for i in range(steps):
        t0 = time.perf_counter()
        step(i + 3)
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))
    return {
        "n_rays": n_rays,
        "samples_per_ray": n_samples + n_importance,
        "steps_timed": steps,
        "sec_per_step_median": round(dt, 4),
        "sec_per_step_mean": round(float(np.mean(times)), 4),
        "rays_per_s": round(n_rays / dt, 2),
        "torch_threads": torch.get_num_threads(),
    }


def main():
    shape = os.environ.get("REF_BASELINE_SHAPE", "512")
    steps = int(os.environ.get("REF_BASELINE_STEPS", 10))
    data_root = "/tmp/ref_dtu_data"
    if not os.path.exists(os.path.join(data_root, "DTU", "dtu_scan83")):
        write_dtu_scene(data_root)
    if shape == "128":
        out = measure(64, 64, 1024, steps, data_root)
    else:
        out = measure(256, 256, 1024, steps, data_root)
    out["shape"] = shape
    out["workload"] = "reference Color_NeuS_dtu.yml train step, CPU"
    print(json.dumps(out))


if __name__ == "__main__":
    main()
