"""End-to-end dataset-format tests: write each dataset family's on-disk
format with synthetic content, load it through the real loader, and run
a few TrainLoop steps. Proves the full path users take with real data."""

import json
import os

import numpy as np
import cv2
import pytest
import jax.numpy as jnp

from color_neus_tpu.data.base import create_dataset
from color_neus_tpu.data import colmap
from color_neus_tpu.ops.transforms import pose_spherical, rotmat_to_quat
from color_neus_tpu.runtime import TrainLoop
from color_neus_tpu.utils.config import Config


H = W = 16
N_IMGS = 3


def _cams():
    poses = []
    for i in range(N_IMGS):
        p = pose_spherical(120.0 * i, -30.0, 3.0)
        p[:, 1:3] *= -1  # z-forward convention
        poses.append(p)
    K = np.array([[20.0, 0, W / 2], [0, 20.0, H / 2], [0, 0, 1]], np.float32)
    return np.stack(poses), K


def _write_images(d, with_alpha=False):
    os.makedirs(d, exist_ok=True)
    rng = np.random.RandomState(0)
    for i in range(N_IMGS):
        img = (rng.rand(H, W, 3) * 255).astype(np.uint8)
        if with_alpha:
            a = np.zeros((H, W, 1), np.uint8)
            a[4:12, 4:12] = 255
            img = np.concatenate([img, a], axis=2)
        cv2.imwrite(os.path.join(d, f"{i:03d}.png"), img)


def _mini_train_cfg(ds_cfg, include_mask):
    return Config.wrap({
        "DATASET": ds_cfg,
        "DATA_PRESET": {"INCLUDE_MASK": include_mask},
        "MODEL": {
            "TYPE": "NeuS_Trainer", "PRETRAINED": None, "N_RAYS": 32,
            "EVAL_RAY_SIZE": 64, "NORMALIZE_DIR": True, "FOCAL_ORDER": 2,
            "LEARN_FOCAL": False, "LEARN_R": False, "LEARN_T": False,
            "MASK_RATE": [0.5, 0.8], "POSE_MODE": "6d",
            "RENDERER": {
                "TYPE": "NeuS", "N_SAMPLES": 8, "N_IMPORTANCE": 4,
                "UP_SAMPLE_STEPS": 2, "PERTURB": 1.0, "FUSED_SDF": "off",
                "SDF": {"D_HIDDEN": 32, "N_LAYERS": 2, "SKIP_IN": [], "MULTIRES": 2,
                        "D_OUT": 257},
                "COLOR": {"MODE": "idr", "D_IN": 9, "D_HIDDEN": 32, "N_LAYERS": 1,
                          "MULTIRES_VIEW": 2, "D_FEATURE": 256},
                "DEVIATION": {"INIT_VAL": 0.3},
            },
            "LOSS": {"RGB_LOSS_TYPE": "mse", "LAMBDA_FINE": 1.0,
                     "LAMBDA_EIKONAL": 0.1,
                     "LAMBDA_MASK": 0.1 if include_mask else 0.0},
        },
        "TRAIN": {
            "BATCH_SIZE": 2, "ITERATIONS": 2,
            "OPTIMIZE": {"TYPE": "adam", "LR": 5e-4, "SCHEDULER_TYPE": "NEUS",
                         "WARM_UP": 1, "LR_ALPHA": 0.05},
            "LOG_INTERVAL": 1, "SAVE_INTERVAL": 2,
            "VIZ_IMAGE_INTERVAL": 1000, "VIZ_MESH_INTERVAL": 1000,
            "MANUAL_SEED": 1, "GRAD_CLIP_ENABLED": True,
            "GRAD_CLIP": {"TYPE": 2, "NORM": 1.0},
        },
    })


def _run_two_steps(cfg, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    loop = TrainLoop(cfg, exp_id="t")
    loop.run()
    assert int(loop.state["step"]) == 2
    return loop


def test_dtu_format_end_to_end(tmp_path, monkeypatch):
    """cameras_sphere.npz world/scale projection matrices + image/ + mask/."""
    root = os.path.join(tmp_path, "data")
    d = os.path.join(root, "DTU", "dtu_scan7")
    _write_images(os.path.join(d, "image"))
    os.makedirs(os.path.join(d, "mask"), exist_ok=True)
    for i in range(N_IMGS):
        m = np.zeros((H, W), np.uint8)
        m[4:12, 4:12] = 255
        cv2.imwrite(os.path.join(d, "mask", f"{i:03d}.png"), m)

    poses, K = _cams()
    payload = {}
    for i in range(N_IMGS):
        c2w = poses[i]
        Rw2c = c2w[:3, :3].T
        t = -Rw2c @ c2w[:3, 3]
        P = np.eye(4, dtype=np.float32)
        P[:3, :4] = K @ np.concatenate([Rw2c, t[:, None]], axis=1)
        payload[f"world_mat_{i}"] = P
        payload[f"scale_mat_{i}"] = np.eye(4, dtype=np.float32)
    np.savez(os.path.join(d, "cameras_sphere.npz"), **payload)

    ds = create_dataset({"TYPE": "DTU", "DATA_ROOT": root, "OBJ_ID": "7"},
                        {"INCLUDE_MASK": True})
    assert ds.n_imgs == N_IMGS
    init = ds.init_data()
    # recovered poses match the ones we projected
    np.testing.assert_allclose(init["poses"][:, :3, 3], poses[:, :3, 3], atol=1e-3)
    np.testing.assert_allclose(init["focal"], [20.0, 20.0], atol=1e-3)

    cfg = _mini_train_cfg({"TYPE": "DTU", "DATA_ROOT": root, "OBJ_ID": "7"}, True)
    _run_two_steps(cfg, tmp_path, monkeypatch)


def test_omniobject3d_format_end_to_end(tmp_path, monkeypatch):
    root = os.path.join(tmp_path, "data")
    d = os.path.join(root, "OmniObject3D", "blender_renders", "doll", "doll_002",
                     "render")
    _write_images(os.path.join(d, "images"), with_alpha=True)
    poses, K = _cams()
    frames = []
    for i in range(N_IMGS):
        tm = poses[i].copy()
        tm[:, 1:3] *= -1  # loader flips back
        frames.append({"file_path": f"./images/{i:03d}",
                       "transform_matrix": tm.tolist()})
    cax = 2.0 * np.arctan(0.5 * W / 20.0)
    with open(os.path.join(d, "transforms.json"), "w") as f:
        json.dump({"camera_angle_x": cax, "frames": frames}, f)

    ds = create_dataset({"TYPE": "OmniObject3D", "DATA_ROOT": root,
                         "OBJ_ID": "doll_002"}, {"INCLUDE_MASK": False})
    assert ds.n_imgs == N_IMGS
    np.testing.assert_allclose(ds.focal, [20.0, 20.0], rtol=1e-4)
    np.testing.assert_allclose(ds.poses[:, :3, 3], poses[:, :3, 3], atol=1e-5)

    cfg = _mini_train_cfg({"TYPE": "OmniObject3D", "DATA_ROOT": root,
                           "OBJ_ID": "doll_002"}, False)
    _run_two_steps(cfg, tmp_path, monkeypatch)


def test_iho_video_format_end_to_end(tmp_path, monkeypatch):
    root = os.path.join(tmp_path, "data")
    d = os.path.join(root, "IHO_video", "bear")
    _write_images(os.path.join(d, "obj"), with_alpha=True)
    os.makedirs(os.path.join(d, "colmap"), exist_ok=True)
    poses, K = _cams()
    cams = {1: colmap.Camera(1, "PINHOLE", W, H,
                             np.array([20.0, 20.0, W / 2, H / 2]))}
    ims = {}
    for i in range(N_IMGS):
        Rw2c = poses[i][:3, :3].T
        t = -Rw2c @ poses[i][:3, 3]
        ims[i + 1] = colmap.ColmapImage(i + 1, rotmat_to_quat(Rw2c), t, 1,
                                        f"{i:03d}.png")
    rng = np.random.RandomState(0)
    pts = {j: colmap.Point3D(j, rng.randn(3) * 0.3,
                             np.array([1, 2, 3], np.uint8), 0.1)
           for j in range(1, 50)}
    colmap.write_cameras_binary(cams, os.path.join(d, "colmap", "cameras.bin"))
    colmap.write_images_binary(ims, os.path.join(d, "colmap", "images.bin"))
    colmap.write_points3d_binary(pts, os.path.join(d, "colmap", "points3D.bin"))

    ds = create_dataset({"TYPE": "IHO_VIDEO", "DATA_ROOT": root, "OBJ_ID": "bear"},
                        {"INCLUDE_MASK": True})
    assert ds.n_imgs == N_IMGS
    np.testing.assert_allclose(ds.poses[:, :3, 3], poses[:, :3, 3], atol=1e-3)
    img, mask = ds.get_image(0)
    assert img.shape == (H, W, 3) and mask is not None

    cfg = _mini_train_cfg({"TYPE": "IHO_VIDEO", "DATA_ROOT": root,
                           "OBJ_ID": "bear"}, True)
    cfg["MODEL"]["LEARN_FOCAL"] = True
    cfg["MODEL"]["LEARN_R"] = True
    cfg["MODEL"]["LEARN_T"] = True
    _run_two_steps(cfg, tmp_path, monkeypatch)


def test_bmvs_format_end_to_end(tmp_path, monkeypatch):
    root = os.path.join(tmp_path, "data")
    d = os.path.join(root, "BlendedMVS", "bmvs_bear")
    _write_images(os.path.join(d, "image"))
    os.makedirs(os.path.join(d, "mask"), exist_ok=True)
    for i in range(N_IMGS):
        m = np.full((H, W), 255, np.uint8)
        cv2.imwrite(os.path.join(d, "mask", f"{i:03d}.png"), m)
    poses, K = _cams()
    payload = {}
    for i in range(N_IMGS):
        Rw2c = poses[i][:3, :3].T
        t = -Rw2c @ poses[i][:3, 3]
        P = np.eye(4, dtype=np.float32)
        P[:3, :4] = K @ np.concatenate([Rw2c, t[:, None]], axis=1)
        payload[f"world_mat_{i}"] = P
        payload[f"scale_mat_{i}"] = np.eye(4, dtype=np.float32)
    np.savez(os.path.join(d, "cameras_sphere.npz"), **payload)

    ds = create_dataset({"TYPE": "BlendedMVS", "DATA_ROOT": root, "OBJ_ID": "bear"},
                        {"INCLUDE_MASK": True})
    assert ds.n_imgs == N_IMGS
    cfg = _mini_train_cfg({"TYPE": "BlendedMVS", "DATA_ROOT": root,
                           "OBJ_ID": "bear"}, True)
    _run_two_steps(cfg, tmp_path, monkeypatch)
