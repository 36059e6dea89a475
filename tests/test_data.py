"""Data layer tests: COLMAP binary round-trip, synthetic dataset, DTU-style
npz camera parsing via a generated fixture."""

import os

import numpy as np

from color_neus_tpu.data import colmap
from color_neus_tpu.data.base import create_dataset, sphere_npz_cameras
from color_neus_tpu.ops.transforms import aa_to_rotmat, rotmat_to_quat
import jax.numpy as jnp


def test_colmap_roundtrip(tmp_path):
    cams = {1: colmap.Camera(1, "PINHOLE", 640, 480,
                             np.array([500.0, 510.0, 320.0, 240.0]))}
    rng = np.random.RandomState(0)
    imgs, pts = {}, {}
    for i in range(1, 4):
        R = np.asarray(aa_to_rotmat(jnp.asarray(rng.randn(3) * 0.3, jnp.float32)))
        q = rotmat_to_quat(R)
        imgs[i] = colmap.ColmapImage(i, q, rng.randn(3), 1, f"img_{i:03d}.png")
    for i in range(1, 6):
        pts[i] = colmap.Point3D(i, rng.randn(3), (rng.rand(3) * 255).astype(np.uint8), 0.5)

    colmap.write_cameras_binary(cams, os.path.join(tmp_path, "cameras.bin"))
    colmap.write_images_binary(imgs, os.path.join(tmp_path, "images.bin"))
    colmap.write_points3d_binary(pts, os.path.join(tmp_path, "points3D.bin"))

    c2 = colmap.read_cameras_binary(os.path.join(tmp_path, "cameras.bin"))
    assert c2[1].model == "PINHOLE" and c2[1].width == 640
    np.testing.assert_allclose(c2[1].params, cams[1].params)

    i2 = colmap.read_images_binary(os.path.join(tmp_path, "images.bin"))
    assert i2[2].name == "img_002.png"
    np.testing.assert_allclose(i2[2].qvec, imgs[2].qvec)
    np.testing.assert_allclose(i2[2].tvec, imgs[2].tvec)
    R = i2[2].qvec2rotmat()
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-8)

    p2 = colmap.read_points3d_binary(os.path.join(tmp_path, "points3D.bin"))
    np.testing.assert_allclose(p2[3].xyz, pts[3].xyz)


def test_synthetic_dataset():
    ds = create_dataset({"TYPE": "Synthetic", "N_IMGS": 6, "H": 32, "W": 32},
                        {"INCLUDE_MASK": True})
    assert len(ds) == 6
    init = ds.init_data()
    assert init["poses"].shape == (6, 4, 4)
    assert init["H"] == 32 and init["W"] == 32
    all_d = ds.load_all()
    assert all_d["images"].shape == (6, 32, 32, 3)
    assert all_d["masks"].shape == (6, 32, 32)
    # the sphere should be visible (mask non-trivial) in every view
    frac = all_d["masks"].mean(axis=(1, 2))
    assert (frac > 0.01).all() and (frac < 0.9).all(), frac
    # images only colored inside the mask
    outside = all_d["images"][all_d["masks"] < 0.5]
    np.testing.assert_allclose(outside, 0.0, atol=1e-6)


def test_synthetic_cameras_look_at_origin():
    """Center pixel ray should pass near the origin."""
    from color_neus_tpu.ops.rays import all_rays_for_camera
    ds = create_dataset({"TYPE": "Synthetic", "N_IMGS": 4, "H": 33, "W": 33},
                        {"INCLUDE_MASK": True})
    for i in range(4):
        ro, rd = all_rays_for_camera(jnp.asarray(ds.poses[i]), jnp.asarray(ds.focal),
                                     33, 33, normalize=True)
        o = np.asarray(ro[16, 16])
        d = np.asarray(rd[16, 16])
        # distance from origin to the line o + t d
        t = -np.dot(o, d) / np.dot(d, d)
        closest = o + t * d
        assert np.linalg.norm(closest) < 0.15, (i, closest)
        assert t > 0, "origin must be in front of the camera"


def test_sphere_npz_cameras(tmp_path):
    """Build a cameras_sphere.npz like DTU's and check decomposition."""
    rng = np.random.RandomState(5)
    n = 3
    K = np.array([[700.0, 0, 320], [0, 700.0, 240], [0, 0, 1]])
    payload = {}
    for i in range(n):
        R = np.asarray(aa_to_rotmat(jnp.asarray(rng.randn(3) * 0.4, jnp.float32)), np.float64)
        t = rng.randn(3)
        P34 = K @ np.concatenate([R, t[:, None]], axis=1)
        world = np.eye(4)
        world[:3, :4] = P34
        payload[f"world_mat_{i}"] = world
        payload[f"scale_mat_{i}"] = np.eye(4)
    path = os.path.join(tmp_path, "cameras_sphere.npz")
    np.savez(path, **payload)
    intr, poses, scale_mats, bbmin, bbmax = sphere_npz_cameras(path, n)
    assert poses.shape == (n, 4, 4)
    np.testing.assert_allclose(intr[0][:3, :3], K, rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(bbmin, [-1.01] * 3, atol=1e-6)
    np.testing.assert_allclose(bbmax, [1.01] * 3, atol=1e-6)
