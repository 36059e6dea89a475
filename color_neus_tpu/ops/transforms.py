"""Rotation representations, projection decomposition, and misc transforms.

Pure JAX (jit/grad-safe) where the op sits on the training path
(axis-angle / 6d -> rotation matrix for the pose net), numpy where it is
host-side camera preprocessing (P -> K,Rt decomposition).

Reference semantics: /root/reference/lib/utils/transform.py (wrapping
pytorch3d) and lib/models/tools/camera_net.py:112-131.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Rotation conversions (jit/grad-safe)
# ---------------------------------------------------------------------------

def aa_to_rotmat(aa: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle [..., 3] -> rotation matrix [..., 3, 3] (Rodrigues).

    Matches pytorch3d.axis_angle_to_matrix (used via transform.py:60-74).
    Safe at theta -> 0 via a Taylor-guarded sin(t)/t and (1-cos t)/t^2.
    """
    theta2 = jnp.sum(aa * aa, axis=-1, keepdims=True)  # [..., 1]
    theta = jnp.sqrt(jnp.maximum(theta2, 1e-24))
    small = theta2 < 1e-12
    # sin(t)/t and (1-cos(t))/t^2 with series fallbacks
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)        # [...,1]
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)

    x, y, z = aa[..., 0], aa[..., 1], aa[..., 2]
    zeros = jnp.zeros_like(x)
    # K = [[0,-z,y],[z,0,-x],[-y,x,0]] (cross-product matrix of aa)
    K = jnp.stack(
        [
            jnp.stack([zeros, -z, y], axis=-1),
            jnp.stack([z, zeros, -x], axis=-1),
            jnp.stack([-y, x, zeros], axis=-1),
        ],
        axis=-2,
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=aa.dtype), K.shape)
    return eye + a[..., None] * K + b[..., None] * (K @ K)


def rot6d_to_rotmat(d6: jnp.ndarray) -> jnp.ndarray:
    """6D rotation rep [..., 6] -> matrix [..., 3, 3].

    Zhou et al. CVPR'19, matching pytorch3d.rotation_6d_to_matrix: the two
    3-vectors are Gram-Schmidt-orthonormalized and stacked as the first two
    ROWS of the matrix (identity input [1,0,0,0,1,0] -> identity matrix).
    """
    a1, a2 = d6[..., :3], d6[..., 3:]
    b1 = a1 / jnp.linalg.norm(a1, axis=-1, keepdims=True).clip(1e-12)
    a2p = a2 - jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1
    b2 = a2p / jnp.linalg.norm(a2p, axis=-1, keepdims=True).clip(1e-12)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-2)


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion (w, x, y, z) [..., 4] -> rotation matrix [..., 3, 3]."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True).clip(1e-12)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], axis=-1),
            jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], axis=-1),
            jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], axis=-1),
        ],
        axis=-2,
    )


def rotmat_to_quat(R: np.ndarray) -> np.ndarray:
    """Rotation matrix (3,3) -> quaternion (w,x,y,z). Host-side numpy."""
    m = np.asarray(R, dtype=np.float64)
    t = np.trace(m)
    if t > 0:
        s = np.sqrt(t + 1.0) * 2
        return np.array([0.25 * s, (m[2, 1] - m[1, 2]) / s, (m[0, 2] - m[2, 0]) / s, (m[1, 0] - m[0, 1]) / s])
    i = int(np.argmax(np.diag(m)))
    if i == 0:
        s = np.sqrt(1.0 + m[0, 0] - m[1, 1] - m[2, 2]) * 2
        return np.array([(m[2, 1] - m[1, 2]) / s, 0.25 * s, (m[0, 1] + m[1, 0]) / s, (m[0, 2] + m[2, 0]) / s])
    if i == 1:
        s = np.sqrt(1.0 + m[1, 1] - m[0, 0] - m[2, 2]) * 2
        return np.array([(m[0, 2] - m[2, 0]) / s, (m[0, 1] + m[1, 0]) / s, 0.25 * s, (m[1, 2] + m[2, 1]) / s])
    s = np.sqrt(1.0 + m[2, 2] - m[0, 0] - m[1, 1]) * 2
    return np.array([(m[1, 0] - m[0, 1]) / s, (m[0, 2] + m[2, 0]) / s, (m[1, 2] + m[2, 1]) / s, 0.25 * s])


def convert3x4_4x4(mat: jnp.ndarray) -> jnp.ndarray:
    """[..., 3, 4] -> [..., 4, 4] homogeneous (appends [0,0,0,1] row)."""
    bottom = jnp.zeros((*mat.shape[:-2], 1, 4), dtype=mat.dtype)
    bottom = bottom.at[..., 0, 3].set(1.0)
    return jnp.concatenate([mat, bottom], axis=-2)


# ---------------------------------------------------------------------------
# Misc math
# ---------------------------------------------------------------------------

def inverse_sigmoid(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """logit with the reference's clamping (transform.py:304-320)."""
    x = jnp.clip(x, 0.0, 1.0)
    x1 = jnp.maximum(x, eps)
    x2 = jnp.maximum(1.0 - x, eps)
    return jnp.log(x1 / x2)


# ---------------------------------------------------------------------------
# Camera preprocessing (host-side numpy)
# ---------------------------------------------------------------------------

def load_K_Rt_from_P(P: np.ndarray):
    """Decompose a 3x4 projection matrix into intrinsics and c2w pose.

    Same contract as the reference's load_K_Rt_from_P
    (transform.py:280-301, via cv2.decomposeProjectionMatrix): returns
    (intrinsics 4x4 with K normalized so K[2,2]=1, pose 4x4 camera-to-world).

    Implemented with an RQ decomposition of P[:, :3]; signs fixed so K has
    a positive diagonal.
    """
    P = np.asarray(P, dtype=np.float64)[:3, :4]
    M = P[:, :3]

    # RQ decomposition via QR of the "reversed" matrix.
    rev = np.eye(3)[::-1]
    Q_, R_ = np.linalg.qr((rev @ M).T)
    K = rev @ R_.T @ rev
    R = rev @ Q_.T

    # Make diag(K) positive.
    sign = np.diag(np.sign(np.diag(K)))
    K = K @ sign
    R = sign @ R

    # Camera center: null space of P (solve M c = -p4).
    t = -np.linalg.solve(M, P[:, 3])

    K = K / K[2, 2]
    intrinsics = np.eye(4, dtype=np.float32)
    intrinsics[:3, :3] = K.astype(np.float32)

    pose = np.eye(4, dtype=np.float32)
    pose[:3, :3] = R.T.astype(np.float32)  # c2w rotation
    pose[:3, 3] = t.astype(np.float32)     # camera center in world
    return intrinsics, pose


# ---------------------------------------------------------------------------
# More rotation representations (completing the reference's conversion set,
# transform.py:60-276) — jit/grad-safe jax versions.
# ---------------------------------------------------------------------------

def rotmat_to_aa(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix [..., 3, 3] -> axis-angle [..., 3] (via quaternion,
    matching the reference's matrix_to_quaternion -> quaternion_to_axis_angle
    composition, transform.py:77-92). Batched and jit-safe; exact for
    theta in [0, pi)."""
    # Shepperd's method, branch-free: build all four candidate columns and
    # pick the numerically best by largest pivot.
    m = R
    t = jnp.trace(m, axis1=-2, axis2=-1)
    qs = jnp.stack([
        jnp.stack([1.0 + t,
                   m[..., 2, 1] - m[..., 1, 2],
                   m[..., 0, 2] - m[..., 2, 0],
                   m[..., 1, 0] - m[..., 0, 1]], axis=-1),
        jnp.stack([m[..., 2, 1] - m[..., 1, 2],
                   1.0 + m[..., 0, 0] - m[..., 1, 1] - m[..., 2, 2],
                   m[..., 0, 1] + m[..., 1, 0],
                   m[..., 0, 2] + m[..., 2, 0]], axis=-1),
        jnp.stack([m[..., 0, 2] - m[..., 2, 0],
                   m[..., 0, 1] + m[..., 1, 0],
                   1.0 + m[..., 1, 1] - m[..., 0, 0] - m[..., 2, 2],
                   m[..., 1, 2] + m[..., 2, 1]], axis=-1),
        jnp.stack([m[..., 1, 0] - m[..., 0, 1],
                   m[..., 0, 2] + m[..., 2, 0],
                   m[..., 1, 2] + m[..., 2, 1],
                   1.0 + m[..., 2, 2] - m[..., 0, 0] - m[..., 1, 1]], axis=-1),
    ], axis=-2)  # [..., 4 candidates, 4]
    pivots = jnp.stack([1.0 + t,
                        1.0 + m[..., 0, 0] - m[..., 1, 1] - m[..., 2, 2],
                        1.0 + m[..., 1, 1] - m[..., 0, 0] - m[..., 2, 2],
                        1.0 + m[..., 2, 2] - m[..., 0, 0] - m[..., 1, 1]], axis=-1)
    best = jnp.argmax(pivots, axis=-1)
    q = jnp.take_along_axis(qs, best[..., None, None].repeat(4, -1), axis=-2)[..., 0, :]
    return quat_to_aa(q)


def aa_to_quat(aa: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle [..., 3] -> quaternion (w, x, y, z) [..., 4]."""
    theta = jnp.linalg.norm(aa, axis=-1, keepdims=True)
    half = theta * 0.5
    small = theta < 1e-6
    k = jnp.where(small, 0.5 - theta ** 2 / 48.0, jnp.sin(half) / jnp.maximum(theta, 1e-12))
    return jnp.concatenate([jnp.cos(half), aa * k], axis=-1)


def quat_to_aa(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion (w, x, y, z) [..., 4] -> axis-angle [..., 3]."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True).clip(1e-12)
    # canonicalize to w >= 0 (shortest rotation)
    q = jnp.where(q[..., :1] < 0, -q, q)
    w = jnp.clip(q[..., :1], -1.0, 1.0)
    theta = 2.0 * jnp.arccos(w)
    s = jnp.sqrt(jnp.maximum(1.0 - w * w, 1e-12))
    small = theta < 1e-6
    k = jnp.where(small, 2.0 + theta ** 2 / 12.0, theta / s)
    return q[..., 1:] * k


def rotmat_to_rot6d(R: jnp.ndarray) -> jnp.ndarray:
    """Matrix [..., 3, 3] -> 6D rep (first two rows, pytorch3d convention)."""
    return R[..., :2, :].reshape(*R.shape[:-2], 6)


def slerp(q0: jnp.ndarray, q1: jnp.ndarray, ratio) -> jnp.ndarray:
    """Quaternion slerp (transform.py:347-370 semantics), jit-safe."""
    q0 = q0 / jnp.linalg.norm(q0).clip(1e-12)
    q1 = q1 / jnp.linalg.norm(q1).clip(1e-12)
    dot = jnp.sum(q0 * q1)
    q0 = jnp.where(dot < 0, -q0, q0)
    dot = jnp.abs(dot)

    # nearly-parallel: lerp; else geodesic
    theta0 = jnp.arccos(jnp.clip(dot, -1.0, 1.0))
    theta = theta0 * ratio
    q_perp = q1 - dot * q0
    q_perp = q_perp / jnp.linalg.norm(q_perp).clip(1e-12)
    geo = jnp.cos(theta) * q0 + jnp.sin(theta) * q_perp
    lerp = q0 + ratio * (q1 - q0)
    out = jnp.where(dot > 0.9995, lerp, geo)
    return out / jnp.linalg.norm(out).clip(1e-12)


def rotmat_interpolate(R0: np.ndarray, R1: np.ndarray, ratio: float) -> np.ndarray:
    q_new = slerp(jnp.asarray(rotmat_to_quat(np.asarray(R0)), jnp.float32),
                  jnp.asarray(rotmat_to_quat(np.asarray(R1)), jnp.float32), ratio)
    return np.asarray(quat_to_rotmat(q_new))


def se3_interpolate(T0: np.ndarray, T1: np.ndarray, ratio: float) -> np.ndarray:
    """Pose interpolation: slerp rotation + lerp translation (transform.py:373-384)."""
    T0 = np.asarray(T0)
    T1 = np.asarray(T1)
    out = np.eye(4, dtype=np.float32)
    out[:3, :3] = rotmat_interpolate(T0[:3, :3], T1[:3, :3], ratio)
    out[:3, 3] = T0[:3, 3] + ratio * (T1[:3, 3] - T0[:3, 3])
    return out


def pose_spherical(theta: float, phi: float, radius: float) -> np.ndarray:
    """Blender-style spherical camera pose (transform.py:323-337 semantics)."""
    c2w = np.eye(4, dtype=np.float32)
    c2w[2, 3] = radius
    phi_r = phi / 180.0 * np.pi
    th_r = theta / 180.0 * np.pi
    rot_phi = np.array(
        [[1, 0, 0, 0],
         [0, np.cos(phi_r), -np.sin(phi_r), 0],
         [0, np.sin(phi_r), np.cos(phi_r), 0],
         [0, 0, 0, 1]], dtype=np.float32)
    rot_theta = np.array(
        [[np.cos(th_r), 0, -np.sin(th_r), 0],
         [0, 1, 0, 0],
         [np.sin(th_r), 0, np.cos(th_r), 0],
         [0, 0, 0, 1]], dtype=np.float32)
    flip = np.array([[-1, 0, 0, 0], [0, 0, 1, 0], [0, 1, 0, 0], [0, 0, 0, 1]], dtype=np.float32)
    return flip @ rot_theta @ rot_phi @ c2w
