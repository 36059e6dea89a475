"""Unit tests for the ops layer: embedding, transforms, rays, sample_pdf.

Golden values are cross-checked against independent torch/numpy
implementations of the published formulas (not against reference code).
"""

import numpy as np
import torch
import jax
import jax.numpy as jnp
import pytest

from color_neus_tpu.ops.embedding import positional_encoding, embedding_dim
from color_neus_tpu.ops import transforms as T
from color_neus_tpu.ops import rays as R


# ---------------------------------------------------------------------------
# Positional encoding
# ---------------------------------------------------------------------------

def test_pe_shape_and_layout():
    x = jnp.asarray(np.random.RandomState(0).randn(5, 3), jnp.float32)
    out = positional_encoding(x, 6)
    assert out.shape == (5, embedding_dim(3, 6)) == (5, 39)
    # layout: [x, sin(1x), cos(1x), sin(2x), cos(2x), ...]
    np.testing.assert_allclose(out[:, :3], x, rtol=1e-6)
    np.testing.assert_allclose(out[:, 3:6], np.sin(x), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(out[:, 6:9], np.cos(x), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(out[:, 9:12], np.sin(2 * np.asarray(x)), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(out[:, -3:], np.cos(32 * np.asarray(x)), rtol=1e-4, atol=1e-5)


def test_pe_zero_freqs_identity():
    x = jnp.ones((2, 3))
    assert positional_encoding(x, 0) is x


# ---------------------------------------------------------------------------
# Rotations (cross-check vs independent torch formulas)
# ---------------------------------------------------------------------------

def test_aa_to_rotmat_properties():
    rng = np.random.RandomState(1)
    aa = jnp.asarray(rng.randn(10, 3), jnp.float32)
    Rm = T.aa_to_rotmat(aa)
    eye = jnp.eye(3)
    for i in range(10):
        np.testing.assert_allclose(Rm[i] @ Rm[i].T, eye, atol=1e-5)
        assert abs(np.linalg.det(np.asarray(Rm[i])) - 1.0) < 1e-5
    # 90 deg about z: rotates x->y
    Rz = T.aa_to_rotmat(jnp.asarray([0.0, 0.0, np.pi / 2]))
    np.testing.assert_allclose(Rz @ jnp.asarray([1.0, 0, 0]), [0, 1, 0], atol=1e-6)
    # zero angle -> identity (Taylor branch)
    np.testing.assert_allclose(T.aa_to_rotmat(jnp.zeros(3)), eye, atol=1e-7)


def test_rot6d_identity_and_orthonormal():
    d6 = jnp.asarray([1.0, 0, 0, 0, 1, 0])
    np.testing.assert_allclose(T.rot6d_to_rotmat(d6), jnp.eye(3), atol=1e-6)
    rng = np.random.RandomState(2)
    d6 = jnp.asarray(rng.randn(8, 6), jnp.float32)
    Rm = np.asarray(T.rot6d_to_rotmat(d6))
    for i in range(8):
        np.testing.assert_allclose(Rm[i] @ Rm[i].T, np.eye(3), atol=1e-5)
        assert np.linalg.det(Rm[i]) > 0.99
        # Gram-Schmidt rows: row0 parallel to a1
        a1 = np.asarray(d6[i, :3]) / np.linalg.norm(d6[i, :3])
        np.testing.assert_allclose(Rm[i, 0], a1, atol=1e-5)


def test_quat_roundtrip():
    rng = np.random.RandomState(3)
    aa = rng.randn(5, 3)
    Rm = np.asarray(T.aa_to_rotmat(jnp.asarray(aa, jnp.float32)))
    for i in range(5):
        q = T.rotmat_to_quat(Rm[i])
        R2 = np.asarray(T.quat_to_rotmat(jnp.asarray(q, jnp.float32)))
        np.testing.assert_allclose(R2, Rm[i], atol=1e-5)


def test_load_K_Rt_from_P_roundtrip():
    rng = np.random.RandomState(4)
    K = np.array([[800.0, 0, 320], [0, 820.0, 240], [0, 0, 1]])
    aa = rng.randn(3) * 0.5
    Rw2c = np.asarray(T.aa_to_rotmat(jnp.asarray(aa, jnp.float32)), np.float64)
    t = rng.randn(3)
    P = K @ np.concatenate([Rw2c, t[:, None]], axis=1)
    intr, pose = T.load_K_Rt_from_P(P)
    np.testing.assert_allclose(intr[:3, :3], K, rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(pose[:3, :3], Rw2c.T, atol=1e-5)
    # camera center c satisfies R c + t = 0
    np.testing.assert_allclose(Rw2c @ pose[:3, 3] + t, 0, atol=1e-5)


def test_inverse_sigmoid_matches_torch_clamped():
    x = jnp.asarray([0.0, 1e-7, 0.3, 0.999999, 1.0], jnp.float32)
    got = T.inverse_sigmoid(x)
    xt = torch.tensor(np.asarray(x)).clamp(0, 1)
    ref = torch.log(xt.clamp(min=1e-5) / (1 - xt).clamp(min=1e-5))
    np.testing.assert_allclose(got, ref.numpy(), rtol=1e-5)


def test_convert3x4_4x4():
    m = jnp.asarray(np.random.RandomState(5).randn(4, 3, 4), jnp.float32)
    out = T.convert3x4_4x4(m)
    assert out.shape == (4, 4, 4)
    np.testing.assert_allclose(out[:, 3], np.tile([0, 0, 0, 1], (4, 1)), atol=0)


# ---------------------------------------------------------------------------
# Rays
# ---------------------------------------------------------------------------

def test_near_far_from_sphere():
    o = jnp.asarray([[0.0, 0, -3]])
    d = jnp.asarray([[0.0, 0, 1]])
    near, far = R.near_far_from_sphere(o, d)
    np.testing.assert_allclose(near, [2.0], atol=1e-6)
    np.testing.assert_allclose(far, [4.0], atol=1e-6)


def test_rays_match_torch_reference_formula():
    """Cross-check ray generation against the standard NeRF pinhole formula
    computed independently in torch (dirs rotated by c2w[:3,:3])."""
    rng = np.random.RandomState(6)
    H, W = 12, 16
    focal = np.asarray([20.0, 22.0], np.float32)
    aa = rng.randn(3) * 0.3
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, :3] = np.asarray(T.aa_to_rotmat(jnp.asarray(aa, jnp.float32)))
    c2w[:3, 3] = rng.randn(3)

    ro, rd = R.all_rays_for_camera(jnp.asarray(c2w), jnp.asarray(focal), H, W)

    i, j = torch.meshgrid(torch.linspace(0, W - 1, W), torch.linspace(0, H - 1, H), indexing="xy")
    dirs = torch.stack([(i - W * 0.5) / focal[0], (j - H * 0.5) / focal[1], torch.ones_like(i)], -1)
    c2w_t = torch.tensor(c2w)
    rd_t = torch.sum(dirs[..., None, :] * c2w_t[:3, :3], -1)
    np.testing.assert_allclose(np.asarray(rd), rd_t.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ro), np.tile(c2w[:3, 3], (H, W, 1)), atol=1e-6)

    # per-pixel API agrees with the full grid
    py = jnp.asarray([0, 3, 11])
    px = jnp.asarray([0, 7, 15])
    c2w_b = jnp.tile(jnp.asarray(c2w)[None], (3, 1, 1))
    ro2, rd2 = R.rays_for_pixels(c2w_b, jnp.asarray(focal), px, py, H, W)
    np.testing.assert_allclose(rd2, np.asarray(rd)[np.asarray(py), np.asarray(px)], atol=1e-6)


def test_sample_pdf_matches_torch_impl():
    """Cross-check against an independent torch implementation of NeRF's
    inverse-CDF sampling with the same 1e-5 floors."""
    rng = np.random.RandomState(7)
    bins = np.sort(rng.rand(4, 9).astype(np.float32), axis=-1)
    weights = rng.rand(4, 8).astype(np.float32)
    got = R.sample_pdf(jnp.asarray(bins), jnp.asarray(weights), 16, det=True)

    b = torch.tensor(bins)
    w = torch.tensor(weights) + 1e-5
    pdf = w / w.sum(-1, keepdim=True)
    cdf = torch.cumsum(pdf, -1)
    cdf = torch.cat([torch.zeros_like(cdf[..., :1]), cdf], -1)
    u = torch.linspace(0.5 / 16, 1 - 0.5 / 16, 16).expand(4, 16).contiguous()
    inds = torch.searchsorted(cdf, u, right=True)
    below = (inds - 1).clamp(min=0)
    above = inds.clamp(max=cdf.shape[-1] - 1)
    cdf_g = torch.stack([torch.gather(cdf, 1, below), torch.gather(cdf, 1, above)], -1)
    bins_g = torch.stack([torch.gather(b, 1, below), torch.gather(b, 1, above)], -1)
    denom = cdf_g[..., 1] - cdf_g[..., 0]
    denom = torch.where(denom < 1e-5, torch.ones_like(denom), denom)
    t = (u - cdf_g[..., 0]) / denom
    ref = bins_g[..., 0] + t * (bins_g[..., 1] - bins_g[..., 0])
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), atol=1e-5)


def test_sample_pdf_concentrates_mass():
    bins = jnp.tile(jnp.linspace(0.0, 1.0, 11)[None], (2, 1))
    w = jnp.zeros((2, 10)).at[:, 5].set(1.0)
    s = R.sample_pdf(bins, w, 32, det=True)
    frac_in = np.mean((np.asarray(s) >= 0.5) & (np.asarray(s) <= 0.6))
    assert frac_in > 0.9


def test_sample_pixels_masked_rates(key):
    masks = jnp.zeros((2, 16, 16)).at[0, :8].set(1.0)  # 128 of 512 in-mask
    cam, py, px, sel = R.sample_pixels_masked(key, masks, 4096, 0.75)
    frac = float(jnp.mean(sel))
    assert 0.70 < frac < 0.80
    # in-mask rays must land on mask pixels
    on_mask = np.asarray(masks)[np.asarray(cam), np.asarray(py), np.asarray(px)]
    np.testing.assert_array_equal(on_mask, np.asarray(sel))


def test_sample_pixels_masked_degenerate_all_mask(key):
    masks = jnp.ones((1, 4, 4))
    cam, py, px, sel = R.sample_pixels_masked(key, masks, 64, 0.5)
    assert float(jnp.min(sel)) == 1.0  # no background exists


def test_sample_pixels_masked_exact_split(key):
    """Strict-parity sampler: exactly int(rate*n) in-mask rays, no
    duplicate pixels within either set (ray_utils.py:61-76 semantics)."""
    masks = jnp.zeros((2, 16, 16)).at[0, :8].set(1.0)  # 128 of 512 in-mask
    f = jax.jit(lambda k, r: R.sample_pixels_masked_exact(k, masks, 96, r))
    for rate in (0.33, 0.5, 0.75):
        cam, py, px, sel = f(key, rate)
        n_in = int(np.sum(np.asarray(sel)))
        assert n_in == int(rate * 96)
        on_mask = np.asarray(masks)[np.asarray(cam), np.asarray(py),
                                    np.asarray(px)]
        np.testing.assert_array_equal(on_mask, np.asarray(sel))
        flat_idx = (np.asarray(cam) * 256 + np.asarray(py) * 16
                    + np.asarray(px))
        # without replacement within each set
        assert len(set(flat_idx[np.asarray(sel) > 0.5])) == n_in
        assert len(set(flat_idx[np.asarray(sel) < 0.5])) == 96 - n_in


def test_sample_pixels_masked_exact_clamps_to_available(key):
    """Fewer in-mask pixels than requested -> take them all (the
    reference's warning branch)."""
    masks = jnp.zeros((1, 8, 8)).at[0, 0, :4].set(1.0)  # 4 in-mask pixels
    cam, py, px, sel = R.sample_pixels_masked_exact(key, masks, 32, 0.9)
    assert int(np.sum(np.asarray(sel))) == 4


def test_sample_pixels_uniform_quirk(key):
    cam, py, px = R.sample_pixels_uniform(key, 8, 4, 4, 128, first_image_only=True)
    assert int(jnp.max(cam)) == 0
    cam2, _, _ = R.sample_pixels_uniform(key, 8, 4, 4, 128, first_image_only=False)
    assert int(jnp.max(cam2)) > 0


# ---------------------------------------------------------------------------
# Extended rotation conversions and pose interpolation
# ---------------------------------------------------------------------------

def test_rotmat_aa_roundtrip():
    rng = np.random.RandomState(11)
    aa = jnp.asarray(rng.randn(12, 3) * 1.2, jnp.float32)
    back = T.rotmat_to_aa(T.aa_to_rotmat(aa))
    # axis-angle is multivalued beyond |aa| = pi: compare as rotations
    np.testing.assert_allclose(np.asarray(T.aa_to_rotmat(back)),
                               np.asarray(T.aa_to_rotmat(aa)), atol=1e-4)
    # values themselves match within the principal branch
    small = jnp.asarray(rng.randn(8, 3) * 0.8, jnp.float32)
    np.testing.assert_allclose(np.asarray(T.rotmat_to_aa(T.aa_to_rotmat(small))),
                               np.asarray(small), atol=1e-4)
    # zero rotation
    np.testing.assert_allclose(np.asarray(T.rotmat_to_aa(jnp.eye(3))), 0.0, atol=1e-6)


def test_aa_quat_roundtrip():
    rng = np.random.RandomState(12)
    aa = jnp.asarray(rng.randn(10, 3), jnp.float32)
    q = T.aa_to_quat(aa)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(q), axis=-1), 1.0, atol=1e-5)
    back = T.quat_to_aa(q)
    np.testing.assert_allclose(np.asarray(back), np.asarray(aa), atol=1e-4)
    # quat path consistent with matrix path
    np.testing.assert_allclose(np.asarray(T.quat_to_rotmat(q)),
                               np.asarray(T.aa_to_rotmat(aa)), atol=1e-5)


def test_rot6d_roundtrip():
    rng = np.random.RandomState(13)
    aa = jnp.asarray(rng.randn(6, 3), jnp.float32)
    R = T.aa_to_rotmat(aa)
    np.testing.assert_allclose(np.asarray(T.rot6d_to_rotmat(T.rotmat_to_rot6d(R))),
                               np.asarray(R), atol=1e-5)


def test_slerp_endpoints_and_midpoint():
    q0 = jnp.asarray([1.0, 0, 0, 0])
    q1 = T.aa_to_quat(jnp.asarray([0.0, 0.0, np.pi / 2]))
    np.testing.assert_allclose(np.asarray(T.slerp(q0, q1, 0.0)), np.asarray(q0), atol=1e-5)
    np.testing.assert_allclose(np.asarray(T.slerp(q0, q1, 1.0)), np.asarray(q1), atol=1e-5)
    mid = T.slerp(q0, q1, 0.5)
    expect = T.aa_to_quat(jnp.asarray([0.0, 0.0, np.pi / 4]))
    np.testing.assert_allclose(np.asarray(mid), np.asarray(expect), atol=1e-5)


def test_se3_interpolate():
    T0 = np.eye(4, dtype=np.float32)
    T1 = np.eye(4, dtype=np.float32)
    T1[:3, :3] = np.asarray(T.aa_to_rotmat(jnp.asarray([0.0, 0.0, np.pi / 2])))
    T1[:3, 3] = [2, 0, 0]
    Tm = T.se3_interpolate(T0, T1, 0.5)
    np.testing.assert_allclose(Tm[:3, 3], [1, 0, 0], atol=1e-6)
    expect_R = np.asarray(T.aa_to_rotmat(jnp.asarray([0.0, 0.0, np.pi / 4])))
    np.testing.assert_allclose(Tm[:3, :3], expect_R, atol=1e-5)


def test_pe_basis_is_bf16_exact():
    """The hilo thin-dot mode rests on every pe_basis entry being
    exactly bf16-representable (3*2^k / 1*2^k / 0 need <=2 mantissa
    bits) — then only the DATA operand needs the hi/lo split and two
    single-pass bf16 dots reproduce the f32 phase to ~2^-17."""
    import jax.numpy as jnp
    from color_neus_tpu.ops.pallas.point_pipeline import pe_basis

    for multires, scale in ((6, 3.0), (4, 1.0), (10, 3.0)):
        bm = np.asarray(pe_basis(multires, scale, 0, 128))
        rt = np.asarray(jnp.asarray(bm).astype(jnp.bfloat16)
                        .astype(jnp.float32))
        np.testing.assert_array_equal(bm, rt)


def test_encode_hilo_error_bound():
    """hilo phase/pullback vs the exact-f32 reference: relative error
    must sit at the hi/lo-split level (~2^-17), far below the bf16
    dot noise (~2^-8) the r4 pins were added to kill."""
    import jax
    import jax.numpy as jnp
    from color_neus_tpu.ops.pallas.point_pipeline import (
        _encode, _bm_pullback, pe_basis)

    bm = pe_basis(6, 3.0, 0, 128)
    pin = jax.random.uniform(jax.random.PRNGKey(0), (256, 8),
                             minval=-1.5, maxval=1.5)
    _, p_hi = _encode(pin, bm, "highest")
    _, p_lo = _encode(pin, bm, "hilo")
    rel = float((jnp.abs(p_hi - p_lo)
                 / (jnp.abs(p_hi) + 1e-9)).max())
    assert rel < 3e-5, rel   # ~2^-17 class; bf16 would be ~4e-3

    g = jax.random.normal(jax.random.PRNGKey(1), (256, 128))
    o1 = _bm_pullback(g, bm, "highest")
    o2 = _bm_pullback(g, bm, "hilo")
    rel = float(jnp.abs(o1 - o2).max() / (jnp.abs(o1).max() + 1e-9))
    assert rel < 3e-5, rel
