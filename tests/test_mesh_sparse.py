"""Sparse (coarse-to-fine) extraction == dense extraction.

The sparse path (ops/mesh.evaluate_sdf_grid_sparse /
extract_geometry_sparse) must produce bitwise-identical vertices to the
dense sweep: every marching-cubes crossing cube lies inside an active
block (Lipschitz activation bound), where fine values are the exact
per-voxel SDF evaluations.
"""

import numpy as np
import jax

from color_neus_tpu.models.configs import RendererConfig, SDFConfig
from color_neus_tpu.models import fields
from color_neus_tpu.ops import mesh as mesh_ops


def _net(key):
    # geometric-init SDF: approximately |x| - 1/6 — a real (non-analytic)
    # eikonal-satisfying field so the Lipschitz bound is exercised for
    # what it claims to cover
    cfg = RendererConfig(sdf=SDFConfig(d_hidden=64, n_layers=4,
                                       skip_in=(2,), multires=4))
    params = {"sdf": fields.init_sdf(key, cfg.sdf)}
    return params, cfg


def test_sparse_grid_matches_dense_on_active_blocks():
    params, cfg = _net(jax.random.PRNGKey(0))
    res, f = 64, 4
    bmin, bmax = [-0.4] * 3, [0.4] * 3
    dense = mesh_ops.evaluate_sdf_grid(params, cfg, bmin, bmax, res)
    sp, active = mesh_ops.evaluate_sdf_grid_sparse(
        params, cfg, bmin, bmax, res, factor=f, return_active=True)
    nb = res // f
    frac = active.mean()
    assert 0 < frac < 0.6, f"active fraction {frac} — bound not selective"
    # active blocks carry the exact dense values, bitwise
    d4 = dense.reshape(nb, f, nb, f, nb, f)
    s4 = sp.reshape(nb, f, nb, f, nb, f)
    for b in np.flatnonzero(active.ravel()):
        bx, by, bz = b // (nb * nb), (b // nb) % nb, b % nb
        np.testing.assert_array_equal(d4[bx, :, by, :, bz, :],
                                      s4[bx, :, by, :, bz, :])
    # inactive blocks are sign-constant and agree with dense's signs
    # (no crossing was skipped)
    for b in np.flatnonzero(~active.ravel()):
        bx, by, bz = b // (nb * nb), (b // nb) % nb, b % nb
        dsign = np.sign(d4[bx, :, by, :, bz, :])
        assert (dsign >= 0).all() or (dsign <= 0).all()
        assert np.sign(s4[bx, 0, by, 0, bz, 0]) in (0.0, dsign.ravel()[0])


def test_sparse_mesh_identical_to_dense():
    params, cfg = _net(jax.random.PRNGKey(0))
    res = 64
    bmin, bmax = [-0.4] * 3, [0.4] * 3
    vd, td = mesh_ops.extract_geometry(params, cfg, bmin, bmax, res,
                                       sparse=False)
    vs, ts = mesh_ops.extract_geometry(params, cfg, bmin, bmax, res,
                                       sparse=True)
    assert len(vd) > 100
    assert len(vs) == len(vd) and len(ts) == len(td)
    # vertex SETS are bitwise equal (ordering differs between the slab
    # and block walks)
    sd = vd[np.lexsort(vd.T)]
    ss = vs[np.lexsort(vs.T)]
    np.testing.assert_array_equal(sd, ss)
    # triangle sets match as position-triples (canonicalize each tri by
    # sorting its vertex coordinates)
    def tri_keys(v, t):
        p = v[t]                              # [T, 3, 3]
        p = np.sort(p.reshape(len(t), 9).view("<f4"), axis=1)
        return p[np.lexsort(p.T)]
    np.testing.assert_array_equal(tri_keys(vd, td), tri_keys(vs, ts))


def test_sparse_falls_back_when_factor_misaligned():
    params, cfg = _net(jax.random.PRNGKey(1))
    res = 30  # not divisible by 4 or 8
    # tight bbox: the sphere surface (r ~ 1/6) reaches the outermost
    # cube layer — a truncated nb*f < res block walk would drop those
    # cubes (code review r5); the fallback must march the full grid
    bb = 0.17
    vd, td = mesh_ops.extract_geometry(params, cfg, [-bb] * 3, [bb] * 3,
                                       res, sparse=False)
    vs, ts = mesh_ops.extract_geometry(params, cfg, [-bb] * 3, [bb] * 3,
                                       res, sparse=True)
    # the fallback marches the whole grid in one call, which dedups by
    # edge key; the slab path welds by position (t-clamped vertices from
    # different edges coincide) — compare geometry, not raw counts
    assert len(np.unique(vs.round(6), axis=0)) == \
        len(np.unique(vd.round(6), axis=0))

    def area(v, t):
        p = v[t]
        return float(np.linalg.norm(
            np.cross(p[:, 1] - p[:, 0], p[:, 2] - p[:, 0]), axis=1).sum())
    np.testing.assert_allclose(area(vs, ts), area(vd, td), rtol=1e-6)


def test_seam_healing_recovers_lipschitz_violation():
    """A field with |grad| >> 1 breaks the coarse activation bound; the
    seam self-healing crawl must still converge to the dense mesh
    (bitwise) for the connected surface."""
    params, cfg = _net(jax.random.PRNGKey(0))

    def fn(p):  # -sdf scaled by 6: Lipschitz constant ~6, bound assumes ~1
        return -6.0 * fields.sdf_value(params["sdf"], cfg.sdf, p)[:, 0]

    res, f = 64, 8
    bmin, bmax = [-0.4] * 3, [0.4] * 3
    # safety=0.25 guarantees the naive bound under-activates
    sp, active = mesh_ops.evaluate_sdf_grid_sparse(
        params, cfg, bmin, bmax, res, factor=f, safety=0.25,
        sdf_chunk_fn=fn, return_active=True)
    dense = mesh_ops.evaluate_sdf_grid(params, cfg, bmin, bmax, res,
                                       sdf_chunk_fn=fn)
    from color_neus_tpu.ops.marching_cubes import marching_cubes
    vd, td = marching_cubes(dense, 0.0)
    vs, ts = marching_cubes(sp, 0.0)
    assert len(vd) > 100
    assert len(vs) == len(vd) and len(ts) == len(td)
    np.testing.assert_array_equal(vd[np.lexsort(vd.T)], vs[np.lexsort(vs.T)])


def test_extract_sparse_config_knob():
    from color_neus_tpu.models.configs import renderer_config_from_cfg
    cfg = RendererConfig(extract_sparse=True)
    assert cfg.extract_sparse is True
    assert RendererConfig().extract_sparse is False
    assert renderer_config_from_cfg(
        {"EXTRACT_SPARSE": True}).extract_sparse is True
