"""Marching-tetrahedra, grid eval, vertex colors, PLY round-trip."""

import os

import numpy as np
import jax

from color_neus_tpu.ops.marching_cubes import marching_cubes, extract_geometry_from_grid
from color_neus_tpu.ops import mesh as mesh_ops


def _sphere_grid(res=48, radius=0.6):
    lin = np.linspace(-1, 1, res, dtype=np.float32)
    x, y, z = np.meshgrid(lin, lin, lin, indexing="ij")
    r = np.sqrt(x * x + y * y + z * z)
    return radius - r  # u = -sdf: positive inside (mcubes convention)


def test_mc_sphere_geometry():
    res, radius = 48, 0.6
    u = _sphere_grid(res, radius)
    verts, tris = extract_geometry_from_grid(u, [-1, -1, -1], [1, 1, 1], 0.0)
    assert len(verts) > 500 and len(tris) > 500
    r = np.linalg.norm(verts, axis=1)
    np.testing.assert_allclose(r.mean(), radius, atol=0.02)
    assert r.std() < 0.02
    # surface area of the triangle mesh ≈ 4*pi*r^2
    a, b, c = verts[tris[:, 0]], verts[tris[:, 1]], verts[tris[:, 2]]
    area = 0.5 * np.linalg.norm(np.cross(b - a, c - a), axis=1).sum()
    np.testing.assert_allclose(area, 4 * np.pi * radius ** 2, rtol=0.05)


def test_mc_watertight_sphere():
    """Every edge of a closed surface must be shared by exactly 2 triangles."""
    u = _sphere_grid(32, 0.5)
    verts, tris = marching_cubes(u, 0.0)
    edges = np.concatenate([tris[:, [0, 1]], tris[:, [1, 2]], tris[:, [2, 0]]])
    edges = np.sort(edges, axis=1)
    keys = edges[:, 0].astype(np.int64) * len(verts) + edges[:, 1]
    _, counts = np.unique(keys, return_counts=True)
    assert (counts == 2).all(), f"non-manifold edges: {np.unique(counts)}"


def test_mc_empty_and_full():
    u = -np.ones((8, 8, 8), np.float32)
    v, t = marching_cubes(u, 0.0)
    assert len(v) == 0 and len(t) == 0
    u = np.ones((8, 8, 8), np.float32)
    v, t = marching_cubes(u, 0.0)
    assert len(v) == 0 and len(t) == 0


def test_mc_plane_offset():
    """Isosurface of a linear field is the right plane."""
    res = 16
    lin = np.linspace(0, 1, res, dtype=np.float32)
    u = (0.37 - lin)[None, None, :] * np.ones((res, res, 1), np.float32)
    verts, tris = extract_geometry_from_grid(u, [0, 0, 0], [1, 1, 1], 0.0)
    np.testing.assert_allclose(verts[:, 2], 0.37, atol=1e-5)


def test_extract_geometry_from_sdf_net(key):
    """Geometric-init SDF is a sphere of radius 1/6 — extraction should
    recover it."""
    from color_neus_tpu.models.configs import SDFConfig, RendererConfig
    from color_neus_tpu.models import fields
    cfg = RendererConfig(sdf=SDFConfig())
    params = {"sdf": fields.init_sdf(key, cfg.sdf)}
    verts, tris = mesh_ops.extract_geometry(
        params, cfg, [-0.4] * 3, [0.4] * 3, 48, 0.0)
    assert len(verts) > 100
    r = np.linalg.norm(verts, axis=1)
    np.testing.assert_allclose(r.mean(), 1.0 / 6.0, atol=0.02)


def test_vertex_colors(key):
    from color_neus_tpu.models.configs import RendererConfig, ColorConfig, SDFConfig
    from color_neus_tpu.models import neus
    cfg = RendererConfig(
        kind="neus",
        sdf=SDFConfig(d_hidden=64, n_layers=4, skip_in=(2,), multires=4),
        color=ColorConfig(mode="idr", d_in=9, d_feature=256, d_hidden=64, n_layers=2))
    params = neus.init_renderer(key, cfg)
    verts = np.random.RandomState(0).randn(100, 3).astype(np.float32) * 0.2
    colors = mesh_ops.extract_vertex_colors(params, cfg, verts, chunk=64)
    assert colors.shape == (100, 3)
    assert colors.min() >= 0.0 and colors.max() <= 1.0


def test_ply_roundtrip(tmp_path):
    verts = np.random.RandomState(1).rand(50, 3).astype(np.float32)
    tris = np.random.RandomState(2).randint(0, 50, (30, 3)).astype(np.int32)
    colors = np.random.RandomState(3).rand(50, 3).astype(np.float32)
    p = os.path.join(tmp_path, "m.ply")
    mesh_ops.write_ply(p, verts, tris, colors)
    v2, t2, c2 = mesh_ops.read_ply(p)
    np.testing.assert_allclose(v2, verts, atol=1e-6)
    np.testing.assert_array_equal(t2, tris)
    np.testing.assert_allclose(c2, colors, atol=1 / 255.0 + 1e-6)

    p2 = os.path.join(tmp_path, "m2.ply")
    mesh_ops.write_ply(p2, verts, tris)
    v3, t3, c3 = mesh_ops.read_ply(p2)
    np.testing.assert_allclose(v3, verts, atol=1e-6)
    assert c3 is None


def test_native_marching_tet_matches_numpy():
    """The C++ extension and the numpy oracle implement the same
    algorithm — identical triangle soup up to vertex ordering."""
    from color_neus_tpu.utils.native import marching_tet_native
    u = _sphere_grid(24, 0.55)
    out = marching_tet_native(u, 0.0)
    assert out is not None, "native build failed (g++ unavailable?)"
    v_n, t_n = out
    v_p, t_p = marching_cubes(u, 0.0, backend="numpy")
    assert len(v_n) == len(v_p) and len(t_n) == len(t_p)
    # same vertex sets (order-insensitive)
    sn = np.asarray(sorted(map(tuple, np.round(v_n, 5))))
    sp = np.asarray(sorted(map(tuple, np.round(v_p, 5))))
    np.testing.assert_allclose(sn, sp, atol=1e-4)
    # same surface: equal area (a handful of triangles may legitimately
    # tessellate degenerate configurations differently)
    def area(v, t):
        a, b, c = v[t[:, 0]], v[t[:, 1]], v[t[:, 2]]
        return 0.5 * np.linalg.norm(np.cross(b - a, c - a), axis=1).sum()
    np.testing.assert_allclose(area(v_n, t_n), area(v_p, t_p), rtol=1e-3)
    # native mesh is watertight too
    edges = np.sort(np.concatenate([t_n[:, [0, 1]], t_n[:, [1, 2]], t_n[:, [2, 0]]]), axis=1)
    keys = edges[:, 0] * len(v_n) + edges[:, 1]
    _, counts = np.unique(keys, return_counts=True)
    assert (counts == 2).all()


def test_glb_export(tmp_path):
    """GLB must be a structurally valid binary glTF container."""
    import json, struct
    verts = np.random.RandomState(1).rand(20, 3).astype(np.float32)
    tris = np.random.RandomState(2).randint(0, 20, (10, 3))
    colors = np.random.RandomState(3).rand(20, 3).astype(np.float32)
    p = os.path.join(tmp_path, "m.glb")
    mesh_ops.write_glb(p, verts, tris, colors)
    with open(p, "rb") as f:
        magic, version, total = struct.unpack("<III", f.read(12))
        assert magic == 0x46546C67 and version == 2
        assert total == os.path.getsize(p)
        jlen, jtype = struct.unpack("<II", f.read(8))
        assert jtype == 0x4E4F534A
        gltf = json.loads(f.read(jlen))
        assert gltf["meshes"][0]["primitives"][0]["attributes"]["POSITION"] == 0
        assert "COLOR_0" in gltf["meshes"][0]["primitives"][0]["attributes"]
        assert gltf["accessors"][0]["count"] == 20
        assert gltf["accessors"][1]["count"] == 30


def test_extract_geometry_overlap_matches_monolithic(key):
    """The slab-overlapped extraction (marching in a worker thread while
    the device evaluates the next slabs) must produce EXACTLY the
    monolithic mesh: same welded vertex set, same triangles."""
    from color_neus_tpu.models.configs import SDFConfig, RendererConfig
    from color_neus_tpu.models import fields
    cfg = RendererConfig(sdf=SDFConfig())
    params = {"sdf": fields.init_sdf(key, cfg.sdf)}
    v1, t1 = mesh_ops.extract_geometry(
        params, cfg, [-0.4] * 3, [0.4] * 3, 48, 0.0, overlap=False)
    v2, t2 = mesh_ops.extract_geometry(
        params, cfg, [-0.4] * 3, [0.4] * 3, 48, 0.0, overlap=True)
    assert len(v1) == len(v2) and len(t1) == len(t2)
    # same vertex SET (orders differ); triangle sets equal after
    # canonicalizing through the sorted vertex order
    o1 = np.lexsort(v1.T)
    o2 = np.lexsort(v2.T)
    np.testing.assert_array_equal(v1[o1], v2[o2])
    r1 = np.empty(len(v1), np.int64)
    r1[o1] = np.arange(len(v1))
    r2 = np.empty(len(v2), np.int64)
    r2[o2] = np.arange(len(v2))
    s1 = {tuple(sorted(t)) for t in r1[t1]}
    s2 = {tuple(sorted(t)) for t in r2[t2]}
    assert s1 == s2
