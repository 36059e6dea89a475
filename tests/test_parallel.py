"""Multi-device sharding tests on the 8 virtual CPU devices."""

import numpy as np
import jax
import jax.numpy as jnp

from color_neus_tpu.parallel import make_mesh
import __graft_entry__ as graft


def test_mesh_creation():
    mesh = make_mesh(8)
    assert mesh.devices.size == 8
    assert mesh.axis_names == ("dp",)
    mesh2 = make_mesh(4)
    assert mesh2.devices.size == 4


def test_graft_entry_compiles():
    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    color = np.asarray(out[0])
    assert color.shape == (256, 3)
    assert np.isfinite(color).all()


def test_dryrun_multichip_8():
    graft.dryrun_multichip(8)


def test_sharded_step_matches_single_device():
    """The sharded step on 8 devices must produce the same loss (up to
    float tolerance) as the unsharded step — same seeds, same math."""
    from color_neus_tpu.models import trainer as TR
    from color_neus_tpu.models.configs import RendererConfig, SDFConfig, ColorConfig
    from color_neus_tpu.models.camera import CameraConfig
    from color_neus_tpu.parallel import make_sharded_train_step
    from color_neus_tpu.ops.transforms import pose_spherical

    H = W = 16
    n_cams = 2
    cfg = TR.TrainerConfig(
        n_rays=64, include_mask=False, mask_rate=None,
        iterations=100, warm_up=10,
        camera=CameraConfig(H=H, W=W, n_cams=n_cams),
        renderer=RendererConfig(
            kind="neus", n_samples=8, n_importance=4, up_sample_steps=2,
            sdf=SDFConfig(d_hidden=32, n_layers=2, skip_in=(), multires=2),
            color=ColorConfig(mode="idr", d_in=9, d_feature=256, d_hidden=32,
                              n_layers=1, multires_view=2)),
    )
    key = jax.random.PRNGKey(0)
    state = TR.init_state(key, cfg, init_focal_np=np.asarray([20.0, 20.0]))
    poses = np.stack([pose_spherical(120.0 * i, -30.0, 3.0) for i in range(n_cams)])
    poses[:, :, 1:3] *= -1
    scene = TR.make_scene(np.zeros(3), 1.0, poses)
    images = jnp.asarray(np.random.RandomState(0).rand(n_cams, H, W, 3), jnp.float32)
    img_ids = jnp.arange(n_cams)
    k = jax.random.PRNGKey(7)

    plain = TR.make_train_step(cfg, donate=False)
    _, aux1 = plain(state, scene, images, None, img_ids, k)

    mesh = make_mesh(8)
    sharded = make_sharded_train_step(cfg, mesh, donate=False)
    _, aux2 = sharded(state, scene, images, None, img_ids, k)

    np.testing.assert_allclose(float(aux1["loss"]), float(aux2["loss"]),
                               rtol=2e-4, atol=2e-5)


import pytest


@pytest.mark.parametrize("march_acts", ["recompute", "save"],
                         ids=["recompute", "save_acts"])
def test_sharded_fused_march_matches_single_device(march_acts):
    """The fused pallas path under shard_map (one pallas_call per ray
    shard — GSPMD can't partition a custom call) must reproduce the
    single-device fused loss AND weight gradients. perturb=0 so the
    per-shard key folding doesn't change the sampled z. Covers both
    backward activation policies: the save path's stash residuals flow
    through the shard_map transpose per device."""
    from color_neus_tpu.models import trainer as TR
    from color_neus_tpu.models.configs import (
        RendererConfig, SDFConfig, ColorConfig, RelightConfig)
    from color_neus_tpu.models.camera import CameraConfig
    from color_neus_tpu.parallel import make_sharded_train_step
    from color_neus_tpu.ops.transforms import pose_spherical

    H = W = 16
    n_cams = 2
    rcfg = RendererConfig(
        kind="color_neus", n_samples=16, n_importance=8, up_sample_steps=2,
        perturb=0.0, fused_march="interpret", fused_sdf="interpret",
        sdf=SDFConfig(d_hidden=64, n_layers=4, skip_in=(2,), multires=4),
        color=ColorConfig(mode="no_view_dir", d_in=6, d_feature=256,
                          d_hidden=64, n_layers=2, multires_view=0),
        relight=RelightConfig(d_hidden=64, n_layers=4, y_in_layer=3),
        march_acts=march_acts,
    )
    cfg = TR.TrainerConfig(
        n_rays=32, include_mask=False, mask_rate=None,
        iterations=100, warm_up=10,
        camera=CameraConfig(H=H, W=W, n_cams=n_cams, pose_mode="6d"),
        renderer=rcfg,
    )
    key = jax.random.PRNGKey(0)
    state = TR.init_state(key, cfg, init_focal_np=np.asarray([20.0, 20.0]))
    poses = np.stack([pose_spherical(120.0 * i, -30.0, 3.0) for i in range(n_cams)])
    poses[:, :, 1:3] *= -1
    scene = TR.make_scene(np.zeros(3), 1.0, poses)
    images = jnp.asarray(np.random.RandomState(0).rand(n_cams, H, W, 3), jnp.float32)
    img_ids = jnp.arange(n_cams)
    k = jax.random.PRNGKey(7)

    plain = TR.make_train_step(cfg, donate=False)
    s1, aux1 = plain(state, scene, images, None, img_ids, k)

    mesh = make_mesh(8)
    sharded = make_sharded_train_step(cfg, mesh, donate=False)
    s2, aux2 = sharded(state, scene, images, None, img_ids, k)

    np.testing.assert_allclose(float(aux1["loss"]), float(aux2["loss"]),
                               rtol=2e-4, atol=2e-5)
    # updated params (i.e. the psum'd gradients) must match too
    l1 = jax.tree_util.tree_leaves(s1["params"])
    l2 = jax.tree_util.tree_leaves(s2["params"])
    for a, b in zip(l1, l2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-5)


def test_sharded_output_is_sharded():
    """Check the constraint actually shards intermediate compute: the
    compiled HLO should reference all 8 devices."""
    from color_neus_tpu.parallel.sharding import constrain_rays
    mesh = make_mesh(8)

    @jax.jit
    def f(x):
        y = constrain_rays(x, mesh)
        return (y * 2).sum()

    x = jnp.ones((64, 3))
    # with a constraint inside, the compiled HLO must mention sharding
    hlo = f.lower(x).compile().as_text()
    assert "sharding" in hlo
    assert np.isclose(float(f(x)), 384.0)


def test_constrain_rays_none_mesh_identity():
    x = jnp.ones((8, 3))
    from color_neus_tpu.parallel.sharding import constrain_rays
    assert constrain_rays(x, None) is x
    assert constrain_rays(None, make_mesh(2)) is None


def _collective_operand_bytes(hlo_text):
    """Parse every collective op in an HLO dump -> [(op, shape, bytes)].

    Matches lines like
        %all-gather.3 = f32[8,1024]{1,0} all-gather(...)
    and tuple-shaped variants; bytes counts every array in the result
    shape (result bytes >= gathered operand bytes for these ops).
    """
    import re

    dtype_bytes = {"f64": 8, "f32": 4, "bf16": 2, "f16": 2, "u64": 8,
                   "s64": 8, "u32": 4, "s32": 4, "u16": 2, "s16": 2,
                   "u8": 1, "s8": 1, "pred": 1}
    out = []
    coll = re.compile(
        r"=\s*(\([^)]*\)|\S+)\s+"
        r"(all-gather|all-to-all|collective-permute|all-reduce|"
        r"reduce-scatter)\(")
    arr = re.compile(r"(f64|f32|bf16|f16|u64|s64|u32|s32|u16|s16|u8|s8|pred)"
                     r"\[([0-9,]*)\]")
    for line in hlo_text.splitlines():
        m = coll.search(line)
        if not m:
            continue
        total = 0
        for dt, dims in arr.findall(m.group(1)):
            n = 1
            for d in dims.split(","):
                if d:
                    n *= int(d)
            total += n * dtype_bytes[dt]
        out.append((m.group(2), m.group(1), total))
    return out


def test_sharded_step_collectives_are_bounded():
    """Compile-time proxy for the >=90% scaling-efficiency gate
    (BASELINE.json north_star; ARCHITECTURE.md 'Parallelism'): the
    sharded train step's HLO may move only PARAMETER/SCALAR-sized data
    through collectives (the grad/loss psum). If sharding propagation
    ever regressed into all-gathering a per-point [R*S, width] tensor,
    scaling would silently die; this asserts it cannot.

    Shapes here: per-point activations are n_rays*S*width*4B = 18 MB,
    while the whole parameter pytree is ~0.5 MB — a 1 MB/collective
    bound separates them by >1 order of magnitude.
    """
    from color_neus_tpu.models import trainer as TR
    from color_neus_tpu.models.configs import (RendererConfig, SDFConfig,
                                               ColorConfig)
    from color_neus_tpu.models.camera import CameraConfig
    from color_neus_tpu.parallel import make_sharded_train_step
    from color_neus_tpu.ops.transforms import pose_spherical

    H = W = 64
    n_cams = 2
    cfg = TR.TrainerConfig(
        n_rays=2048, include_mask=False, mask_rate=None,
        iterations=100, warm_up=10,
        camera=CameraConfig(H=H, W=W, n_cams=n_cams),
        renderer=RendererConfig(
            kind="neus", n_samples=16, n_importance=8, up_sample_steps=2,
            sdf=SDFConfig(d_hidden=64, n_layers=3, skip_in=(2,), multires=4),
            color=ColorConfig(mode="idr", d_in=9, d_feature=256, d_hidden=64,
                              n_layers=2, multires_view=2)),
    )
    key = jax.random.PRNGKey(0)
    state = TR.init_state(key, cfg, init_focal_np=np.asarray([70.0, 70.0]))
    poses = np.stack([pose_spherical(120.0 * i, -30.0, 3.0)
                      for i in range(n_cams)])
    poses[:, :, 1:3] *= -1
    scene = TR.make_scene(np.zeros(3), 1.0, poses)
    images = jnp.zeros((n_cams, H, W, 3), jnp.float32)
    img_ids = jnp.arange(n_cams)
    k = jax.random.PRNGKey(7)

    mesh = make_mesh(8)
    sharded = make_sharded_train_step(cfg, mesh, donate=False)
    hlo = sharded.lower(state, scene, images, None, img_ids,
                        k).compile().as_text()

    colls = _collective_operand_bytes(hlo)
    # the grad psum must exist...
    assert any(op == "all-reduce" for op, _s, _b in colls), colls[:5]
    # ...and nothing per-point-sized may ride ANY collective: per-point
    # tensors here are >= n_rays*S*4B = 196 KB for even a width-1 lane
    # and 18 MB at width 256; params total ~0.5 MB. Bound each
    # collective at 1 MB.
    for op, shape, nbytes in colls:
        assert nbytes <= 1 << 20, (
            f"{op} moves {nbytes} bytes ({shape}) — a per-point tensor "
            "is being gathered; ray sharding is broken")
