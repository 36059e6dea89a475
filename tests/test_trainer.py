"""Trainer tests: losses, schedule, grad clip, and a short end-to-end
training run on a synthetic scene that must reduce the loss."""

import numpy as np
import jax
import jax.numpy as jnp

from color_neus_tpu.models.configs import RendererConfig, SDFConfig, ColorConfig, RelightConfig
from color_neus_tpu.models.camera import CameraConfig
from color_neus_tpu.models import trainer as TR
from color_neus_tpu.ops.transforms import pose_spherical


# 2 up-sample rounds: the round loop is uniform and 4-round parity is
# covered by the torch/reference parity suites — halves the CPU traces
TINY_RCFG = RendererConfig(
    kind="color_neus",
    n_samples=16, n_importance=8, up_sample_steps=2,
    sdf=SDFConfig(d_hidden=64, n_layers=4, skip_in=(2,), multires=4),
    color=ColorConfig(mode="no_view_dir", d_in=6, d_feature=256, d_hidden=64, n_layers=2,
                      multires_view=0),
    relight=RelightConfig(d_hidden=64, n_layers=4, y_in_layer=3),
)


def tiny_cfg(H=16, W=16, n_cams=4, include_mask=True):
    return TR.TrainerConfig(
        n_rays=128, eval_ray_size=128, include_mask=include_mask,
        mask_rate=(0.5, 0.8) if include_mask else None,
        iterations=100, warm_up=10, lr=5e-4,
        camera=CameraConfig(H=H, W=W, n_cams=n_cams, pose_mode="6d", focal_order=2),
        renderer=TINY_RCFG,
    )


def synthetic_scene(H=16, W=16, n_cams=4):
    """Cameras on a circle looking at the origin; flat gray images, center
    blob masks."""
    poses = np.stack([pose_spherical(360.0 * i / n_cams, -30.0, 3.0) for i in range(n_cams)])
    images = np.full((n_cams, H, W, 3), 0.4, np.float32)
    yy, xx = np.mgrid[0:H, 0:W]
    blob = (((yy - H / 2) ** 2 + (xx - W / 2) ** 2) < (H / 3) ** 2).astype(np.float32)
    masks = np.tile(blob[None], (n_cams, 1, 1))
    images *= masks[..., None]
    focal = np.asarray([1.2 * W, 1.2 * W], np.float32)
    return poses, images, masks, focal


def _setup(include_mask=True):
    H = W = 16
    n_cams = 4
    poses, images, masks, focal = synthetic_scene(H, W, n_cams)
    cfg = tiny_cfg(H, W, n_cams, include_mask)
    key = jax.random.PRNGKey(0)
    state = TR.init_state(key, cfg, init_focal_np=focal)
    scene = TR.make_scene(np.zeros(3), 1.0, poses)
    return cfg, state, scene, jnp.asarray(images), jnp.asarray(masks)


def test_schedule_warmup_and_cosine():
    cfg = tiny_cfg()
    s = TR.neus_lr_schedule(cfg)
    assert float(s(0)) == 0.0
    np.testing.assert_allclose(float(s(5)), cfg.lr * 0.5, rtol=1e-6)
    np.testing.assert_allclose(float(s(10)), cfg.lr, rtol=1e-6)
    np.testing.assert_allclose(float(s(100)), cfg.lr * cfg.lr_alpha, rtol=1e-5)
    # midway through cosine: factor = (cos(pi/2)+1)/2*(1-a)+a = (1+a)/2
    np.testing.assert_allclose(float(s(55)), cfg.lr * (1 + cfg.lr_alpha) / 2, rtol=1e-5)


def test_per_leaf_clip():
    clip = TR.clip_per_leaf(1.0)
    g = {"a": jnp.full((4,), 10.0), "b": jnp.asarray([0.1, 0.1])}
    out, _ = clip.update(g, None)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(out["a"])), 1.0, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out["b"]), [0.1, 0.1], rtol=1e-6)  # under norm


def test_compute_loss_components():
    cfg = tiny_cfg()
    R, S = 8, 4
    render = {
        "rgb_map_gt": jnp.zeros((R, 3)),
        "color_fine": jnp.full((R, 3), 0.5),
        "gradient_error": jnp.asarray(0.2),
        "weight_sum": jnp.full((R, 1), 0.5),
        "mask": jnp.ones((R,)),
        "delta_relight": jnp.full((R, S, 3), 0.1),
    }
    loss, d = TR.compute_loss(cfg, render)
    np.testing.assert_allclose(float(d["rgb_fine_loss"]), 0.25, rtol=1e-6)
    np.testing.assert_allclose(float(d["mask_loss"]), -np.log(0.5), rtol=1e-5)
    np.testing.assert_allclose(float(d["relight_loss"]), 0.01, rtol=1e-5)
    expect = 0.25 + 0.1 * 0.2 + 0.1 * (-np.log(0.5)) + 1.0 * 0.01
    np.testing.assert_allclose(float(loss), expect, rtol=1e-5)


def test_train_step_reduces_loss():
    cfg, state, scene, images, masks = _setup()
    step_fn = TR.make_train_step(cfg, donate=False)
    img_ids = jnp.arange(4)
    key = jax.random.PRNGKey(1)
    losses = []
    for i in range(30):
        key, sub = jax.random.split(key)
        state, aux = step_fn(state, scene, images, masks, img_ids, sub)
        losses.append(float(aux["loss"]))
    assert np.isfinite(losses).all()
    assert int(state["step"]) == 30
    # loss must clearly decrease on this trivial scene
    assert np.mean(losses[-5:]) < np.mean(losses[:5]) * 0.9, losses


def test_train_step_no_mask_path():
    cfg, state, scene, images, _ = _setup(include_mask=False)
    step_fn = TR.make_train_step(cfg, donate=False)
    state, aux = step_fn(state, scene, images, None, jnp.arange(4), jax.random.PRNGKey(2))
    assert np.isfinite(float(aux["loss"]))
    assert "mask_loss" not in aux


def test_frozen_camera_params_unchanged():
    cfg, state, scene, images, masks = _setup()
    p0 = jax.tree_util.tree_map(np.asarray, state["params"])
    step_fn = TR.make_train_step(cfg, donate=False)
    # run a few steps: at step 0 the warm-up lr factor is exactly 0
    for i in range(3):
        state, _ = step_fn(state, scene, images, masks, jnp.arange(4),
                           jax.random.PRNGKey(3 + i))
    # LEARN_FOCAL/R/T default False -> camera params must not move
    np.testing.assert_array_equal(p0["focal"]["fx"], np.asarray(state["params"]["focal"]["fx"]))
    np.testing.assert_array_equal(p0["pose"]["r"], np.asarray(state["params"]["pose"]["r"]))
    np.testing.assert_array_equal(p0["pose"]["t"], np.asarray(state["params"]["pose"]["t"]))
    # renderer params must move
    assert not np.allclose(p0["renderer"]["variance"]["variance"],
                           np.asarray(state["params"]["renderer"]["variance"]["variance"]))


def test_render_image_shapes():
    cfg, state, scene, images, masks = _setup()
    rgb, depth = TR.render_image(state["params"], scene, cfg, 0, 16, 16,
                                 jax.random.PRNGKey(4))
    assert rgb.shape == (16, 16, 3) and depth.shape == (16, 16)
    assert np.isfinite(rgb).all() and np.isfinite(depth).all()


def test_multi_step_matches_sequential():
    """K scanned steps must equal K sequential full-data steps exactly."""
    cfg, state, scene, images, masks = _setup()
    import copy
    state2 = jax.tree_util.tree_map(jnp.array, state)
    base_key = jax.random.PRNGKey(9)

    single = TR.make_train_step_full(cfg, 4, 4, donate=False)
    multi = TR.make_train_multi_step(cfg, 4, 4, 3, donate=False)

    for _ in range(3):
        state, aux_s = single(state, scene, images, masks, base_key)
    state2, aux_m = multi(state2, scene, images, masks, base_key)

    assert int(state["step"]) == int(state2["step"]) == 3
    np.testing.assert_allclose(float(aux_s["loss"]), float(aux_m["loss"]), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(state["params"]),
                    jax.tree_util.tree_leaves(state2["params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)
