"""Utils tests: config, registry, metrics (SSIM vs torch impl, chamfer),
checkpoint round-trip, recorder."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from color_neus_tpu.utils.config import get_config, Config
from color_neus_tpu.utils.registry import Registry
from color_neus_tpu.utils import metrics as M
from color_neus_tpu.utils.checkpoint import save_pytree, load_pytree_like
from color_neus_tpu.utils.recorder import Recorder


def test_config_load_and_defaults(tmp_path):
    p = os.path.join(tmp_path, "c.yml")
    with open(p, "w") as f:
        f.write("MODEL:\n  N_RAYS: 256\nTRAIN:\n  BATCH_SIZE: 4\n")
    cfg = get_config(p)
    assert cfg.MODEL.N_RAYS == 256
    assert cfg.TRAIN.BATCH_SIZE == 4
    assert cfg.TRAIN.MANUAL_SEED == 1  # default preserved
    # dump/reload round-trip
    out = os.path.join(tmp_path, "dump.yml")
    cfg.dump_yaml(out)
    cfg2 = get_config(out, merge=False)
    assert cfg2.MODEL.N_RAYS == 256


def test_config_cli_overrides(tmp_path):
    p = os.path.join(tmp_path, "c.yml")
    with open(p, "w") as f:
        f.write("MODEL:\n  PRETRAINED: null\nTRAIN:\n  BATCH_SIZE: 8\n")

    class A:
        batch_size = 2
        reload = "/ckpt.npz"
        obj_id = "83"
    cfg = get_config(p, A())
    assert cfg.TRAIN.BATCH_SIZE == 2
    assert cfg.MODEL.PRETRAINED == "/ckpt.npz"
    assert cfg.DATASET.OBJ_ID == "83"


def test_config_frozen_after_get_config(tmp_path):
    """get_config returns a recursively frozen tree (reference CN_R parity,
    /root/reference/lib/utils/config.py:8-39): mutation raises."""
    from color_neus_tpu.utils.config import FrozenConfigError
    p = os.path.join(tmp_path, "c.yml")
    with open(p, "w") as f:
        f.write("MODEL:\n  N_RAYS: 256\nTRAIN:\n  BATCH_SIZE: 4\n")
    cfg = get_config(p)
    assert cfg.is_frozen
    with pytest.raises(FrozenConfigError):
        cfg["TRAIN"]["BATCH_SIZE"] = 16
    with pytest.raises(FrozenConfigError):
        cfg.MODEL.N_RAYS = 1
    with pytest.raises(FrozenConfigError):
        cfg["TRAIN"].pop("BATCH_SIZE")
    # reading still fine, and a thawed copy is mutable
    assert cfg.TRAIN.BATCH_SIZE == 4
    c2 = cfg.thaw_copy()
    c2["TRAIN"]["BATCH_SIZE"] = 16
    assert c2.TRAIN.BATCH_SIZE == 16 and cfg.TRAIN.BATCH_SIZE == 4


def test_recorder_rejects_dirty_git_for_named_exp(tmp_path, monkeypatch):
    """Clean-tree enforcement for named exps (reference recorder.py:39)."""
    import subprocess
    monkeypatch.chdir(tmp_path)
    subprocess.run(["git", "init", "-q"], check=True)
    with open("f.txt", "w") as f:
        f.write("dirty")
    with pytest.raises(RuntimeError, match="dirty"):
        Recorder("named_exp", None, root=str(tmp_path / "exp"))
    # exempt ids and the opt-out flag still work
    Recorder("default", None, root=str(tmp_path / "exp"))
    Recorder("named_exp", None, root=str(tmp_path / "exp"),
             require_clean_git=False)


def test_reference_schema_configs_load():
    """Our shipped configs must parse into TrainerConfig."""
    from color_neus_tpu.models.trainer import trainer_config_from_cfg
    for name in ("Color_NeuS_dtu", "NeuS_dtu", "Color_NeuS_iho",
                 "Color_NeuS_omniobject3d", "Color_NeuS_synthetic"):
        cfg = get_config(os.path.join("config", f"{name}.yml"))
        t = trainer_config_from_cfg(cfg, H=32, W=32, n_cams=4)
        assert t.renderer.kind in ("neus", "color_neus")
        if "iho" in name:
            assert t.camera.learn_focal and t.camera.learn_r and t.camera.learn_t
            assert t.lambda_mask == 0.0
        if "omniobject" in name:
            assert not t.include_mask


def test_registry():
    reg = Registry("t")

    @reg.register_module("Foo")
    class Foo:
        def __init__(self, cfg):
            self.cfg = cfg

    assert "Foo" in reg
    obj = reg.build({"TYPE": "Foo", "X": 1})
    assert obj.cfg["X"] == 1
    with pytest.raises(KeyError):
        reg.get("Bar")


def test_ssim_matches_independent_torch():
    """Cross-check our JAX SSIM against a freshly-written torch version
    with the same gaussian window."""
    import torch
    import torch.nn.functional as TF
    rng = np.random.RandomState(0)
    a = rng.rand(32, 32, 3).astype(np.float32)
    b = np.clip(a + 0.1 * rng.randn(32, 32, 3).astype(np.float32), 0, 1)
    got = float(M.ssim(jnp.asarray(a), jnp.asarray(b)))

    x = np.arange(11) - 5.0
    g = np.exp(-0.5 * (x / 1.5) ** 2)
    g /= g.sum()
    k = torch.tensor(np.outer(g, g), dtype=torch.float32)[None, None]

    def filt(im):
        t = torch.tensor(im).permute(2, 0, 1)[:, None]
        return TF.conv2d(t, k)[:, 0]

    c1, c2 = 0.01 ** 2, 0.03 ** 2
    mu1, mu2 = filt(a), filt(b)
    s1 = filt(a * a) - mu1 ** 2
    s2 = filt(b * b) - mu2 ** 2
    s12 = filt(a * b) - mu1 * mu2
    ref = (((2 * mu1 * mu2 + c1) * (2 * s12 + c2)) /
           ((mu1 ** 2 + mu2 ** 2 + c1) * (s1 + s2 + c2))).mean().item()
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_ssim_identity():
    a = np.random.RandomState(1).rand(24, 24, 3).astype(np.float32)
    assert float(M.ssim(jnp.asarray(a), jnp.asarray(a))) > 0.999


def test_psnr():
    p = M.PSNR()
    p.feed(np.zeros((4, 4, 3)), np.full((4, 4, 3), 0.1))
    np.testing.assert_allclose(p.avg, 20.0, atol=1e-4)


def test_chamfer():
    a = np.random.RandomState(2).randn(500, 3).astype(np.float32)
    assert M.chamfer_distance(a, a) < 1e-6  # fp32 roundoff in x²-2ab+b²
    b = a + np.asarray([0.1, 0, 0], np.float32)
    d = M.chamfer_distance(a, b)
    assert 0 < d <= 0.02 + 1e-6  # ≤ 2 * 0.1^2, less due to NN reassignment


def test_loss_metric():
    lm = M.LossMetric()
    lm.feed({"loss": 1.0, "x": 2.0})
    lm.feed({"loss": 3.0, "x": 4.0})
    assert lm.get_loss() == 2.0
    lm.reset()
    assert np.isnan(lm.get_loss()) or lm.get_loss() == 0.0


def test_checkpoint_roundtrip(tmp_path, key):
    tree = {"a": jnp.arange(5.0), "b": {"c": jnp.ones((2, 3)), "d": jnp.asarray(3)},
            "k": key}
    p = os.path.join(tmp_path, "ck", "state.npz")
    save_pytree(p, tree)
    zero = jax.tree_util.tree_map(jnp.zeros_like, tree)
    back = load_pytree_like(zero, p)
    np.testing.assert_allclose(back["a"], np.arange(5.0))
    np.testing.assert_allclose(back["b"]["c"], np.ones((2, 3)))
    np.testing.assert_array_equal(back["k"], np.asarray(key))


def test_checkpoint_shape_mismatch(tmp_path):
    p = os.path.join(tmp_path, "s.npz")
    save_pytree(p, {"a": jnp.ones(3)})
    with pytest.raises(ValueError):
        load_pytree_like({"a": jnp.ones(4)}, p)
    with pytest.raises(ValueError):
        load_pytree_like({"a": jnp.ones(3), "b": jnp.ones(1)}, p)


def test_recorder_checkpoint_and_resume(tmp_path, key):
    rec = Recorder("t", None, root=str(tmp_path), snapshot=1,
                   require_clean_git=False)
    state = {"params": {"w": jnp.ones(4)}, "step": jnp.asarray(7)}
    rec.record_checkpoint(state, key)
    zero = jax.tree_util.tree_map(jnp.zeros_like, state)
    s2, k2 = rec.resume_checkpoint(zero, jnp.zeros_like(key))
    assert int(s2["step"]) == 7
    np.testing.assert_array_equal(np.asarray(k2), np.asarray(key))
    # snapshot copy exists (snapshot=1 -> every save)
    snaps = [f for f in os.listdir(rec.ckpt_dir) if f.startswith("state_")]
    assert len(snaps) == 1


def test_viztools_plots():
    from color_neus_tpu.utils.viztools import plot_camera_scene, plot_cameras_track
    from color_neus_tpu.ops.transforms import pose_spherical
    c2ws = np.stack([pose_spherical(45.0 * i, -30.0, 3.0) for i in range(8)])
    img = plot_camera_scene(c2ws, 1.0, "test")
    assert img.ndim == 3 and img.shape[2] == 3 and img.dtype == np.uint8
    img2 = plot_cameras_track(c2ws)
    assert img2.ndim == 3 and img2.shape[2] == 3


def test_lpips_stub():
    m = M.LPIPS()
    m.feed(np.zeros((4, 4, 3)), np.ones((4, 4, 3)))
    assert m.avg == 0.0


def test_renderer_and_model_registries():
    """String-TYPE dispatch parity with the reference's builder registries."""
    import color_neus_tpu.models  # noqa: F401 — triggers registration
    import color_neus_tpu.data    # noqa: F401
    from color_neus_tpu.utils.registry import RENDERER, MODEL, DATASET
    from color_neus_tpu.models.builders import build_renderer
    assert "NeuS" in RENDERER and "Color_NeuS" in RENDERER
    assert "NeuS_Trainer" in MODEL
    assert "DTU" in DATASET and "Synthetic" in DATASET
    h = build_renderer({"TYPE": "NeuS",
                        "N_SAMPLES": 8, "N_IMPORTANCE": 4,
                        "UP_SAMPLE_STEPS": 2,
                        "SDF": {"D_HIDDEN": 32, "N_LAYERS": 2, "SKIP_IN": [],
                                "MULTIRES": 2},
                        "COLOR": {"MODE": "idr", "D_IN": 9, "D_HIDDEN": 32,
                                  "N_LAYERS": 1, "MULTIRES_VIEW": 2}})
    params = h.init(jax.random.PRNGKey(0))
    import jax.numpy as _j
    o = _j.asarray([[0.0, 0.0, -2.5]]); d = _j.asarray([[0.0, 0.0, 1.0]])
    out = jax.jit(lambda p: h(p, o, d, _j.asarray([1.5]), _j.asarray([3.5]),
                              perturb_overwrite=0.0))(params)
    assert out["color_fine"].shape == (1, 3)


def test_colmap_text_readers(tmp_path):
    from color_neus_tpu.data import colmap
    with open(os.path.join(tmp_path, "cameras.txt"), "w") as f:
        f.write("# comment\n1 PINHOLE 640 480 500.0 510.0 320.0 240.0\n")
    with open(os.path.join(tmp_path, "images.txt"), "w") as f:
        f.write("# hdr\n1 1.0 0.0 0.0 0.0 0.1 0.2 0.3 1 img.png\n\n")
    with open(os.path.join(tmp_path, "points3D.txt"), "w") as f:
        f.write("5 1.0 2.0 3.0 10 20 30 0.5 1 0\n")
    cams = colmap.read_cameras_text(os.path.join(tmp_path, "cameras.txt"))
    assert cams[1].model == "PINHOLE" and cams[1].params[0] == 500.0
    ims = colmap.read_images_text(os.path.join(tmp_path, "images.txt"))
    assert ims[1].name == "img.png"
    np.testing.assert_allclose(ims[1].tvec, [0.1, 0.2, 0.3])
    pts = colmap.read_points3d_text(os.path.join(tmp_path, "points3D.txt"))
    np.testing.assert_allclose(pts[5].xyz, [1, 2, 3])


def test_nerf_scheduler_and_optimizers():
    from color_neus_tpu.models import trainer as TR
    import dataclasses
    cfg = TR.TrainerConfig(scheduler="NERF", gamma=0.1, decay_steps=1000, lr=1e-3)
    s = TR.lr_schedule(cfg)
    np.testing.assert_allclose(float(s(0)), 1e-3, rtol=1e-6)
    np.testing.assert_allclose(float(s(1000)), 1e-4, rtol=1e-5)
    # optimizer variants construct and update
    for kind in ("adam", "rmsprop", "sgd"):
        c = dataclasses.replace(cfg, optimizer=kind)
        tx = TR.make_optimizer(c)
        params = {"w": jnp.ones(3)}
        st = tx.init(params)
        up, _ = tx.update({"w": jnp.ones(3)}, st, params)
        assert np.isfinite(np.asarray(up["w"])).all()


def test_misc_const_and_format_cfg():
    from color_neus_tpu.utils.misc import CONST, format_cfg, format_args_cfg
    import pytest
    with pytest.raises(AttributeError):
        CONST.PI = 4.0
    assert CONST.PYRENDER_EXTRINSIC[1, 1] == -1.0
    s = format_cfg({"MODEL": {"N_RAYS": 512, "LIST": [1, 2]}})
    assert "MODEL" in s and "N_RAYS" in s and "512" in s

    import types
    assert "cfg" in format_args_cfg(types.SimpleNamespace(cfg="x.yml"))


def test_trainloop_satisfies_trainer_protocol():
    from color_neus_tpu.models.protocol import TrainerModule
    from color_neus_tpu.runtime import TrainLoop
    for m in ("training_step", "validation_step", "compute_loss",
              "on_train_finished", "on_val_finished", "testing_step"):
        assert callable(getattr(TrainLoop, m))
    # runtime_checkable structural check against an instance-shaped dummy
    class _Shim:
        training_step = validation_step = compute_loss = None
        on_train_finished = on_val_finished = testing_step = None

        def __init__(self):
            for m in ("training_step", "validation_step", "compute_loss",
                      "on_train_finished", "on_val_finished", "testing_step"):
                setattr(self, m, lambda *a, **k: None)
    assert isinstance(_Shim(), TrainerModule)
