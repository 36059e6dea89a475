"""Experiment runtime: the train/eval loops gluing data, model, recorder.

Counterpart of the reference's train.py:37-98 main_worker and the
NeuS_Trainer validation hooks. One process drives all local devices;
batches of images are sampled host-side (cheap, once per step) while ray
sampling and everything after is on-device inside the jitted step.
"""

from __future__ import annotations

import os
import time

import numpy as np
import jax
import jax.numpy as jnp

from color_neus_tpu.data import create_dataset
from color_neus_tpu.models import trainer as TR
from color_neus_tpu.models.trainer import TrainerConfig, trainer_config_from_cfg
from color_neus_tpu.ops import mesh as mesh_ops
from color_neus_tpu.utils.logger import logger
from color_neus_tpu.utils.metrics import LossMetric, PSNR, SSIM
from color_neus_tpu.utils.recorder import Recorder, ScalarWriter


def depth_colormap(depth: np.ndarray) -> np.ndarray:
    """HOT-style colormap for depth viz (viztools.py:158-162 capability)."""
    d = depth - depth.min()
    d = d / max(float(d.max()), 1e-8)
    r = np.clip(3 * d, 0, 1)
    g = np.clip(3 * d - 1, 0, 1)
    b = np.clip(3 * d - 2, 0, 1)
    return (np.stack([r, g, b], axis=-1) * 255).astype(np.uint8)


class TrainLoop:
    def __init__(self, cfg, exp_id: str = "default", resume: str | None = None,
                 snapshot: int = 50, mesh_backend: str = "auto",
                 require_clean_git: bool = True):
        self.cfg = cfg
        self.exp_id = exp_id
        self.mesh_backend = mesh_backend

        seed = cfg["TRAIN"].get("MANUAL_SEED", 1)
        self.key = jax.random.PRNGKey(seed)
        # training-stream base key: derived from the seed alone (NOT from
        # the evolving self.key) so a resumed run replays the exact same
        # per-step streams as a straight run — the jitted step folds in
        # the in-state step counter
        self.base_key = jax.random.fold_in(jax.random.PRNGKey(seed), 0x5EED)

        # dataset
        self.dataset = create_dataset(cfg["DATASET"], cfg.get("DATA_PRESET", {}))
        init = self.dataset.init_data()
        self.H, self.W = init["H"], init["W"]
        self.n_imgs = init["n_imgs"]
        self.scale_mats = init["scale_mats_np"]
        self.bbox_min = init["object_bbox_min"]
        self.bbox_max = init["object_bbox_max"]

        # trainer config + state
        self.tcfg: TrainerConfig = trainer_config_from_cfg(cfg, self.H, self.W, self.n_imgs)
        self.key, k_init = jax.random.split(self.key)
        self.state = TR.init_state(k_init, self.tcfg, init_focal_np=init["focal"])
        self.scene = TR.make_scene(init["origin"], init["radius"], init["poses"])

        # data on device (load once — get_all_init semantics, dtu.py:160)
        all_data = self.dataset.load_all()
        self.images = jnp.asarray(all_data["images"])
        self.masks = (jnp.asarray(all_data["masks"])
                      if all_data["masks"] is not None else None)

        # runtime
        from color_neus_tpu.utils.misc import format_cfg
        logger.info("config:%s", format_cfg(cfg.to_dict()
                                            if hasattr(cfg, "to_dict") else cfg))
        self.recorder = Recorder(exp_id, cfg, resume_path=resume, snapshot=snapshot,
                                 require_clean_git=require_clean_git)
        self.writer = ScalarWriter(os.path.join(self.recorder.exp_path, "tensorboard"))
        self.loss_metric = LossMetric()
        self.psnr_metric = PSNR()
        self.ssim_metric = SSIM()

        pretrained = cfg["MODEL"].get("PRETRAINED")
        if pretrained:
            from color_neus_tpu.utils.checkpoint import load_pytree_like
            tree = load_pytree_like({"state": self.state, "prng_key": self.key}, pretrained)
            self.state = tree["state"]
            logger.info("loaded pretrained state from %s", pretrained)

        if resume:
            self.state, self.key = self.recorder.resume_checkpoint(self.state, self.key)
            logger.info("resumed at step %d", int(self.state["step"]))

        # multi-device: thread the mesh through the trainer config so the
        # jitted step shards per-ray compute (params replicated)
        n_dev = len(jax.devices())
        if n_dev > 1 and self.tcfg.n_rays % n_dev == 0:
            from color_neus_tpu.parallel import make_mesh, with_mesh
            self.tcfg = with_mesh(self.tcfg, make_mesh())
            logger.info("sharding rays over %d devices", n_dev)
        # bundle LOG_INTERVAL steps per dispatch when the event intervals
        # line up — one tunnel round-trip per log line instead of per step
        log_int = max(self.cfg["TRAIN"].get("LOG_INTERVAL", 10), 1)
        t = self.cfg["TRAIN"]
        intervals = [t.get("SAVE_INTERVAL", 10000), t.get("VIZ_IMAGE_INTERVAL", 10000),
                     t.get("VIZ_MESH_INTERVAL", 10000), t["ITERATIONS"]]
        self.k_steps = log_int if all(i % log_int == 0 for i in intervals) else 1
        if self.k_steps > 1:
            self.step_fn = TR.make_train_multi_step(
                self.tcfg, self.n_imgs, self.cfg["TRAIN"]["BATCH_SIZE"], self.k_steps)
        else:
            self.step_fn = TR.make_train_step_full(
                self.tcfg, self.n_imgs, self.cfg["TRAIN"]["BATCH_SIZE"])
        self._chunk_fn = None

    # ------------------------------------------------------------------
    def run(self, profile_dir: str | None = None, stop_after: int | None = None):
        """Train to TRAIN.ITERATIONS; stop_after interrupts gracefully at
        that step (checkpointing) — the resume path continues exactly.

        SIGTERM/SIGINT also interrupt gracefully: the loop checkpoints at
        the next step boundary and exits cleanly (crash = rerun with
        --resume, the reference's recovery model, train.py:54-55)."""
        import signal
        interrupted = {"flag": False}

        def _on_signal(signum, frame):
            interrupted["flag"] = True
            logger.warning("signal %d: will checkpoint and stop at the "
                           "next step boundary", signum)

        prev_handlers = {}
        for sig in (signal.SIGTERM, signal.SIGINT):
            try:
                prev_handlers[sig] = signal.signal(sig, _on_signal)
            except ValueError:  # non-main thread
                pass

        t = self.cfg["TRAIN"]
        iterations = t["ITERATIONS"]
        log_int = t.get("LOG_INTERVAL", 10)
        save_int = t.get("SAVE_INTERVAL", 10000)
        viz_img_int = t.get("VIZ_IMAGE_INTERVAL", 10000)
        viz_mesh_int = t.get("VIZ_MESH_INTERVAL", 10000)

        start = int(self.state["step"])
        logger.info("training %s: steps %d..%d (%d steps/dispatch)",
                    self.exp_id, start, iterations, self.k_steps)
        t0 = time.time()
        rays_done = 0
        if profile_dir:
            jax.profiler.start_trace(profile_dir)
        # progress bar (etqdm parity: rank 0 only, silent when not a tty)
        pbar = None
        try:
            import sys as _sys
            if _sys.stderr.isatty() and jax.process_index() == 0:
                from tqdm import tqdm
                pbar = tqdm(total=iterations, initial=start, unit="step")
        except Exception:
            pbar = None
        step = start
        while step < iterations:
            aux = self.training_step()
            step += self.k_steps
            rays_done += self.tcfg.n_rays * self.k_steps
            if pbar is not None:
                pbar.update(self.k_steps)
            if profile_dir and step - start >= 2 * self.k_steps:
                jax.profiler.stop_trace()
                logger.info("profile trace written to %s", profile_dir)
                profile_dir = None

            if step % log_int == 0 or step >= iterations:
                aux_np = {k: float(v) for k, v in aux.items()}
                self.loss_metric.feed(aux_np, 1)
                for k, v in aux_np.items():
                    self.writer.add_scalar(k, v, step)
                dt = time.time() - t0
                logger.info("step %d | loss %.5f | psnr %.2f | %.0f rays/s",
                            step, aux_np["loss"], aux_np["psnr"],
                            rays_done / max(dt, 1e-9))

            # camera-pose plots when poses are being refined
            # (NeuS_Trainer.py:202-207 cadence: every 50 log intervals)
            cam = self.tcfg.camera
            if (cam.learn_r or cam.learn_t) and step % (log_int * 50) == 0:
                from color_neus_tpu.utils.viztools import plot_camera_scene, plot_cameras_track
                from color_neus_tpu.models.camera import pose_apply
                c2ws = np.asarray(pose_apply(self.state["params"]["pose"], cam,
                                             self.scene["init_c2w"],
                                             jnp.arange(self.n_imgs)))
                self.writer.add_image("poses", plot_camera_scene(
                    c2ws, float(self.scene["radius"]), f"step_{step}"), step)
                self.writer.add_image("poses_track", plot_cameras_track(c2ws), step)

            if step % save_int == 0 or step >= iterations:
                self.recorder.record_checkpoint(self.state, self.key)
                self.on_train_finished(step)

            if step % viz_img_int == 0 and step < iterations:
                self.validation_step(step)
            if step % viz_mesh_int == 0 and step < iterations:
                self.validate_mesh(step, resolution=512)

            if (stop_after is not None and step >= stop_after) or interrupted["flag"]:
                self.recorder.record_checkpoint(self.state, self.key)
                logger.info("stopped early at step %d (checkpointed)", step)
                break

        if pbar is not None:
            pbar.close()
        for sig, h in prev_handlers.items():
            import signal as _sig
            _sig.signal(sig, h)
        self.writer.flush()
        logger.info("training done.")

    # ------------------------------------------------------------------
    # Trainer lifecycle (models/protocol.py TrainerModule; the reference
    # names from model_abstraction.py:4-37 mapped onto the functional
    # runtime)
    # ------------------------------------------------------------------
    def training_step(self) -> dict:
        """One (bundled) jitted optimization step. The constant base key
        is seed-derived and resume-stable; the jitted step folds in the
        in-state step counter — no per-step host ops."""
        self.state, aux = self.step_fn(self.state, self.scene, self.images,
                                       self.masks, self.base_key)
        return aux

    def compute_loss(self, aux: dict) -> float:
        """Scalar loss of a step's aux (assembly itself is inside the
        jitted step — models/trainer.py, NeuS_Trainer.py:129-171)."""
        return float(aux["loss"])

    def on_train_finished(self, step: int) -> None:
        self.recorder.record_loss(self.loss_metric, step, comment="train-")
        self.loss_metric.reset()

    def validation_step(self, step: int) -> None:
        self.validate_image(step)

    def on_val_finished(self, step: int) -> None:
        self.recorder.record_metric([self.psnr_metric, self.ssim_metric], step,
                                    comment="val-")
        logger.info("val @%d: %s %s", step, self.psnr_metric, self.ssim_metric)
        self.psnr_metric.reset()
        self.ssim_metric.reset()

    def testing_step(self, step: int, recon_res: int = 512):
        """Mesh extraction entry (NeuS_Trainer.testing_step:321-322)."""
        return self.validate_mesh(step, resolution=recon_res)

    # ------------------------------------------------------------------
    def validate_image(self, step: int):
        """Render one random view; dump [GT | render | depth] strip and
        feed PSNR/SSIM (NeuS_Trainer.validate_image 216-277).

        The key is folded from the seed-derived base key + step (not drawn
        from the evolving self.key), so a resumed run renders the same
        validation cameras/noise as an uninterrupted one."""
        k_val = jax.random.fold_in(jax.random.fold_in(self.base_key, 0xA11D), step)
        k_pick, k_render = jax.random.split(k_val)
        cam_id = int(jax.random.randint(k_pick, (), 0, self.n_imgs))
        if self._chunk_fn is None:
            self._chunk_fn = TR.make_render_image_fn(self.tcfg)
        rgb, depth = TR.render_image(self.state["params"], self.scene, self.tcfg,
                                     cam_id, self.H, self.W, k_render,
                                     chunk_fn=self._chunk_fn)
        gt = np.asarray(self.images[cam_id])
        strip = np.hstack([
            (gt * 255).astype(np.uint8),
            (np.clip(rgb, 0, 1) * 255).astype(np.uint8),
            depth_colormap(depth),
        ])
        try:
            import imageio
            imageio.imwrite(os.path.join(self.recorder.viz_image_dir,
                                         f"img_{step}.png"), strip)
        except Exception as e:  # viz is best-effort
            logger.warning("image dump failed: %s", e)
        self.psnr_metric.feed(rgb, gt)
        self.ssim_metric.feed(rgb, gt)
        self.on_val_finished(step)

    # ------------------------------------------------------------------
    def validate_mesh(self, step: int, resolution: int = 64, threshold: float = 0.0,
                      world_space: bool = True):
        """Extract mesh + vertex colors; write PLYs
        (NeuS_Trainer.validate_mesh 279-307)."""
        params = self.state["params"]["renderer"]
        verts, tris = mesh_ops.extract_geometry(
            params, self.tcfg.renderer, self.bbox_min, self.bbox_max,
            resolution, threshold)
        logger.info("mesh @%d: %d verts, %d tris", step, len(verts), len(tris))
        if len(verts) == 0:
            return None
        colors = mesh_ops.extract_vertex_colors(params, self.tcfg.renderer, verts)
        verts_out = verts
        if world_space:
            verts_out = verts * self.scale_mats[0][0, 0] + self.scale_mats[0][:3, 3][None]
        mesh_ops.write_ply(os.path.join(self.recorder.mesh_dir,
                                        f"{step:08d}_mesh.ply"), verts_out, tris)
        mesh_ops.write_ply(os.path.join(self.recorder.mesh_dir,
                                        f"{step:08d}_color.ply"), verts_out, tris, colors)
        return verts_out, tris, colors
