"""Experiment recorder: exp dirs, cfg dump, checkpoint/resume, text dumps.

Same surface as the reference Recorder (lib/utils/recorder.py:27-178):
  exp/{exp_id}_{timestamp}/
    dump_cfg.yaml  log/  checkpoints/  viz_image/  meshes/
Checkpoints include the PRNG key (replacing the RandomState pickle) and
are snapshot-copied every `snapshot` saves. Resume reloads dump_cfg.yaml
(train.py:104-107 behavior) via find_resume_cfg.
"""

from __future__ import annotations

import os
import shutil
import time

import numpy as np

from color_neus_tpu.utils.checkpoint import save_pytree, load_pytree_like
from color_neus_tpu.utils.logger import logger


class Recorder:
    def __init__(self, exp_id: str, cfg, root: str = "./exp",
                 resume_path: str | None = None, snapshot: int = 50,
                 require_clean_git: bool = True, timestamp: str | None = None):
        self.exp_id = exp_id
        self.snapshot = snapshot
        self._n_saves = 0

        # reference enforces a clean tree for named exps (recorder.py:39);
        # 'default' and eval runs are exempt, and require_clean_git=False
        # (train.py --allow_dirty) opts out
        if (require_clean_git and exp_id not in ("default", "eval")
                and not exp_id.startswith("eval_")):
            if _git_dirty():
                raise RuntimeError(
                    f"git tree dirty; commit before running named exp "
                    f"'{exp_id}' (or pass --allow_dirty)")

        if resume_path is not None:
            self.exp_path = resume_path
        else:
            timestamp = timestamp or time.strftime("%Y_%m%d_%H%M_%S")
            self.exp_path = os.path.join(root, f"{exp_id}_{timestamp}")
        for sub in ("log", "checkpoints", "viz_image", "meshes"):
            os.makedirs(os.path.join(self.exp_path, sub), exist_ok=True)

        self.log_path = os.path.join(self.exp_path, "log")
        self.ckpt_dir = os.path.join(self.exp_path, "checkpoints")
        self.viz_image_dir = os.path.join(self.exp_path, "viz_image")
        self.mesh_dir = os.path.join(self.exp_path, "meshes")
        logger.set_log_file(os.path.join(self.log_path, "train.log"))

        if resume_path is None and cfg is not None:
            self.dump_cfg(cfg)

    # -- config ------------------------------------------------------------
    def dump_cfg(self, cfg):
        cfg.dump_yaml(os.path.join(self.exp_path, "dump_cfg.yaml"))

    @staticmethod
    def find_resume_cfg(resume_path: str) -> str:
        return os.path.join(resume_path, "dump_cfg.yaml")

    # -- checkpoints --------------------------------------------------------
    def ckpt_path(self) -> str:
        return os.path.join(self.ckpt_dir, "state.npz")

    def record_checkpoint(self, state, key) -> str:
        """Save train state + PRNG key; periodic immutable snapshots."""
        tree = {"state": state, "prng_key": key}
        path = self.ckpt_path()
        save_pytree(path, tree)
        self._n_saves += 1
        if self.snapshot > 0 and self._n_saves % self.snapshot == 0:
            step = int(np.asarray(state["step"]))
            shutil.copy2(path, os.path.join(self.ckpt_dir, f"state_{step:08d}.npz"))
        return path

    def resume_checkpoint(self, state_template, key_template):
        tree = load_pytree_like({"state": state_template, "prng_key": key_template},
                                self.ckpt_path())
        return tree["state"], tree["prng_key"]

    # -- text dumps ----------------------------------------------------------
    def record_loss(self, loss_metric, step_idx: int, comment: str = ""):
        path = os.path.join(self.log_path, f"{comment}losses.txt")
        with open(path, "a") as f:
            f.write(f"step {step_idx}: {loss_metric}\n")

    def record_metric(self, metrics: list, step_idx: int, comment: str = ""):
        path = os.path.join(self.log_path, f"{comment}metrics.txt")
        with open(path, "a") as f:
            f.write(f"step {step_idx}: " + " | ".join(str(m) for m in metrics) + "\n")


def _git_dirty() -> bool:
    import subprocess
    try:
        out = subprocess.run(["git", "status", "--porcelain"],
                             capture_output=True, text=True, timeout=10)
        return bool(out.stdout.strip())
    except Exception:
        return False


class ScalarWriter:
    """Scalar sink: tensorboardX if available, always a jsonl file."""

    def __init__(self, log_dir: str):
        os.makedirs(log_dir, exist_ok=True)
        self._jsonl = open(os.path.join(log_dir, "scalars.jsonl"), "a")
        try:
            from tensorboardX import SummaryWriter
            self._tb = SummaryWriter(log_dir)
        except Exception:
            self._tb = None

    def _is_master(self):
        try:
            import jax
            return jax.process_index() == 0
        except Exception:
            return True

    def add_scalar(self, tag: str, value: float, step: int):
        if not self._is_master():  # multi-host: rank 0 only (@master_only parity)
            return
        import json
        self._jsonl.write(json.dumps({"tag": tag, "value": float(value), "step": int(step)}) + "\n")
        if self._tb is not None:
            self._tb.add_scalar(tag, value, step)

    def add_image(self, tag: str, img_hwc, step: int):
        if not self._is_master():
            return
        if self._tb is not None:
            self._tb.add_image(tag, np.asarray(img_hwc), step, dataformats="HWC")

    def flush(self):
        self._jsonl.flush()
        if self._tb is not None:
            self._tb.flush()

    def close(self):
        self.flush()
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
