"""Training entry point.

Usage (reference-compatible CLI, README.md:54-72):
    python train.py --cfg config/Color_NeuS_dtu.yml -obj 83 --exp_id my_exp
    python train.py --resume exp/my_exp_...           # resume a run

TPU-native runtime: the dataset is loaded once to host RAM, moved
wholesale into device HBM, and every training step — ray sampling,
rendering, loss, backward, clip, Adam — is one jitted XLA computation.
With more than one device, rays are sharded over the mesh
(color_neus_tpu.parallel) and gradients are psum'd by XLA.
"""

from __future__ import annotations

import argparse


def parse_args():
    p = argparse.ArgumentParser("color_neus_tpu trainer")
    p.add_argument("--cfg", type=str, default=None, help="config yaml path")
    p.add_argument("--exp_id", type=str, default="default")
    p.add_argument("-obj", "--obj_id", type=str, default=None)
    p.add_argument("--resume", type=str, default=None, help="exp dir to resume")
    p.add_argument("--reload", type=str, default=None, help="checkpoint to load")
    p.add_argument("-b", "--batch_size", type=int, default=None)
    p.add_argument("-g", "--gpu_id", type=str, default=None,
                   help="accepted for CLI parity; device selection is JAX's")
    p.add_argument("--snapshot", type=int, default=50)
    p.add_argument("--iterations", type=int, default=None,
                   help="override TRAIN.ITERATIONS (for smoke runs)")
    p.add_argument("--data_root", type=str, default=None)
    p.add_argument("--profile", type=str, default=None,
                   help="write a jax.profiler trace of ~12 steps to this dir")
    p.add_argument("--distributed", action="store_true",
                   help="multi-host: call jax.distributed.initialize() "
                        "(coordinator/rank from env, the standard JAX way)")
    p.add_argument("--allow_dirty", action="store_true",
                   help="skip the clean-git-tree check for named exp_ids "
                        "(the reference enforces it, recorder.py:39)")
    return p.parse_args()


def main():
    arg = parse_args()

    import jax
    from color_neus_tpu.utils.config import get_config
    from color_neus_tpu.utils.logger import logger
    from color_neus_tpu.utils.recorder import Recorder
    from color_neus_tpu.models.builders import build_model

    # overrides (batch size, reload, obj id, iterations, data root) are
    # applied inside get_config; the returned cfg is frozen
    if arg.resume:
        cfg = get_config(Recorder.find_resume_cfg(arg.resume), arg)
    else:
        assert arg.cfg is not None, "--cfg required (or --resume)"
        cfg = get_config(arg.cfg, arg)

    if arg.distributed:
        jax.distributed.initialize()
        logger.info("distributed: process %d/%d", jax.process_index(),
                    jax.process_count())
    logger.info("devices: %s", jax.devices())
    # cfg.MODEL.TYPE selects the trainer through the MODEL registry
    # (reference build_model_init, lib/utils/builder.py:320-360)
    model = build_model(cfg, exp_id=arg.exp_id, resume=arg.resume,
                        snapshot=arg.snapshot,
                        require_clean_git=not arg.allow_dirty)
    model.run(profile_dir=arg.profile)


if __name__ == "__main__":
    main()
