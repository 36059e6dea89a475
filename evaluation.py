"""Evaluation entry point: mesh extraction from a trained checkpoint.

Usage (reference-compatible, README.md:88):
    python evaluation.py --cfg config/Color_NeuS_dtu.yml -obj 83 \
        -rr 512 --reload exp/.../checkpoints/state.npz
"""

from __future__ import annotations

import argparse


def parse_args():
    p = argparse.ArgumentParser("color_neus_tpu evaluation")
    p.add_argument("--cfg", type=str, required=True)
    p.add_argument("-obj", "--obj_id", type=str, default=None)
    p.add_argument("--reload", type=str, required=True, help="checkpoint npz")
    p.add_argument("-rr", "--recon_res", type=int, default=512)
    p.add_argument("-g", "--gpu_id", type=str, default=None)
    p.add_argument("-b", "--batch_size", type=int, default=None)
    p.add_argument("--exp_id", type=str, default=None)
    p.add_argument("--data_root", type=str, default=None)
    return p.parse_args()


def main():
    arg = parse_args()
    from color_neus_tpu.utils.config import get_config
    from color_neus_tpu.runtime import TrainLoop
    from color_neus_tpu.utils.logger import logger

    cfg = get_config(arg.cfg, arg)  # data_root/reload applied inside; frozen
    exp_id = arg.exp_id or f"eval_{cfg['MODEL']['RENDERER']['TYPE']}_{arg.obj_id}"
    loop = TrainLoop(cfg, exp_id=exp_id)
    # testing_step = mesh extraction (protocol.TrainerModule lifecycle;
    # reference NeuS_Trainer.testing_step:321-322)
    out = loop.testing_step(int(loop.state["step"]), recon_res=arg.recon_res)
    if out is not None:
        logger.info("meshes written to %s", loop.recorder.mesh_dir)


if __name__ == "__main__":
    main()
