"""Op-level profile of the bench train step via a perfetto trace.

Runs a few bench-shaped train steps under jax.profiler with
create_perfetto_trace=True, parses the resulting perfetto JSON, and
prints the top ops by total device time (TensorCore tracks), grouped by
HLO op name prefix. This is the ground truth for where the step's time
goes — the tunneled chip's ~30 ms dispatch latency makes wall-clock
decomposition useless.

    python tools/trace_profile.py            # prints JSON summary
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import sys
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_and_trace(trace_dir: str, n_steps: int = 3):
    import jax
    import jax.numpy as jnp
    from color_neus_tpu.models.configs import RendererConfig, ColorConfig
    from color_neus_tpu.models.camera import CameraConfig
    from color_neus_tpu.models import trainer as TR

    n_rays = int(os.environ.get("PROF_N_RAYS", 2048))
    rcfg = RendererConfig(
        kind="color_neus", n_samples=256, n_importance=256, up_sample_steps=4,
        march_acts=os.environ.get("PROF_MARCH_ACTS", "recompute"),
        color=ColorConfig(mode="no_view_dir", d_in=6, multires_view=0),
    )
    H = W = 256
    n_cams = 8
    cfg = TR.TrainerConfig(
        n_rays=n_rays, include_mask=True, mask_rate=(0.5, 0.8),
        iterations=100000, warm_up=5000,
        camera=CameraConfig(H=H, W=W, n_cams=n_cams, pose_mode="6d"),
        renderer=rcfg,
    )
    rng = np.random.RandomState(0)
    key = jax.random.PRNGKey(0)
    state = TR.init_state(key, cfg, init_focal_np=np.asarray([1.2 * W, 1.2 * W]))
    poses = np.tile(np.eye(4, dtype=np.float32), (n_cams, 1, 1))
    for i in range(n_cams):
        z = rng.randn(3)
        z /= np.linalg.norm(z)
        poses[i, :3, 3] = -2.5 * z
        up = np.asarray([0.0, 0.0, 1.0]) if abs(z[2]) < 0.9 else np.asarray([0.0, 1.0, 0.0])
        x = np.cross(up, z)
        x /= np.linalg.norm(x)
        y = np.cross(z, x)
        poses[i, :3, :3] = np.stack([x, y, z], axis=1)
    scene = TR.make_scene(np.zeros(3), 1.0, poses)
    images = jnp.asarray(rng.rand(n_cams, H, W, 3), jnp.float32)
    yy, xx = np.mgrid[0:H, 0:W]
    blob = (((yy - H / 2) ** 2 + (xx - W / 2) ** 2) < (H / 3) ** 2).astype(np.float32)
    masks = jnp.asarray(np.tile(blob[None], (n_cams, 1, 1)))

    step_fn = TR.make_train_step_full(cfg, n_cams, n_cams, donate=False)
    bkey = jax.random.PRNGKey(1)
    state2, aux = step_fn(state, scene, images, masks, bkey)  # compile
    _ = float(aux["loss"])

    jax.profiler.start_trace(trace_dir, create_perfetto_trace=True)
    for _ in range(n_steps):
        state2, aux = step_fn(state, scene, images, masks, bkey)
        _ = float(aux["loss"])
    jax.profiler.stop_trace()
    return n_steps


def parse_perfetto(trace_dir: str, n_steps: int):
    paths = glob.glob(os.path.join(trace_dir, "**", "*perfetto*"),
                      recursive=True)
    if not paths:
        raise SystemExit(f"no perfetto trace found under {trace_dir}")
    path = sorted(paths)[-1]
    op = gzip.open if path.endswith(".gz") else open
    with op(path, "rb") as f:
        data = json.load(f)

    events = data["traceEvents"] if isinstance(data, dict) else data
    # device track pids: find thread names containing 'XLA Op' / TensorCore
    tracks = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") in ("process_name", "thread_name"):
            key = (e.get("pid"), e.get("tid"))
            tracks.setdefault(key, {}).update(e.get("args", {}))

    device_tids = set()
    for (pid, tid), args in tracks.items():
        name = str(args.get("name", ""))
        if "XLA Ops" in name or "TensorCore" in name or "Steps" == name:
            if "XLA Ops" in name:
                device_tids.add((pid, tid))

    agg = defaultdict(float)
    count = defaultdict(int)
    long = {}
    total = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        if device_tids and (e.get("pid"), e.get("tid")) not in device_tids:
            continue
        dur = float(e.get("dur", 0.0))  # microseconds
        name = e.get("name", "?")
        agg[name] += dur
        count[name] += 1
        if name not in long:
            args = e.get("args", {})
            ln = str(args.get("long_name", ""))
            # keep the result shape + opcode — enough to identify the op
            long[name] = ln.split(" fusion(")[0].split(" custom-call(")[0][:160]
        total += dur

    per_step = {k: v / n_steps / 1000.0 for k, v in agg.items()}  # ms/step
    top = sorted(per_step.items(), key=lambda kv: -kv[1])[:40]
    out = {
        "total_device_ms_per_step": round(total / n_steps / 1000.0, 2),
        "top_ops_ms_per_step": [
            {"name": k[:110], "ms": round(v, 3), "calls": count[k] // n_steps,
             "hlo": long.get(k, "")}
            for k, v in top],
    }
    print(json.dumps(out, indent=1))


def main():
    trace_dir = os.environ.get("TRACE_DIR", "/tmp/bench_trace")
    if os.environ.get("PARSE_ONLY"):
        parse_perfetto(trace_dir, int(os.environ.get("N_STEPS", 3)))
        return
    n = run_and_trace(trace_dir)
    parse_perfetto(trace_dir, n)


if __name__ == "__main__":
    main()
