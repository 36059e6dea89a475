"""Interleaved A/B benchmark: two bench configs timed in ONE process.

The tunneled bench chip's effective clock drifts by several percent
between separate invocations (round-4 logs: the same binary measured
18,393 then 17,032 rays/s an hour apart), which swamps the ~2% deltas
the remaining perf levers are worth. This tool compiles both arms once,
then alternates timed dispatches A,B,A,B,... so both arms sample the
same chip state, and reports per-arm medians plus the paired per-round
ratio (the drift-immune statistic).

    AB_KEY=sweep_act AB_A=softplus AB_B=relu python tools/bench_ab.py
    AB_KEY=bwd_prec  AB_A=bf16     AB_B=f32stash python tools/bench_ab.py

AB_KEY is a build_bench() keyword: sweep_act | bwd_prec | march_acts |
march_tile | ray_chunk | thin_dots. AB_ROUNDS (default 8) alternation
rounds.
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import build_bench  # noqa: E402


def main():
    key = os.environ.get("AB_KEY", "sweep_act")
    a_val = os.environ.get("AB_A", "softplus")
    b_val = os.environ.get("AB_B", "relu")
    rounds = int(os.environ.get("AB_ROUNDS", 8))
    n_rays = int(os.environ.get("BENCH_N_RAYS", 2048))
    k_steps = int(os.environ.get("BENCH_K_STEPS", 40))

    def _cast(v):
        return int(v) if v.lstrip("-").isdigit() else v

    arms = {}
    for name, val in (("A", a_val), ("B", b_val)):
        step_fn, args, _flops = build_bench(
            n_rays, k_steps, donate=False, **{key: _cast(val)})
        state, scene, images, masks, base_key = args
        _st, aux = step_fn(state, scene, images, masks, base_key)  # compile
        _ = float(aux["loss"])
        arms[name] = (step_fn, args)

    def _one(name):
        step_fn, (state, scene, images, masks, base_key) = arms[name]
        t0 = time.perf_counter()
        _st, aux = step_fn(state, scene, images, masks, base_key)
        _ = float(aux["loss"])
        return time.perf_counter() - t0

    _one("A"), _one("B")  # one warm round each, untimed
    ta, tb = [], []
    for _i in range(rounds):
        ta.append(_one("A"))
        tb.append(_one("B"))

    ra = n_rays * k_steps / np.asarray(ta)
    rb = n_rays * k_steps / np.asarray(tb)
    ratio = rb / ra  # paired: each B against the A of the same round
    print(json.dumps({
        "key": key, "A": a_val, "B": b_val, "rounds": rounds,
        "n_rays": n_rays, "k_steps": k_steps,
        "A_rays_per_s_median": round(float(np.median(ra)), 1),
        "B_rays_per_s_median": round(float(np.median(rb)), 1),
        "B_over_A_median": round(float(np.median(ratio)), 4),
        "B_over_A_iqr": [round(float(np.percentile(ratio, 25)), 4),
                         round(float(np.percentile(ratio, 75)), 4)],
    }))


if __name__ == "__main__":
    main()
