"""Real 2-process jax.distributed smoke test on CPU.

The dryrun_multichip path tests the sharding layout on one process with
8 virtual devices; this test goes further and runs TWO OS processes with
jax.distributed.initialize (the --distributed code path of train.py),
a 4-device global mesh (2 local devices per host), one sharded training
step, and the rank-0-gated scalar writer. Multi-host semantics without a
TPU slice — the idiomatic JAX substitute (SURVEY §4).
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_distributed_step(tmp_path):
    port = _free_port()
    coordinator = f"127.0.0.1:{port}"
    worker = os.path.join(REPO, "tests", "_mp_worker.py")
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    # the workers set their own XLA_FLAGS device count; scrub the parent's
    env.pop("XLA_FLAGS", None)

    procs = [
        subprocess.Popen(
            [sys.executable, worker, coordinator, "2", str(i), str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-4000:]}"

    losses = []
    for i in range(2):
        with open(tmp_path / f"loss_{i}.txt") as f:
            losses.append(float(f.read()))
    # replicated output: both processes must see the identical loss
    np.testing.assert_allclose(losses[0], losses[1], rtol=0, atol=0)

    # ScalarWriter is master-only: rank 0 wrote scalars, rank 1 did not
    import json
    with open(tmp_path / "tb_0" / "scalars.jsonl") as f:
        rows = [json.loads(l) for l in f if l.strip()]
    assert rows and rows[0]["tag"] == "loss"
    r1 = tmp_path / "tb_1" / "scalars.jsonl"
    assert (not r1.exists()) or r1.read_text().strip() == ""

    # phase 2+3 (in-worker asserts cover resume bitwise-equality; here:
    # the sharded run, render, and mesh agree EXACTLY across ranks)
    runs = [json.load(open(tmp_path / f"run_{i}.json")) for i in range(2)]
    assert runs[0]["losses"] == runs[1]["losses"]
    assert len(runs[0]["losses"]) == 6
    assert runs[0] == runs[1]
    assert runs[0]["n_verts"] > 0 and runs[0]["n_tris"] > 0
