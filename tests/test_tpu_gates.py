"""TPU-only gates (skipped in CI): gradient audit + quality regression.

These run the production bf16 fused kernels on the real chip and assert
numeric/quality thresholds. CI (CPU, 8 virtual devices via conftest)
skips them; the bench environment runs them with RUN_TPU_TESTS=1:

    RUN_TPU_TESTS=1 python -m pytest tests/test_tpu_gates.py -q

Each test shells out to its tool in a FRESH process so the conftest's
forced-CPU jax config does not leak into the TPU run.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.skipif(
    not os.environ.get("RUN_TPU_TESTS"),
    reason="TPU-only gate; set RUN_TPU_TESTS=1 in the bench environment")

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_tool(name: str, env: dict, timeout: int):
    e = dict(os.environ)
    e.update(env)
    out = subprocess.run(
        [sys.executable, os.path.join(_REPO, "tools", name)],
        capture_output=True, text=True, timeout=timeout, cwd=_REPO, env=e)
    assert out.returncode == 0, out.stderr[-3000:]
    return json.loads(out.stdout.strip().splitlines()[-1])


def test_grad_audit_bf16_vs_f32():
    rep = _run_tool("grad_audit.py", {"AUDIT_N_RAYS": "256"}, timeout=2400)
    assert rep["platform"] == "tpu", rep
    for grp, v in rep["groups"].items():
        # bf16 stores + bf16 MXU dots against the f32 XLA oracle: the
        # direction must be solid even where magnitudes drift.
        # Calibrated (VERDICT r3 #5): measured 0.054 @256 rays / 0.095
        # @512 on the worst (sdf) group — 0.11 leaves regression margin
        # without tripping on batch-content variance.
        assert v["min_cos"] > 0.99, (grp, v)
        assert v["max_rel_err"] < 0.11, (grp, v)


@pytest.mark.parametrize("acts", ["save", "recompute"])
def test_native_kernel_shard_map_on_chip(acts):
    """Mosaic-compiled pallas_call under jax.shard_map on a 1-device
    Mesh of the real chip — the exact composition real multi-chip uses
    (the CPU suite only covers it in interpret mode). Asserts loss and
    post-update parameter equality with the unsharded fused step."""
    rep = _run_tool("tpu_shardmap_check.py", {"SMC_MARCH_ACTS": acts},
                    timeout=2400)
    assert rep["pass"], rep


def test_eval_fused_paths_match_xla():
    """extract_vertex_colors (fused point pipeline, both color modes)
    and evaluate_sdf_grid (fused f32 SDF kernel) vs their XLA paths on
    the chip — the CPU suite never executes the TPU-only branches."""
    rep = _run_tool("tpu_eval_fused_check.py", {}, timeout=2400)
    assert rep["pass"], rep


def test_quality_gate_short():
    rep = _run_tool("quality_gate.py",
                    {"QG_STEPS": "200", "QG_RES": "64"}, timeout=3600)
    assert rep["pass"], rep
