#!/usr/bin/env bash
# Round-4 chip queue, third session (serial; single-tenant chip).
# Quality runs FIRST this time: queue2's gate block crashed in
# grad_audit and wedged the chip before the 5k A/B (VERDICT r3 #1
# done-criterion) could start. Gates run after, with stderr preserved
# on failure (run_tpu_gates.sh keeps .NAME.err now).
set -u
cd "$(dirname "$0")/.."
OUT=reports/r4
mkdir -p "$OUT"

run() { # name timeout env... -- cmd...
  local name="$1" to="$2"; shift 2
  echo "=== $(date -u +%H:%M:%S) $name"
  local envs=()
  while [ "$1" != "--" ]; do envs+=("$1"); shift; done
  shift
  if env "${envs[@]}" timeout "$to" "$@" > "/tmp/.$name.out" 2> "/tmp/.$name.err"; then
    tail -n 1 "/tmp/.$name.out" | tee "$OUT/$name.json"
  else
    echo "FAILED rc=$? ($name)"; tail -5 "/tmp/.$name.err"
  fi
}

# 1000-step quality triad: fused / fused+f32 sweeps / f32-XLA oracle
run qg1k_fused 3600 QG_STEPS=1000 QG_FUSED=on -- python tools/quality_gate.py
run qg1k_fused_f32sweeps 3600 QG_STEPS=1000 QG_FUSED=on QG_SWEEP_DTYPE=float32 -- python tools/quality_gate.py
run qg1k_off 3600 QG_STEPS=1000 QG_FUSED=off -- python tools/quality_gate.py

# the 5k A/B (VERDICT r3 #1 done-criterion)
run qg5k_fused 7200 QG_STEPS=5000 QG_FUSED=on -- python tools/quality_gate.py
run qg5k_off 7200 QG_STEPS=5000 QG_FUSED=off -- python tools/quality_gate.py
run qg5k_fused_f32sweeps 7200 QG_STEPS=5000 QG_FUSED=on QG_SWEEP_DTYPE=float32 -- python tools/quality_gate.py

# gate artifact regeneration with the fixed tools (VERDICT r3 #4)
bash tools/run_tpu_gates.sh reports/tpu_gates_r4

echo "=== $(date -u +%H:%M:%S) queue done"
