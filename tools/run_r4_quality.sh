#!/usr/bin/env bash
# Round-4 quality queue (serial; single-tenant chip). Post-precision-pin
# re-measures, the 1000-step A/B triad locating the r3 0.53 dB gap, then
# the 5k-step fused-vs-f32 A/B (VERDICT r3 #1). Artifacts in reports/r4/.
set -u
cd "$(dirname "$0")/.."
OUT=reports/r4
mkdir -p "$OUT"

run() { # name timeout env... -- cmd...
  local name="$1" to="$2"; shift 2
  echo "=== $name"
  local envs=()
  while [ "$1" != "--" ]; do envs+=("$1"); shift; done
  shift
  if env "${envs[@]}" timeout "$to" "$@" > "$OUT/.$name.out" 2> "$OUT/.$name.err"; then
    tail -n 1 "$OUT/.$name.out" | tee "$OUT/$name.json"
  else
    echo "FAILED rc=$? ($name)"; tail -5 "$OUT/.$name.err"
  fi
  rm -f "$OUT/.$name.out" "$OUT/.$name.err"
}

# clean re-measures with the precision-pinned kernels (one code version)
run bench_pinned_softplus 2400 NOOP=1 -- python bench.py
run bench_pinned_relu 2400 BENCH_SWEEP_ACT=relu -- python bench.py
run eval_fused_pinned 2400 NOOP=1 -- python tools/tpu_eval_fused_check.py

# 1000-step quality triad: fused / fused+f32 sweeps / f32-XLA oracle
run qg1k_fused 3600 QG_STEPS=1000 QG_FUSED=on -- python tools/quality_gate.py
run qg1k_fused_f32sweeps 3600 QG_STEPS=1000 QG_FUSED=on QG_SWEEP_DTYPE=float32 -- python tools/quality_gate.py
run qg1k_off 3600 QG_STEPS=1000 QG_FUSED=off -- python tools/quality_gate.py

# the 5k A/B (VERDICT r3 #1 done-criterion)
run qg5k_fused 7200 QG_STEPS=5000 QG_FUSED=on -- python tools/quality_gate.py
run qg5k_off 7200 QG_STEPS=5000 QG_FUSED=off -- python tools/quality_gate.py
echo "=== done"
