#!/usr/bin/env bash
# Round-4 chip queue, fourth session: post-precision-fix measurements.
#   1. headline bench on the new code (has_dirs_c + lin0-HIGHEST)
#   2. drift-immune interleaved A/Bs: relu sweeps, f32stash cost
#   3. quality value of f32stash at 1k (gap-closer candidate: the
#      fused-vs-off 0.74 dB gap at 1k is dominated by bf16 stash
#      stores, since BOTH paths' GEMMs round operands to bf16)
#   4. true-f32 oracle arm (off + highest)
#   5. 512^3 extraction timing under the now-true-f32 grid eval
#   6. fresh per-op step trace
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

run bench_r4_main 1800 -- python bench.py
run ab_sweep_relu 2400 AB_KEY=sweep_act AB_A=softplus AB_B=relu -- python tools/bench_ab.py
run ab_prec_f32stash 2400 AB_KEY=bwd_prec AB_A=bf16 AB_B=f32stash -- python tools/bench_ab.py
run qg1k_fused_f32stash 3600 QG_STEPS=1000 QG_FUSED=on QG_PREC=f32stash -- python tools/quality_gate.py
# rerun the 5k fused arm on the FINAL round-4 code (the queue3 run
# predates the precision pins, so its A/B partners differ in code)
run qg5k_fused_final 7200 QG_STEPS=5000 QG_FUSED=on -- python tools/quality_gate.py
# the gap-closer at the horizon where the gap compounds (fused 46.93
# vs off 49.67 at 5k): f32 activation stores, bf16 dots
run qg5k_fused_f32stash 7200 QG_STEPS=5000 QG_FUSED=on QG_PREC=f32stash -- python tools/quality_gate.py
run qg1k_off_highest 5400 QG_STEPS=1000 QG_FUSED=off QG_MATMUL=highest -- python tools/quality_gate.py
run extract512_timing 3600 -- python tools/mesh_extraction_timing.py
run trace_r4 1800 -- python tools/trace_profile.py
echo "=== $(date -u +%H:%M:%S) queue4 done"
