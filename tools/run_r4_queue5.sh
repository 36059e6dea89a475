#!/usr/bin/env bash
# Round-4 chip queue, fifth session: qualify the candidate production
# config (march_bwd_precision=f32stash + sweep_activation=relu) before
# flipping defaults. f32stash measured FREE (+0.5%, ab_prec_f32stash)
# and closes the 1k quality gap to 0.03 dB of the off-path
# (qg1k_fused_f32stash); relu sweeps measured +1.5% (ab_sweep_relu)
# but their quality cost is unmeasured.
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

# quality of relu placement on top of the gap-closer
run qg1k_f32stash_relu 3600 QG_STEPS=1000 QG_FUSED=on QG_PREC=f32stash QG_SWEEP_ACT=relu -- python tools/quality_gate.py
# gradient audit in the candidate production mode
run grad_audit_f32stash 2400 AUDIT_N_RAYS=256 AUDIT_PREC=f32stash -- python tools/grad_audit.py
# headline bench at the candidate production config
run bench_f32stash_relu 1800 BENCH_BWD_PREC=f32stash BENCH_SWEEP_ACT=relu -- python bench.py
run bench_f32stash 1800 BENCH_BWD_PREC=f32stash -- python bench.py
echo "=== $(date -u +%H:%M:%S) queue5 done"
