#!/usr/bin/env bash
# Round-4 on-chip experiment queue (serial; single-tenant chip):
#   1. bench baseline with the round-4 code (sanity vs 18.5k r3)
#   2. bench with relu placement sweeps (ROADMAP lever #1)
#   3. bench with the selective-f32 backward modes (cost measurement)
#   4. grad-audit precision A/B: bf16 / f32stash / f32
# Artifacts land in reports/r4/.
set -u
cd "$(dirname "$0")/.."
OUT=reports/r4
mkdir -p "$OUT"

run() { # name env... -- cmd...
  local name="$1"; shift
  echo "=== $name"
  local envs=()
  while [ "$1" != "--" ]; do envs+=("$1"); shift; done
  shift
  if env "${envs[@]}" timeout 2400 "$@" > "$OUT/.$name.out" 2> "$OUT/.$name.err"; then
    tail -n 1 "$OUT/.$name.out" | tee "$OUT/$name.json"
  else
    echo "FAILED rc=$? ($name)"; tail -5 "$OUT/.$name.err"
  fi
  rm -f "$OUT/.$name.out" "$OUT/.$name.err"
}

run bench_baseline NOOP=1 -- python bench.py
run bench_sweep_relu BENCH_SWEEP_ACT=relu -- python bench.py
run bench_prec_f32stash BENCH_BWD_PREC=f32stash -- python bench.py
run bench_prec_f32 BENCH_BWD_PREC=f32 -- python bench.py
run audit_bf16 AUDIT_PREC=bf16 WRITE_REPORT=1 AUDIT_OUT="$OUT/audit_bf16.json" -- python tools/grad_audit.py
run audit_f32stash AUDIT_PREC=f32stash WRITE_REPORT=1 AUDIT_OUT="$OUT/audit_f32stash.json" -- python tools/grad_audit.py
run audit_f32 AUDIT_PREC=f32 WRITE_REPORT=1 AUDIT_OUT="$OUT/audit_f32.json" -- python tools/grad_audit.py
echo "=== done"
