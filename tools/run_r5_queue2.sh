#!/usr/bin/env bash
# Round-5 chip queue, part 2 (chained after run_r5_queue.sh):
#   * grad audit in the PRODUCTION march_bwd_precision=f32stash mode
#     (part 1's ran the bf16 arm)
#   * extraction-precision ladder arms: f32x3 (3-pass split) and bf16
#     sweep — the r4 #4 "<=10 s" target needs a cheaper sweep dtype;
#     f32 HIGHEST measured 34.8 s in part 1
set -u
cd "$(dirname "$0")/.."
OUT=reports/r5
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
  cp "/tmp/.$name.err" "$OUT/$name.err" 2>/dev/null || true
}

run grad_audit_f32stash 2400 AUDIT_N_RAYS=256 AUDIT_PREC=f32stash -- python tools/grad_audit.py
run extract_timing_f32x3 2400 MET_RES=512 MET_PREC=f32x3 -- python tools/mesh_extraction_timing.py
run extract_timing_bf16 2400 MET_RES=512 MET_PREC=bf16 -- python tools/mesh_extraction_timing.py
echo "=== $(date -u +%H:%M:%S) queue2 done"
