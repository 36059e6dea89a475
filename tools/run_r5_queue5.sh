#!/usr/bin/env bash
# Round-5 chip queue, part 5 (chained after part 4): re-verify after the
# marching-orientation fix, then the CLEAN extraction timing (quiet
# host, steady-state sparse arm). The earlier timing arms ran while the
# CPU test suite hammered the host — the grid eval is tunnel-fetch-bound
# (reports/r5/extract_probe.json), so host contention polluted them.
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

bash tools/run_r5_verify.sh
run extract_timing_final 3600 MET_RES=512 -- python tools/mesh_extraction_timing.py
echo "=== $(date -u +%H:%M:%S) queue5 done"
