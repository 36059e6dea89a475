#!/usr/bin/env bash
# Round-5 chip queue, part 3 (chained after part 2):
#   * relu-sweep quality arm (ROADMAP lever #1: +1.5% bench measured in
#     r4, quality cost never measured — the r4 queue died first)
#   * extraction grid-eval time-split probe (device vs D2H tunnel) at
#     256^3 — sizes the remaining gap to the <=10 s 512^3 target
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

run qg1k_relu 2400 QG_STEPS=1000 QG_SWEEP_ACT=relu -- python tools/quality_gate.py
run extract_probe 2400 EP_RES=256 -- python tools/extract_probe.py
echo "=== $(date -u +%H:%M:%S) queue3 done"
