#!/usr/bin/env bash
# Round-5 chip queue, part 4 (chained after part 3): seed-noise floor
# arms for the 5k quality ladder. Both arms of the fused-vs-off
# comparison saturate near ~50 dB by 5k steps, where trajectory noise
# alone moves PSNR by ~1 dB (r4's three arms spread 48.6..49.7); these
# same-config different-seed arms measure that floor so the 20k
# fused-vs-off gap can be read against it (VERDICT r4 #2).
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

run qg5k_off_seed2 3600 QG_STEPS=5000 QG_FUSED=off QG_SEED=2 QG_VIZ_EVERY=1250 -- python tools/quality_gate.py
run qg5k_fused_seed2 3600 QG_STEPS=5000 QG_SEED=2 QG_VIZ_EVERY=1250 -- python tools/quality_gate.py
# blob arms again under the measured-calibration gates (the first pair
# trained fine but carried speculative thresholds)
run qg_blob_fused 2400 QG_SCENE=blob QG_STEPS=1000 -- python tools/quality_gate.py
run qg_blob_off 2400 QG_SCENE=blob QG_STEPS=1000 QG_FUSED=off -- python tools/quality_gate.py
echo "=== $(date -u +%H:%M:%S) queue4 done"
