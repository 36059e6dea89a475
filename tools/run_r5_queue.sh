#!/usr/bin/env bash
# Round-5 chip queue, resume session: the evidence items VERDICT r4
# ordered that the interrupted session did not finish.
#   1. extraction timing with the round-5 f32x3/overlap pipeline
#      (VERDICT r4 #4: 51.7 s -> <=10 s grid eval at 512^3)
#   2. self-calibrating grad audit (r4 #3) in the production config
#   3. qg5k XLA-off arm on the FIXED SSIM (r4 #2; fused arm is done:
#      reports/r5/qg5k_fused_hilo.json)
#   4. blob-scene 1k gates, both paths (r4 #6) — calibration artifacts
#   5. bench sanity (headline stays >=18.5k after the thin-dot work)
#   6. 20k-step drift arms, fused-f32stash vs XLA-off (r4 #2)
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

run extract_timing 2400 MET_RES=512 -- python tools/mesh_extraction_timing.py
run grad_audit 2400 AUDIT_N_RAYS=256 -- python tools/grad_audit.py
run qg5k_off 3600 QG_STEPS=5000 QG_FUSED=off QG_VIZ_EVERY=1250 -- python tools/quality_gate.py
run qg_blob_fused 2400 QG_SCENE=blob QG_STEPS=1000 -- python tools/quality_gate.py
run qg_blob_off 2400 QG_SCENE=blob QG_STEPS=1000 QG_FUSED=off -- python tools/quality_gate.py
run bench_sanity 1800 -- python bench.py
run qg20k_fused 7200 QG_STEPS=20000 QG_VIZ_EVERY=5000 -- python tools/quality_gate.py
run qg20k_off 10800 QG_STEPS=20000 QG_FUSED=off QG_VIZ_EVERY=5000 -- python tools/quality_gate.py
echo "=== $(date -u +%H:%M:%S) queue done"
