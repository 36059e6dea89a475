#!/usr/bin/env bash
# Run every on-chip TPU gate and leave one JSON artifact per gate in
# reports/tpu_gates_r4/ (VERDICT r3 "Next #4": gate outputs must be
# artifacts, not commit-message prose). Serial on purpose: the bench
# chip is single-tenant.
#
#   bash tools/run_tpu_gates.sh [outdir]
#
# Gates (same set tests/test_tpu_gates.py runs with RUN_TPU_TESTS=1):
#   grad_audit          bf16 fused bwd vs f32 XLA oracle gradients
#   shardmap_save       pallas-under-shard_map, march_acts=save
#   shardmap_recompute  pallas-under-shard_map, march_acts=recompute
#   eval_fused          fused eval paths (vertex colors, sdf grid) vs XLA
#   quality_short       200-step train + render/mesh quality thresholds
set -u
cd "$(dirname "$0")/.."
OUT="${1:-reports/tpu_gates_r4}"
mkdir -p "$OUT"
fail=0

run_gate() { # name, artifact, cmd...
  local name="$1" art="$2"; shift 2
  echo "=== gate: $name"
  if "$@" > "$OUT/.${name}.out" 2> "$OUT/.${name}.err"; then
    tail -n 1 "$OUT/.${name}.out" > "$OUT/$art"
    python - "$OUT/$art" <<'EOF' || fail=1
import json, sys
rep = json.load(open(sys.argv[1]))
ok = rep.get("pass", True)
print(json.dumps({"artifact": sys.argv[1], "pass": bool(ok)}))
sys.exit(0 if ok else 1)
EOF
    rm -f "$OUT/.${name}.out" "$OUT/.${name}.err"
  else
    # keep the logs — a crashed gate with deleted stderr is undiagnosable
    echo "gate $name FAILED (rc=$?); logs kept at $OUT/.${name}.{out,err}"
    tail -5 "$OUT/.${name}.err"; fail=1
  fi
}

run_gate grad_audit grad_audit.json \
  env AUDIT_N_RAYS=256 timeout 2400 python tools/grad_audit.py
run_gate shardmap_save shardmap_save.json \
  env SMC_MARCH_ACTS=save timeout 2400 python tools/tpu_shardmap_check.py
run_gate shardmap_recompute shardmap_recompute.json \
  env SMC_MARCH_ACTS=recompute timeout 2400 python tools/tpu_shardmap_check.py
run_gate eval_fused eval_fused.json \
  timeout 2400 python tools/tpu_eval_fused_check.py
run_gate quality_short quality_short.json \
  env QG_STEPS=200 QG_RES=64 timeout 3600 python tools/quality_gate.py

echo "=== done; artifacts in $OUT (fail=$fail)"
exit "$fail"
