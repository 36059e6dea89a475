#!/usr/bin/env bash
# One-command DTU scan-83 readiness (VERDICT r2 "Next #7").
#
# The BASELINE gate is PSNR + Chamfer parity on DTU scan 83
# (reference config/Color_NeuS_dtu.yml + lib/datasets/dtu.py:27-94).
# No DTU data exists in this environment; this script closes the gate
# the day data is mounted:
#
#   DATA_ROOT=/path/to/DTU ./tools/run_dtu83.sh [STEPS] [GT_MESH.ply]
#
# DATA_ROOT must contain dtu_scan83/{image,mask,cameras_sphere.npz}
# (the standard NeuS-preprocessed layout the reference loads). Steps:
#   1. train config/Color_NeuS_dtu.yml on scan 83 for STEPS iterations
#      (default 100000, the reference schedule) — validation images +
#      PSNR/SSIM land in the exp dir on the reference cadence
#   2. extract the 512^3 mesh with vertex colors from the final
#      checkpoint (evaluation.py -rr 512, reference README.md:88)
#   3. render-side comparison: every 7th view re-rendered and scored
#      vs GT (tools/eval_views.py) -> reports/dtu83_views.json
#   4. if GT_MESH is given, report symmetric Chamfer via
#      tools/mesh_compare.py (reference mesh_tools.py:59-70 workflow)
#      -> reports/dtu83_chamfer.txt
#
# Artifacts after a full run:
#   exp/dtu83_readiness_*/checkpoints/state.npz      trained state
#   exp/eval_Color_NeuS_83_*/meshes/*_color.ply      512^3 colored mesh
#   reports/dtu83_extract_time.txt                   extraction wall time
#   reports/dtu83_views.json                         PSNR/SSIM per view + mean
#   reports/dtu83_chamfer.txt                        chamfer vs GT (if given)
#
# CI dry-runs the no-data steps (tests/test_runtime.py::test_dtu83_script
# checks the missing-DATA_ROOT refusal and drives eval_views.py on the
# synthetic dataset).
set -euo pipefail
cd "$(dirname "$0")/.."

STEPS="${1:-100000}"
GT_MESH="${2:-}"
: "${DATA_ROOT:?set DATA_ROOT to the directory containing dtu_scan83/}"

if [ ! -e "$DATA_ROOT/dtu_scan83/cameras_sphere.npz" ]; then
    echo "ERROR: $DATA_ROOT/dtu_scan83/cameras_sphere.npz not found" >&2
    exit 2
fi

EXP_ID="dtu83_readiness"
echo "== train: Color_NeuS on DTU scan 83, $STEPS steps =="
python train.py --cfg config/Color_NeuS_dtu.yml -obj 83 \
    --exp_id "$EXP_ID" --data_root "$DATA_ROOT" \
    --iterations "$STEPS" --allow_dirty

EXP_DIR=$(ls -dt exp/${EXP_ID}_* | head -1)
CKPT="$EXP_DIR/checkpoints/state.npz"
echo "== extract: 512^3 mesh with vertex colors from $CKPT =="
mkdir -p reports
T0=$(date +%s.%N)
python evaluation.py --cfg config/Color_NeuS_dtu.yml -obj 83 \
    --data_root "$DATA_ROOT" -rr 512 --reload "$CKPT"
T1=$(date +%s.%N)
echo "512^3 extraction wall time: $(echo "$T1 - $T0" | bc) s" \
    | tee reports/dtu83_extract_time.txt

MESH=$(ls -t exp/eval_Color_NeuS_83_*/meshes/*_color.ply 2>/dev/null | head -1)
echo "mesh: $MESH"

echo "== render-side eval: every 7th view, PSNR/SSIM vs GT =="
python tools/eval_views.py --cfg config/Color_NeuS_dtu.yml -obj 83 \
    --data_root "$DATA_ROOT" --reload "$CKPT" --n 7 \
    --out reports/dtu83_views.json

if [ -n "$GT_MESH" ]; then
    echo "== chamfer vs $GT_MESH =="
    python tools/mesh_compare.py "$MESH" "$GT_MESH" | tee reports/dtu83_chamfer.txt
fi
echo "== done: views in reports/dtu83_views.json, mesh at $MESH =="
