#!/usr/bin/env bash
# /verify drives (the skill recipe) slotted into the chip queue: train
# 60 iters on the synthetic sphere, mesh-extract from the checkpoint
# (incl. a sparse-extraction arm), resume probe. Run between queue 1
# and queue 2.
set -u
cd "$(dirname "$0")/.."
OUT=reports/r5
mkdir -p "$OUT"
LOG="$OUT/verify_drive.log"
: > "$LOG"

step() { echo "=== $(date -u +%H:%M:%S) $*" | tee -a "$LOG"; }

step "train 60 iters"
rm -rf exp/vdrive_*
if timeout 900 python train.py --cfg config/Color_NeuS_synthetic.yml \
     --exp_id vdrive --iterations 60 --allow_dirty >> "$LOG" 2>&1; then
  step "train ok"
else
  step "TRAIN FAILED rc=$?"; tail -5 "$LOG"; exit 1
fi
CKPT=$(ls exp/vdrive_*/checkpoints/state.npz | head -1)
step "ckpt: $CKPT"

step "evaluation -rr 64 (dense)"
if timeout 900 python evaluation.py --cfg config/Color_NeuS_synthetic.yml \
     --reload "$CKPT" -rr 64 >> "$LOG" 2>&1; then
  step "eval ok: $(ls exp/eval_*/meshes/ | tail -2 | tr '\n' ' ')"
else
  step "EVAL FAILED rc=$?"; tail -5 "$LOG"; exit 1
fi

step "sparse-extraction probe (TPU fused kernel path)"
if CKPT="$CKPT" timeout 900 python - >> "$LOG" 2>&1 <<'EOF'
import os
import numpy as np
from color_neus_tpu.utils.config import get_config
from color_neus_tpu.runtime import TrainLoop
from color_neus_tpu.ops import mesh as M

class _A:
    batch_size = None; obj_id = None
    iterations = None; data_root = None
    reload = os.environ["CKPT"]

cfg = get_config("config/Color_NeuS_synthetic.yml", _A())
loop = TrainLoop(cfg, exp_id="vsparse", require_clean_git=False)
params = loop.state["params"]["renderer"]
vd, td = M.extract_geometry(params, loop.tcfg.renderer, loop.bbox_min,
                            loop.bbox_max, 64, sparse=False)
vs, ts = M.extract_geometry(params, loop.tcfg.renderer, loop.bbox_min,
                            loop.bbox_max, 64, sparse=True)
assert len(vd) > 100, len(vd)
assert len(vs) == len(vd) and len(ts) == len(td), (len(vs), len(vd))
sd = vd[np.lexsort(vd.T)]
ss = vs[np.lexsort(vs.T)]
np.testing.assert_array_equal(sd, ss)
print("sparse==dense on TPU:", len(vd), "verts")
EOF
then
  step "sparse probe ok"
else
  step "SPARSE PROBE FAILED rc=$?"; tail -8 "$LOG"; exit 1
fi

step "resume probe"
EXP=$(ls -d exp/vdrive_* | head -1)
if timeout 900 python train.py --resume "$EXP" --iterations 80 --allow_dirty >> "$LOG" 2>&1; then
  step "resume ok"
else
  step "RESUME FAILED rc=$?"; tail -5 "$LOG"; exit 1
fi
step "verify drives all ok"
