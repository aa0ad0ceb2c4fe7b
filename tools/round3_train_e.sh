#!/bin/bash
# Round-3 segmented training, part E: retrain on the structured-text
# distribution (words/numbers/dates/codes via --structured-frac) and
# ruled-table det pages (--table-frac). Motivation: held-out errors are
# dominated by (a) rec substituting visually-similar rare glyphs on
# receipts/tables — an artifact of the flat glyph-soup prior — and
# (b) det missing text inside ruled tables, which the old renderers
# never drew. Candidates land in scratch/ and are adopted only after an
# eval_heldout gate. Same ≤150-step process segmentation as parts C/D
# (axon client RSS leak).
set -x
cd "$(dirname "$0")/.."
A=onnxocr_tpu/assets
pause_gate() {
  while [ -f scratch/PAUSE_TRAIN ]; do sleep 20; done
}
seg() {
  local kind=$1 steps=$2 init=$3 out=$4; shift 4
  python tools/train_synthetic.py "$kind" --steps "$steps" --batch 64 \
    --init-from "$init" --out "$out" "$@" || exit 1
  pause_gate
}

# === JOB 1: v5 rec on structured text (cheap: ~0.35 s/step) ===
RC=scratch/ckpt_rec_v5_struct.npz
seg rec 150 $A/ppocrv5/rec/native_params.npz $RC \
  --widths 320,640 --charset full --lr 2e-4 --structured-frac 0.6
seg rec 150 $RC $RC --widths 320,640 --charset full --lr 2e-4 \
  --structured-frac 0.6
seg rec 150 $RC $RC --widths 320,640 --charset full --lr 1.5e-4 \
  --structured-frac 0.6
seg rec 150 $RC $RC --widths 320,640 --charset full --lr 1e-4 \
  --structured-frac 0.6
seg rec 150 $RC $RC --widths 320,640 --charset full --lr 1e-4 \
  --structured-frac 0.6
seg rec 150 $RC $RC --widths 320,640 --charset full --lr 5e-5 \
  --structured-frac 0.6

# === JOB 2: v5 det with table pages + structured lines ===
DC=scratch/ckpt_det_v5_struct.npz
seg det 150 $A/ppocrv5/det/native_params.npz $DC \
  --size 320 --lr 1e-4 --hard-frac 0.25 --table-frac 0.3 \
  --structured-frac 0.6
seg det 150 $DC $DC --size 320 --lr 1e-4 --hard-frac 0.25 \
  --table-frac 0.3 --structured-frac 0.6
seg det 150 $DC $DC --size 320 --lr 5e-5 --hard-frac 0.25 \
  --table-frac 0.3 --structured-frac 0.6

# === JOB 3: server det (resnet18) — continue from part D's 300 steps;
# 0.131 held-out recall at the part-D gate (vs 0.311 mbv3): undertrained,
# NOT committed. Add structured/table segments before re-gating.
SD=onnxocr_tpu/assets/ch_ppocr_server_v2.0/det/native_params.npz
seg det 150 $SD $SD --det-arch resnet18 --size 320 --lr 3e-4 \
  --hard-frac 0.25 --table-frac 0.3 --structured-frac 0.6
seg det 150 $SD $SD --det-arch resnet18 --size 320 --lr 2e-4 \
  --hard-frac 0.25 --table-frac 0.3 --structured-frac 0.6
seg det 150 $SD $SD --det-arch resnet18 --size 320 --lr 1e-4 \
  --hard-frac 0.25 --table-frac 0.3 --structured-frac 0.6

echo "=== ROUND-3 PART E DONE ==="
