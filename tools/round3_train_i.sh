#!/bin/bash
# Round-3 part I: scene-photo + dot-matrix rec styles on top of part G.
# Targets the two standing held-out miss classes: french_0 photo text
# and the 00006737 dot-matrix boarding pass. Eval-gated before adoption.
set -x
cd "$(dirname "$0")/.."
A=onnxocr_tpu/assets
pause_gate() {
  while [ -f scratch/PAUSE_TRAIN ]; do sleep 20; done
}
seg() {
  local steps=$1 init=$2 out=$3; shift 3
  python tools/train_synthetic.py rec --steps "$steps" --batch 64 \
    --init-from "$init" --out "$out" "$@" || exit 1
  pause_gate
}
RC=scratch/ckpt_rec_v5_photo.npz
seg 150 $A/ppocrv5/rec/native_params.npz $RC \
  --widths 320,640 --charset full --lr 1e-4 \
  --structured-frac 0.5 --lowres-frac 0.25 \
  --photo-frac 0.2 --dotmatrix-frac 0.1
for lr in 7e-5 5e-5 5e-5; do
  seg 150 $RC $RC --widths 320,640 --charset full --lr $lr \
    --structured-frac 0.5 --lowres-frac 0.25 \
    --photo-frac 0.2 --dotmatrix-frac 0.1
done
echo "=== ROUND-3 PART I DONE ==="
