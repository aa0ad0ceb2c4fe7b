#!/bin/bash
# Round-4 part E — final-session targeted rec continuation.
# The JOB-6 adopted checkpoint sits at combined 0.864 recall / 0.764 char
# acc with the remaining real-page gap concentrated in photo-textured and
# dot-matrix styles (PROGRESS.md r4 items 2/3). One short low-lr
# continuation that up-weights exactly those styles; adoption stays
# eval-gated (tools/eval_heldout.py — real subtotal must not regress).
set -x
cd "$(dirname "$0")/.."
A=onnxocr_tpu/assets
mkdir -p scratch

RF=scratch/ckpt_rec_v5_photo.npz
python tools/train_synthetic.py rec --steps 700 --batch 64 \
  --init-from $A/ppocrv5/rec/native_params.npz --out $RF \
  --widths 320,640 --charset full --lr 2e-5 --replay 3 \
  --structured-frac 0.5 --lowres-frac 0.35 --photo-frac 0.25 \
  --dotmatrix-frac 0.15 || exit 1
echo "=== PART E (photo/dotmatrix continuation) DONE ==="
