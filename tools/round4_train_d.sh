#!/bin/bash
# Round-4 part D — final training window, after the JOB-5/6 outcomes:
#   * JOB 7: third fonts-recipe continuation at lr 2e-5 (each previous
#     segment won its gate: 0.657→0.813→0.864 combined recall); cheap
#     (~0.42 s/step with --replay 3) and adoption stays eval-gated.
#   * JOB 4': the long large-SVTR plateau-break attempt carried over from
#     round4_train_c.sh (still on the CTC blank plateau after 2100 steps;
#     informational unless it clears the small net).
set -x
cd "$(dirname "$0")/.."
A=onnxocr_tpu/assets
mkdir -p scratch
pause_gate() {
  while [ -f scratch/PAUSE_TRAIN ]; do sleep 20; done
}

# ---- JOB 7: fonts continuation #3 --------------------------------------
RF=scratch/ckpt_rec_v5_fonts3.npz
python tools/train_synthetic.py rec --steps 800 --batch 64 \
  --init-from $A/ppocrv5/rec/native_params.npz --out $RF \
  --widths 320,640 --charset full --lr 2e-5 --replay 3 \
  --structured-frac 0.6 --lowres-frac 0.35 --photo-frac 0.10 \
  --dotmatrix-frac 0.05 || exit 1
pause_gate
echo "=== JOB 7 (fonts continuation 3) DONE ==="

# ---- JOB 4': large rec, long continuation ------------------------------
RL=scratch/ckpt_rec_v5_large.npz
python tools/train_synthetic.py rec --steps 4000 --batch 64 \
  --init-from $RL --out $RL \
  --widths 320,640 --charset full --lr 3e-4 --replay 3 \
  --structured-frac 0.6 --lowres-frac 0.35 --photo-frac 0.10 \
  --dotmatrix-frac 0.05 || exit 1
pause_gate
echo "=== JOB 4' (large rec long) DONE ==="
echo "=== ROUND-4D CHAIN DONE ==="
