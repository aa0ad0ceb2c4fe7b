#!/bin/bash
# Round-3 training chain, part B (after the job-1 v5 det hard fine-tune).
# Trimmed step counts: the tunneled chip runs ~11-18 s/step and the round
# has a hard wall clock, so the family checkpoints (which beat the v5
# fallback with ANY trained weights) fine-tune from the v5 checkpoints
# with distinct seeds/data mixes instead of training from scratch.
# PAUSE: touch scratch/PAUSE_TRAIN to borrow the TPU between jobs.
set -x
cd "$(dirname "$0")/.."
A=onnxocr_tpu/assets
pause_gate() {
  while [ -f scratch/PAUSE_TRAIN ]; do sleep 20; done
}

echo "=== JOB 2: v5 rec refresh (align to conv-masked forward) ==="
python tools/train_synthetic.py rec --steps 600 --batch 64 \
  --widths 320,640 --charset full --lr 2e-4 \
  --init-from $A/ppocrv5/rec/native_params.npz \
  --out scratch/ckpt_rec_v5_r3.npz || exit 1
pause_gate

echo "=== JOB 3: v4 det (distinct seed + easier data mix than v5-hard) ==="
python tools/train_synthetic.py det --steps 220 --batch 64 --size 320 \
  --lr 2e-4 --seed 4 --hard-frac 0.25 \
  --init-from scratch/ckpt_det_v5_hard.npz \
  --out $A/ppocrv4/det/native_params.npz || exit 1
pause_gate

echo "=== JOB 4: v4 rec (distinct seed/schedule) ==="
python tools/train_synthetic.py rec --steps 350 --batch 64 \
  --widths 320,640 --charset full --lr 2e-4 --seed 4 \
  --init-from scratch/ckpt_rec_v5_r3.npz \
  --out $A/ppocrv4/rec/native_params.npz || exit 1
pause_gate

echo "=== JOB 5: server det (resnet18, FPN/head warm-started) ==="
python tools/train_synthetic.py det --det-arch resnet18 --steps 500 \
  --batch 64 --size 320 --lr 5e-4 --hard-frac 0.4 \
  --init-from scratch/ckpt_det_v5_hard.npz \
  --out $A/ch_ppocr_server_v2.0/det/native_params.npz || exit 1

echo "=== ROUND-3 PART B DONE ==="
