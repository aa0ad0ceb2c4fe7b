#!/bin/bash
# Round-3 training chain, part C (single-core host: rendering bounds step
# time, so step counts are trimmed to the measured s/step and the round's
# remaining wall clock). Family checkpoints fine-tune from the v5 weights
# with distinct seeds/data mixes — anything trained beats the family
# fallback. PAUSE: touch scratch/PAUSE_TRAIN to borrow the TPU between
# jobs.
set -x
cd "$(dirname "$0")/.."
A=onnxocr_tpu/assets
pause_gate() {
  while [ -f scratch/PAUSE_TRAIN ]; do sleep 20; done
}

echo "=== JOB 1: v5 det hard-page fine-tune (the scene-photo gap) ==="
python tools/train_synthetic.py det --steps 600 --batch 64 --size 320 \
  --lr 3e-4 --hard-frac 0.5 \
  --init-from $A/ppocrv5/det/native_params.npz \
  --out scratch/ckpt_det_v5_hard.npz || exit 1
pause_gate

echo "=== JOB 2: v5 rec refresh (align to conv-masked forward) ==="
python tools/train_synthetic.py rec --steps 300 --batch 64 \
  --widths 320,640 --charset full --lr 2e-4 \
  --init-from $A/ppocrv5/rec/native_params.npz \
  --out scratch/ckpt_rec_v5_r3.npz || exit 1
pause_gate

echo "=== JOB 3: v4 det (distinct seed + easier mix than v5-hard) ==="
python tools/train_synthetic.py det --steps 150 --batch 64 --size 320 \
  --lr 2e-4 --seed 4 --hard-frac 0.25 \
  --init-from scratch/ckpt_det_v5_hard.npz \
  --out $A/ppocrv4/det/native_params.npz || exit 1
pause_gate

echo "=== JOB 4: v4 rec (distinct seed/schedule) ==="
python tools/train_synthetic.py rec --steps 250 --batch 64 \
  --widths 320,640 --charset full --lr 2e-4 --seed 4 \
  --init-from $A/ppocrv5/rec/native_params.npz \
  --out $A/ppocrv4/rec/native_params.npz || exit 1
pause_gate

echo "=== JOB 5: server det (resnet18, FPN/head warm-started) ==="
python tools/train_synthetic.py det --det-arch resnet18 --steps 300 \
  --batch 64 --size 320 --lr 5e-4 --hard-frac 0.4 \
  --init-from scratch/ckpt_det_v5_hard.npz \
  --out $A/ch_ppocr_server_v2.0/det/native_params.npz || exit 1

echo "=== ROUND-3 PART C DONE ==="
