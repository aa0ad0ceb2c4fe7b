#!/bin/bash
# Round-3 training chain (batch 64: probe showed ~2x better samples/sec
# than b16 on the tunneled chip). Jobs write candidate v5 checkpoints to
# scratch/ (adopted only after the held-out eval gate); family checkpoints
# (v4, server det) write straight into assets/ — anything trained beats
# the current family fallback. Between jobs the chain waits while
# scratch/PAUSE_TRAIN exists so the TPU can be borrowed for bench/eval.
set -x
cd "$(dirname "$0")/.."
A=onnxocr_tpu/assets
pause_gate() {
  while [ -f scratch/PAUSE_TRAIN ]; do sleep 20; done
}

echo "=== JOB 1: v5 det hard-page fine-tune (the scene-photo gap) ==="
python tools/train_synthetic.py det --steps 1300 --batch 64 --size 320 \
  --lr 4e-4 --hard-frac 0.5 \
  --init-from $A/ppocrv5/det/native_params.npz \
  --out scratch/ckpt_det_v5_hard.npz || exit 1
pause_gate

echo "=== JOB 2: v5 rec refresh (align to conv-masked forward) ==="
python tools/train_synthetic.py rec --steps 900 --batch 64 \
  --widths 320,640 --charset full --lr 3e-4 \
  --init-from $A/ppocrv5/rec/native_params.npz \
  --out scratch/ckpt_rec_v5_r3.npz || exit 1
pause_gate

echo "=== JOB 3: v4 det (mbv3, distinct seed) ==="
python tools/train_synthetic.py det --steps 700 --batch 64 --size 320 \
  --lr 1e-3 --seed 4 --hard-frac 0.4 \
  --out $A/ppocrv4/det/native_params.npz || exit 1
pause_gate

echo "=== JOB 4: v4 rec (svtr, distinct seed) ==="
python tools/train_synthetic.py rec --steps 2500 --batch 64 \
  --widths 320,640 --charset full --lr 1e-3 --seed 4 \
  --out $A/ppocrv4/rec/native_params.npz || exit 1
pause_gate

echo "=== JOB 5: server det (resnet18, warm-started FPN/head) ==="
python tools/train_synthetic.py det --det-arch resnet18 --steps 900 \
  --batch 64 --size 320 --lr 5e-4 --hard-frac 0.4 \
  --init-from scratch/ckpt_det_v5_hard.npz \
  --out $A/ch_ppocr_server_v2.0/det/native_params.npz || exit 1

echo "=== ALL ROUND-3 JOBS DONE ==="
