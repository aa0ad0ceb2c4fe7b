#!/bin/bash
# Round-2 training chain: runs sequentially (ONE TPU process at a time).
# Usage: bash tools/round2_train.sh >> scratch/train_r2.log 2>&1 &
set -x
cd "$(dirname "$0")/.."
mkdir -p scratch
A=onnxocr_tpu/assets

echo "=== JOB 1: v5 rec (svtr) full charset, warm start ==="
python tools/train_synthetic.py rec --steps 6000 --batch 64 \
  --widths 320,640 --charset full --lr 6e-4 \
  --init-from $A/ppocrv5/rec/native_params.npz \
  --out $A/ppocrv5/rec/native_params.npz || exit 1

echo "=== JOB 2: server det (resnet18), warm-started FPN/head ==="
mkdir -p $A/ch_ppocr_server_v2.0/det
python tools/train_synthetic.py det --det-arch resnet18 --steps 3500 \
  --batch 16 --size 320 --lr 1e-3 \
  --init-from $A/ppocrv5/det/native_params.npz \
  --out $A/ch_ppocr_server_v2.0/det/native_params.npz || exit 1

echo "=== JOB 3: v4 rec (svtr), distinct seed ==="
mkdir -p $A/ppocrv4/rec
python tools/train_synthetic.py rec --steps 7000 --batch 64 \
  --widths 320 --charset full --lr 1e-3 --seed 4 \
  --out $A/ppocrv4/rec/native_params.npz || exit 1

echo "=== JOB 4: v4 det (mbv3), distinct seed ==="
mkdir -p $A/ppocrv4/det
python tools/train_synthetic.py det --steps 1800 --batch 16 --size 320 \
  --lr 1e-3 --seed 4 \
  --out $A/ppocrv4/det/native_params.npz || exit 1

echo "=== JOB 5: server rec (crnn) full v1-dict charset ==="
python tools/train_synthetic.py rec --arch crnn --steps 6000 --batch 64 \
  --widths 320 --charset full --lr 1e-3 \
  --dict ch_ppocr_server_v2.0/ppocr_keys_v1.txt \
  --init-from $A/ch_ppocr_server_v2.0/rec/native_params.npz \
  --out $A/ch_ppocr_server_v2.0/rec/native_params.npz || exit 1

echo "=== JOB 6: v5 det fine-tune on full-charset pages ==="
python tools/train_synthetic.py det --steps 900 --batch 16 --size 320 \
  --lr 3e-4 \
  --init-from $A/ppocrv5/det/native_params.npz \
  --out $A/ppocrv5/det/native_params.npz || exit 1

echo "=== ALL JOBS DONE ==="
