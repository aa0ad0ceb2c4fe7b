#!/bin/bash
# Round-2 training chain, part B (after the v5 rec job): server det with
# SkipInit'd ResNet, then v4 det/rec, server rec, v5 det fine-tune.
set -x
cd "$(dirname "$0")/.."
mkdir -p scratch
A=onnxocr_tpu/assets

echo "=== JOB 2b: server det (resnet18, SkipInit), warm-started FPN/head ==="
mkdir -p $A/ch_ppocr_server_v2.0/det
python tools/train_synthetic.py det --det-arch resnet18 --steps 3000 \
  --batch 16 --size 320 --lr 5e-4 \
  --init-from $A/ppocrv5/det/native_params.npz \
  --out $A/ch_ppocr_server_v2.0/det/native_params.npz || exit 1

echo "=== JOB 3: v4 rec (svtr), distinct seed ==="
mkdir -p $A/ppocrv4/rec
python tools/train_synthetic.py rec --steps 6000 --batch 64 \
  --widths 320 --charset full --lr 1e-3 --seed 4 \
  --out $A/ppocrv4/rec/native_params.npz || exit 1

echo "=== JOB 4: v4 det (mbv3), distinct seed ==="
mkdir -p $A/ppocrv4/det
python tools/train_synthetic.py det --steps 1500 --batch 16 --size 320 \
  --lr 1e-3 --seed 4 \
  --out $A/ppocrv4/det/native_params.npz || exit 1

echo "=== JOB 5: server rec (crnn) full v1-dict charset ==="
python tools/train_synthetic.py rec --arch crnn --steps 5000 --batch 64 \
  --widths 320 --charset full --lr 1e-3 \
  --dict ch_ppocr_server_v2.0/ppocr_keys_v1.txt \
  --init-from $A/ch_ppocr_server_v2.0/rec/native_params.npz \
  --out $A/ch_ppocr_server_v2.0/rec/native_params.npz || exit 1

echo "=== JOB 6: v5 det fine-tune on full-charset pages ==="
python tools/train_synthetic.py det --steps 800 --batch 16 --size 320 \
  --lr 3e-4 \
  --init-from $A/ppocrv5/det/native_params.npz \
  --out $A/ppocrv5/det/native_params.npz || exit 1

echo "=== ALL JOBS DONE ==="
