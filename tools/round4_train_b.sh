#!/bin/bash
# Round-4 part B: long single-process continuations (per-segment init —
# TPU connect + font-coverage scan + compile — costs ~4-5 min, so one
# long segment beats many short ones), plus the server-det final attempt
# (VERDICT r3 #7: adopt only if it beats the mbv3 fallback's 0.582
# family recall, else the fallback is declared permanent).
set -x
cd "$(dirname "$0")/.."
A=onnxocr_tpu/assets
mkdir -p scratch
pause_gate() {
  while [ -f scratch/PAUSE_TRAIN ]; do sleep 20; done
}

# ---- JOB 4: large rec, long continuation (the from-scratch net needs
# thousands of steps to break the CTC blank plateau; steps are ~0.3 s)
RL=scratch/ckpt_rec_v5_large.npz
python tools/train_synthetic.py rec --steps 4000 --batch 64 \
  --init-from $RL --out $RL \
  --widths 320,640 --charset full --lr 3e-4 --replay 3 \
  --structured-frac 0.6 --lowres-frac 0.35 --photo-frac 0.10 \
  --dotmatrix-frac 0.05 || exit 1
pause_gate
echo "=== JOB 4 (large rec long) DONE ==="

# ---- JOB 5: server-det ResNet18, final recipe (low-res aug + tables +
# new fonts + replay; warm-start from the v5 mbv3... no — resnet arch,
# fresh init with FPN/head graft from the committed v5 det)
SD=scratch/ckpt_det_server_r4.npz
python tools/train_synthetic.py det --steps 400 --batch 32 \
  --det-arch resnet18 --out $SD \
  --init-from $A/ppocrv5/det/native_params.npz \
  --lr 3e-4 --replay 2 --hard-frac 0.3 --table-frac 0.3 \
  --structured-frac 0.6 || exit 1
pause_gate
python tools/train_synthetic.py det --steps 400 --batch 32 \
  --det-arch resnet18 --out $SD --init-from $SD \
  --lr 1.5e-4 --replay 2 --hard-frac 0.3 --table-frac 0.3 \
  --structured-frac 0.6 || exit 1
pause_gate
echo "=== JOB 5 (server det) DONE ==="
echo "=== ROUND-4B CHAIN DONE ==="
