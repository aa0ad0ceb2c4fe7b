#!/bin/bash
# Round-3 training, segmented: the axon client leaks ~75-150 MB of host
# RSS per step (transfer buffers), and step time decays 12→40 s as the
# Python heap grows — so every job runs as ≤150-step processes chained by
# --init-from. Checkpoints land after every segment; kill this script at
# any segment boundary and nothing is lost.
# PAUSE: touch scratch/PAUSE_TRAIN to borrow the TPU between segments.
set -x
cd "$(dirname "$0")/.."
A=onnxocr_tpu/assets
pause_gate() {
  while [ -f scratch/PAUSE_TRAIN ]; do sleep 20; done
}
seg() {  # seg <kind> <steps> <init> <out> [extra args...]
  local kind=$1 steps=$2 init=$3 out=$4; shift 4
  python tools/train_synthetic.py "$kind" --steps "$steps" --batch 64 \
    --init-from "$init" --out "$out" "$@" || exit 1
  pause_gate
}

H=scratch/ckpt_det_v5_hard.npz   # step-150 ckpt already there
# === JOB 1 (cont): v5 det hard-page fine-tune, 3 more segments ===
seg det 150 $H $H --size 320 --lr 2e-4 --hard-frac 0.5
seg det 150 $H $H --size 320 --lr 1.5e-4 --hard-frac 0.5
seg det 150 $H $H --size 320 --lr 1e-4 --hard-frac 0.5

# === JOB 2: v5 rec refresh (align to conv-masked forward) ===
R=scratch/ckpt_rec_v5_r3.npz
seg rec 150 $A/ppocrv5/rec/native_params.npz $R \
  --widths 320,640 --charset full --lr 2e-4
seg rec 150 $R $R --widths 320,640 --charset full --lr 1e-4

# === JOB 3: v4 det (distinct seed + easier mix) ===
seg det 150 $H $A/ppocrv4/det/native_params.npz \
  --size 320 --lr 2e-4 --seed 4 --hard-frac 0.25

# === JOB 4: v4 rec (distinct seed/schedule) ===
V4R=$A/ppocrv4/rec/native_params.npz
seg rec 150 $A/ppocrv5/rec/native_params.npz $V4R \
  --widths 320,640 --charset full --lr 2e-4 --seed 4
seg rec 100 $V4R $V4R --widths 320,640 --charset full --lr 1e-4 --seed 4

# === JOB 5: server det (resnet18, warm-started from v5-hard) ===
SD=$A/ch_ppocr_server_v2.0/det/native_params.npz
seg det 150 $H $SD --det-arch resnet18 --size 320 --lr 5e-4 --hard-frac 0.4
seg det 150 $SD $SD --det-arch resnet18 --size 320 --lr 2e-4 --hard-frac 0.4

echo "=== ROUND-3 SEGMENTED CHAIN DONE ==="
