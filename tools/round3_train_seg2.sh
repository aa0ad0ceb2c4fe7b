#!/bin/bash
# Round-3 segmented training, part D. Rebalance after the eval gate:
# hard-frac 0.5 at 300 steps opened the scene photo (french_0 0->2 lines)
# but regressed clean scans (held-out 0.303->0.262 recall), so the last
# det segment trains at hard-frac 0.3 to recover the clean-page
# distribution while keeping the hard-page signal. Same ≤150-step process
# segmentation as part C (axon client RSS leak).
set -x
cd "$(dirname "$0")/.."
A=onnxocr_tpu/assets
pause_gate() {
  while [ -f scratch/PAUSE_TRAIN ]; do sleep 20; done
}
seg() {
  local kind=$1 steps=$2 init=$3 out=$4; shift 4
  python tools/train_synthetic.py "$kind" --steps "$steps" --batch 64 \
    --init-from "$init" --out "$out" "$@" || exit 1
  pause_gate
}

H=scratch/ckpt_det_v5_hard.npz
# === JOB 1 (final segment): rebalance at hard-frac 0.3 ===
seg det 150 $H $H --size 320 --lr 1e-4 --hard-frac 0.3

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

# === JOB 5: server det (resnet18, warm-started from v5-hard) ===
SD=$A/ch_ppocr_server_v2.0/det/native_params.npz
seg det 150 $H $SD --det-arch resnet18 --size 320 --lr 5e-4 --hard-frac 0.3
seg det 150 $SD $SD --det-arch resnet18 --size 320 --lr 2e-4 --hard-frac 0.3

echo "=== ROUND-3 PART D DONE ==="
