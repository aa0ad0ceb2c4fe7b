#!/bin/bash
# Round-4 training chain (VERDICT r3 #2/#3): rec char-acc 0.615 → ≥0.80,
# det recall 0.672 → ≥0.80.
#
# Levers new this round:
#  * 16-font renderer pool (oblique/italic DejaVus + Computer Modern;
#    STIX/cmr10 stay eval-only — train/synth.py FONTS note)
#  * --replay 3: training is render-bound on the 1-core host, so feeding
#    each rendered batch 3x triples effective steps/sec
#  * scaled SVTR (dim 256 / depth 6 / width_mult 2.0 — models/svtr.init;
#    the TPU serves it for free, MFU was 0.1%)
#
# Candidates land in scratch/; adoption happens ONLY on a
# tools/eval_heldout.py win (combined real+synth; real subtotal must not
# regress), then tools/make_support.py regenerates the decode-support
# sidecar for the widened font coverage.
set -x
cd "$(dirname "$0")/.."
A=onnxocr_tpu/assets
mkdir -p scratch
pause_gate() {
  while [ -f scratch/PAUSE_TRAIN ]; do sleep 20; done
}
seg() {
  local steps=$1 init=$2 out=$3; shift 3
  python tools/train_synthetic.py rec --steps "$steps" --batch 64 \
    --init-from "$init" --out "$out" "$@" || exit 1
  pause_gate
}

# ---- JOB 1: v5 rec, scaled net, from scratch -------------------------
RL=scratch/ckpt_rec_v5_large.npz
python tools/train_synthetic.py rec --steps 300 --batch 64 --out $RL \
  --widths 320,640 --charset full --lr 6e-4 --replay 3 \
  --rec-dim 256 --rec-depth 6 --rec-width-mult 2.0 \
  --structured-frac 0.6 --lowres-frac 0.35 --photo-frac 0.10 \
  --dotmatrix-frac 0.05 || exit 1
pause_gate
for lr in 4e-4 3e-4 2e-4 1.5e-4 1e-4 7e-5; do
  seg 300 $RL $RL --widths 320,640 --charset full --lr $lr --replay 3 \
    --structured-frac 0.6 --lowres-frac 0.35 --photo-frac 0.10 \
    --dotmatrix-frac 0.05
done
echo "=== JOB 1 (large rec) DONE ==="

# ---- JOB 2: v5 rec hedge — small-net continuation with the new fonts --
RH=scratch/ckpt_rec_v5_fonts.npz
seg 200 $A/ppocrv5/rec/native_params.npz $RH \
  --widths 320,640 --charset full --lr 7e-5 --replay 3 \
  --structured-frac 0.6 --lowres-frac 0.35 --photo-frac 0.10 \
  --dotmatrix-frac 0.05
seg 200 $RH $RH --widths 320,640 --charset full --lr 5e-5 --replay 3 \
  --structured-frac 0.6 --lowres-frac 0.35 --photo-frac 0.10 \
  --dotmatrix-frac 0.05
echo "=== JOB 2 (rec hedge) DONE ==="

# ---- JOB 3: v5 det continuation — harder pages, new fonts -------------
DC=scratch/ckpt_det_v5_r4.npz
python tools/train_synthetic.py det --steps 250 --batch 64 \
  --init-from $A/ppocrv5/det/native_params.npz --out $DC \
  --lr 1e-4 --replay 2 --hard-frac 0.35 --table-frac 0.3 \
  --structured-frac 0.6 || exit 1
pause_gate
python tools/train_synthetic.py det --steps 250 --batch 64 \
  --init-from $DC --out $DC \
  --lr 7e-5 --replay 2 --hard-frac 0.35 --table-frac 0.3 \
  --structured-frac 0.6 || exit 1
pause_gate
echo "=== JOB 3 (det) DONE ==="
echo "=== ROUND-4 CHAIN DONE ==="
