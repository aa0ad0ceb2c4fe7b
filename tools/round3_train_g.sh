#!/bin/bash
# Round-3 part G: low-res degradation polish for the v5 rec.
# Held-out misses concentrate in tiny upscaled text (table numbers,
# receipts, dot-matrix boarding pass); --lowres-frac trains on the same
# downscale->JPEG->upscale blur the crop warp produces on real pages.
# Candidate in scratch/, adopted ONLY on a tools/eval_heldout.py win.
set -x
cd "$(dirname "$0")/.."
A=onnxocr_tpu/assets
pause_gate() {
  while [ -f scratch/PAUSE_TRAIN ]; do sleep 20; done
}
seg() {
  local steps=$1 init=$2 out=$3; shift 3
  python tools/train_synthetic.py rec --steps "$steps" --batch 64 \
    --init-from "$init" --out "$out" "$@" || exit 1
  pause_gate
}

RC=scratch/ckpt_rec_v5_lowres.npz
seg 150 $A/ppocrv5/rec/native_params.npz $RC \
  --widths 320,640 --charset full --lr 1e-4 \
  --structured-frac 0.6 --lowres-frac 0.35
for lr in 1e-4 7e-5 5e-5; do
  seg 150 $RC $RC --widths 320,640 --charset full --lr $lr \
    --structured-frac 0.6 --lowres-frac 0.35
done
echo "=== ROUND-3 PART G DONE ==="
