#!/bin/bash
# Round-3 part H: spread the part-G low-res win across families.
#  JOB 1: v5 rec continuation (2x150 @ 5e-5) from the adopted part-G ckpt
#  JOB 2: v4 rec low-res polish (3x150, distinct seed 4)
#  JOB 3: server rec (crnn, v1 keys dict) low-res polish (2x150)
# Candidates in scratch/, adopted ONLY on a tools/eval_heldout.py win.
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

RC=scratch/ckpt_rec_v5_lowres2.npz
seg 150 $A/ppocrv5/rec/native_params.npz $RC \
  --widths 320,640 --charset full --lr 5e-5 \
  --structured-frac 0.6 --lowres-frac 0.35
seg 150 $RC $RC --widths 320,640 --charset full --lr 5e-5 \
  --structured-frac 0.6 --lowres-frac 0.35

V4=scratch/ckpt_rec_v4_lowres.npz
seg 150 $A/ppocrv4/rec/native_params.npz $V4 \
  --widths 320,640 --charset full --lr 1e-4 --seed 4 \
  --structured-frac 0.6 --lowres-frac 0.35
seg 150 $V4 $V4 --widths 320,640 --charset full --lr 7e-5 --seed 4 \
  --structured-frac 0.6 --lowres-frac 0.35
seg 150 $V4 $V4 --widths 320,640 --charset full --lr 5e-5 --seed 4 \
  --structured-frac 0.6 --lowres-frac 0.35

SR=scratch/ckpt_rec_server_lowres.npz
seg 150 $A/ch_ppocr_server_v2.0/rec/native_params.npz $SR \
  --arch crnn --dict ch_ppocr_server_v2.0/ppocr_keys_v1.txt \
  --widths 320 --charset full --lr 1e-4 \
  --structured-frac 0.6 --lowres-frac 0.35
seg 150 $SR $SR \
  --arch crnn --dict ch_ppocr_server_v2.0/ppocr_keys_v1.txt \
  --widths 320 --charset full --lr 5e-5 \
  --structured-frac 0.6 --lowres-frac 0.35
echo "=== ROUND-3 PART H DONE ==="
