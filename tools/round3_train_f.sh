#!/bin/bash
# Round-3 part F: spread the structured-text win (part E lifted v5 rec
# char-acc 0.322->0.361) across every family, and keep polishing v5.
# Candidates in scratch/, adopted only on an eval_heldout win. Same
# ≤150-step process segmentation as parts C/D/E.
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

# === JOB 1: v5 rec extended structured polish (adopted ckpt as init) ===
RC=scratch/ckpt_rec_v5_struct2.npz
seg rec 150 $A/ppocrv5/rec/native_params.npz $RC \
  --widths 320,640 --charset full --lr 1e-4 --structured-frac 0.6
for lr in 1e-4 1e-4 7e-5 5e-5 5e-5; do
  seg rec 150 $RC $RC --widths 320,640 --charset full --lr $lr \
    --structured-frac 0.6
done

# === JOB 2: v4 rec structured (distinct seed) ===
V4C=scratch/ckpt_rec_v4_struct.npz
seg rec 150 $A/ppocrv4/rec/native_params.npz $V4C \
  --widths 320,640 --charset full --lr 2e-4 --seed 4 --structured-frac 0.6
seg rec 150 $V4C $V4C --widths 320,640 --charset full --lr 1e-4 \
  --seed 4 --structured-frac 0.6
seg rec 150 $V4C $V4C --widths 320,640 --charset full --lr 5e-5 \
  --seed 4 --structured-frac 0.6

# === JOB 3: server rec (crnn, v1 keys dict) structured refresh ===
SRC=scratch/ckpt_rec_server_struct.npz
seg rec 150 $A/ch_ppocr_server_v2.0/rec/native_params.npz $SRC \
  --arch crnn --dict ch_ppocr_server_v2.0/ppocr_keys_v1.txt \
  --widths 320 --charset full --lr 2e-4 --structured-frac 0.6
seg rec 150 $SRC $SRC \
  --arch crnn --dict ch_ppocr_server_v2.0/ppocr_keys_v1.txt \
  --widths 320 --charset full --lr 1e-4 --structured-frac 0.6

# === JOB 4: v5 det continued structured+table ===
DC=scratch/ckpt_det_v5_struct2.npz
seg det 150 $A/ppocrv5/det/native_params.npz $DC \
  --size 320 --lr 5e-5 --hard-frac 0.25 --table-frac 0.3 \
  --structured-frac 0.6
seg det 150 $DC $DC --size 320 --lr 5e-5 --hard-frac 0.25 \
  --table-frac 0.3 --structured-frac 0.6

echo "=== ROUND-3 PART F DONE ==="
