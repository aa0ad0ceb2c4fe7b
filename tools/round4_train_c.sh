#!/bin/bash
# Round-4 part C — reordered after the part-A gates:
#   * JOB 2's 16-font small-net continuation WON its gate decisively
#     (combined 0.657→0.813 recall / 0.620→0.712 char acc; real subtotal
#     0.664→0.697 / 0.612→0.647) and is adopted — JOB 6 continues the
#     SAME recipe from the adopted checkpoint at decaying lr.
#   * JOB 3's det continuation REGRESSED (0.657→0.632 combined) — no
#     further v5-det training this round.
#   * JOB 5 stays: server-det ResNet18 final attempt (VERDICT r3 #7 —
#     adopt only if it beats the mbv3 fallback's 0.582 family recall,
#     else the fallback is declared permanent).
#   * JOB 4 stays last (speculative): the scaled SVTR is still on the
#     CTC blank plateau after 2100 steps; one long cheap continuation.
set -x
cd "$(dirname "$0")/.."
A=onnxocr_tpu/assets
mkdir -p scratch
pause_gate() {
  while [ -f scratch/PAUSE_TRAIN ]; do sleep 20; done
}

# ---- JOB 6: fonts-recipe continuation from the adopted v5 rec ---------
RF=scratch/ckpt_rec_v5_fonts2.npz
python tools/train_synthetic.py rec --steps 800 --batch 64 \
  --init-from $A/ppocrv5/rec/native_params.npz --out $RF \
  --widths 320,640 --charset full --lr 5e-5 --replay 3 \
  --structured-frac 0.6 --lowres-frac 0.35 --photo-frac 0.10 \
  --dotmatrix-frac 0.05 || exit 1
pause_gate
python tools/train_synthetic.py rec --steps 600 --batch 64 \
  --init-from $RF --out $RF \
  --widths 320,640 --charset full --lr 3e-5 --replay 3 \
  --structured-frac 0.6 --lowres-frac 0.35 --photo-frac 0.10 \
  --dotmatrix-frac 0.05 || exit 1
pause_gate
echo "=== JOB 6 (fonts continuation) DONE ==="

# ---- JOB 5: server-det ResNet18, final recipe -------------------------
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

# ---- JOB 4: large rec, long continuation (blank-plateau break attempt)
RL=scratch/ckpt_rec_v5_large.npz
python tools/train_synthetic.py rec --steps 4000 --batch 64 \
  --init-from $RL --out $RL \
  --widths 320,640 --charset full --lr 3e-4 --replay 3 \
  --structured-frac 0.6 --lowres-frac 0.35 --photo-frac 0.10 \
  --dotmatrix-frac 0.05 || exit 1
pause_gate
echo "=== JOB 4 (large rec long) DONE ==="
echo "=== ROUND-4C CHAIN DONE ==="
