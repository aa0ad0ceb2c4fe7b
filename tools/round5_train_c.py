"""Round-5 chain, part C: low-lr polish of the ADOPTED grown rec.

The decaying-lr continuation pattern won in round 4 (JOB 6) and round 5
(grow seg 2); one more segment at 2e-5 targets the residual real-page
char-acc gap (0.692 vs the 0.80 bar). Distinct seed (ADVICE r4 #1).

    python tools/round5_train_c.py 2>&1 | tee scratch/train_r5c.log
"""
import sys
sys.path.insert(0, ".")
sys.path.insert(0, "tools")
from train_synthetic import train_rec  # noqa: E402

A = "onnxocr_tpu/assets"
out = "scratch/ckpt_rec_polish_r5.npz"
train_rec(2000, 64, 320, 2e-5, out,
          init_from=f"{A}/ppocrv5/rec/native_params.npz",
          widths=(320, 640), charset="full", replay=3, seed=5103,
          structured_frac=0.5, lowres_frac=0.35, photo_frac=0.15,
          dotmatrix_frac=0.08)
print("=== part C DONE ===", flush=True)
