"""Round-4 part D — JOB 5 + JOB 4 from round4_train_c.sh, rewritten as a
ONE-PROCESS python driver: each bash segment is a fresh TPU process, and
this session's link weather charges every fresh process a 10-13 min
first-op stall (see CLAUDE.md), so the remaining chain runs in a single
process instead.

  JOB 5: server-det ResNet18 final attempt (2 segments, decaying lr) —
         adopt only if it beats the mbv3 fallback's family recall.
  JOB 4: scaled-SVTR long continuation (blank-plateau break attempt).

Run from the repo root:
    python tools/round4_train_d.py 2>&1 | tee /tmp/train_r4d.log
"""
import os
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "tools")

from train_synthetic import train_det, train_rec  # noqa: E402

A = "onnxocr_tpu/assets"


def pause_gate():
    while os.path.exists("scratch/PAUSE_TRAIN"):
        time.sleep(20)


def main():
    os.makedirs("scratch", exist_ok=True)

    # ---- JOB 5: server-det ResNet18, final recipe ----------------------
    sd = "scratch/ckpt_det_server_r4.npz"
    train_det(400, 32, 320, 3e-4, sd, arch="resnet18",
              init_from=f"{A}/ppocrv5/det/native_params.npz",
              hard_frac=0.3, table_frac=0.3, structured_frac=0.6,
              replay=2)
    pause_gate()
    train_det(400, 32, 320, 1.5e-4, sd, arch="resnet18", init_from=sd,
              hard_frac=0.3, table_frac=0.3, structured_frac=0.6,
              replay=2)
    print("=== JOB 5 (server det) DONE ===", flush=True)
    pause_gate()

    # ---- JOB 4: large rec, long continuation ---------------------------
    rl = "scratch/ckpt_rec_v5_large.npz"
    train_rec(4000, 64, 320, 3e-4, rl, init_from=rl,
              widths=(320, 640), charset="full", replay=3,
              structured_frac=0.6, lowres_frac=0.35, photo_frac=0.10,
              dotmatrix_frac=0.05,
              # must match the checkpoint's scaled-SVTR geometry
              # (round4_train.sh: --rec-dim 256 --rec-depth 6
              #  --rec-width-mult 2.0)
              rec_dim=256, rec_depth=6, rec_width_mult=2.0)
    print("=== JOB 4 (large rec long) DONE ===", flush=True)
    print("=== ROUND-4D CHAIN DONE ===", flush=True)


if __name__ == "__main__":
    main()
