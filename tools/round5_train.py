"""Round-5 training chain — ONE-PROCESS driver (fresh TPU processes pay
multi-minute spin-up stalls on this link; see CLAUDE.md).

  JOB 1  rec: net2net depth growth (+4 identity blocks on the adopted
         dim-192/depth-2 checkpoint — tools/grow_rec.py, exactly
         function-preserving) + long mixed-style continuation. The
         round-4 from-scratch scaled SVTR never left the CTC blank
         plateau; this starts FROM the working solution (VERDICT r4 #3).
  JOB 2  det: photo-background/low-contrast continuation (hard pages +
         ruled tables) from the adopted det (VERDICT r4 #6).
  JOB 3  server det: ResNet18 DISTILLED from the adopted mbv3 det's
         prob maps (soft-BCE blend, tools/train_synthetic.py
         --distill-from) — the one untried idea after three from-scratch
         losses (VERDICT r4 #8).

Every job ends at a scratch/ checkpoint; adoption happens ONLY through a
tools/eval_heldout.py gate recorded in evalgates.jsonl. Distinct seeds
per segment (ADVICE r4 #1). touch scratch/PAUSE_TRAIN to pause between
jobs.

Run from the repo root:
    python tools/round5_train.py 2>&1 | tee scratch/train_r5.log
"""
import os
import subprocess
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
    t0 = time.time()

    # ---- JOB 1: rec depth growth + continuation -------------------------
    grown = "scratch/ckpt_rec_grown_r5.npz"
    if not os.path.exists(grown):
        subprocess.check_call(
            [sys.executable, "tools/grow_rec.py",
             "--src", f"{A}/ppocrv5/rec/native_params.npz",
             "--out", grown, "--add-depth", "4", "--seed", "5001"])
    # segment 1: moderate lr wakes the new blocks without wrecking the
    # donor solution; mixed style coverage incl. the two failure styles.
    # NOTE (ADVICE r4 #2): --lowres-frac gates on the PLAIN render path
    # only; photo/dotmatrix lines carry their own small-size degradation.
    train_rec(2000, 64, 320, 1.5e-4, grown, init_from=grown,
              widths=(320, 640), charset="full", replay=3, seed=5101,
              structured_frac=0.5, lowres_frac=0.35, photo_frac=0.15,
              dotmatrix_frac=0.08)
    print("=== JOB 1a done (%.0fs) ===" % (time.time() - t0), flush=True)
    pause_gate()
    # segment 2: decaying-lr polish (the round-4 JOB-6 recipe that won)
    train_rec(1500, 64, 320, 5e-5, grown, init_from=grown,
              widths=(320, 640), charset="full", replay=3, seed=5102,
              structured_frac=0.5, lowres_frac=0.35, photo_frac=0.15,
              dotmatrix_frac=0.08)
    print("=== JOB 1 (grown rec) DONE (%.0fs) ===" % (time.time() - t0),
          flush=True)
    pause_gate()

    # ---- JOB 2: det photo/low-contrast continuation ----------------------
    dd = "scratch/ckpt_det_r5.npz"
    train_det(700, 32, 320, 6e-5, dd,
              init_from=f"{A}/ppocrv5/det/native_params.npz",
              hard_frac=0.35, table_frac=0.25, structured_frac=0.5,
              replay=3, seed=5201)
    print("=== JOB 2 (det continuation) DONE (%.0fs) ===" %
          (time.time() - t0), flush=True)
    pause_gate()

    # ---- JOB 3: server-det distillation ---------------------------------
    sd = "scratch/ckpt_det_server_r5.npz"
    train_det(900, 32, 320, 3e-4, sd, arch="resnet18",
              hard_frac=0.3, table_frac=0.3, structured_frac=0.6,
              replay=3, seed=5301,
              distill_from=f"{A}/ppocrv5/det/native_params.npz",
              distill_w=0.7)
    pause_gate()
    train_det(600, 32, 320, 1e-4, sd, arch="resnet18", init_from=sd,
              hard_frac=0.3, table_frac=0.3, structured_frac=0.6,
              replay=3, seed=5302,
              distill_from=f"{A}/ppocrv5/det/native_params.npz",
              distill_w=0.5)
    print("=== JOB 3 (server det distill) DONE (%.0fs) ===" %
          (time.time() - t0), flush=True)
    print("=== ROUND-5 CHAIN DONE ===", flush=True)


if __name__ == "__main__":
    main()
