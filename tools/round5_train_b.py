"""Round-5 chain, part B: JOB 3 (server-det distillation) resume.

The part-A process died by OOM at distill step 275/900 — the axon remote
client leaks ~one uploaded batch of host RSS per step (~39 MB at det
batch 32), and JOB 1+2's ~4200 steps had already consumed the 128 GB
budget. JOB 3 resumes alone in a fresh process (1350 remaining steps
~= 53 GB of leak: fits). Seg-1 restart warm-starts from the step-150
periodic checkpoint part A saved (tools/train_synthetic.py's every-150
salvage saves).

    python tools/round5_train_b.py 2>&1 | tee scratch/train_r5b.log
"""
import sys
sys.path.insert(0, ".")
sys.path.insert(0, "tools")

from train_synthetic import train_det  # noqa: E402

A = "onnxocr_tpu/assets"
sd = "scratch/ckpt_det_server_r5.npz"

# seg 1 remainder (part A reached ~275; ckpt is from step 150)
train_det(750, 32, 320, 3e-4, sd, arch="resnet18", init_from=sd,
          hard_frac=0.3, table_frac=0.3, structured_frac=0.6,
          replay=3, seed=5303,
          distill_from=f"{A}/ppocrv5/det/native_params.npz",
          distill_w=0.7)
print("=== JOB 3 seg 1 done ===", flush=True)
train_det(600, 32, 320, 1e-4, sd, arch="resnet18", init_from=sd,
          hard_frac=0.3, table_frac=0.3, structured_frac=0.6,
          replay=3, seed=5304,
          distill_from=f"{A}/ppocrv5/det/native_params.npz",
          distill_w=0.5)
print("=== JOB 3 (server det distill) DONE ===", flush=True)
