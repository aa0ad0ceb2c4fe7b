"""Round-5 TPU session A: one long-lived process for the first
interactive block (CLAUDE.md: one TPU client at a time; spin-up and the
first-download stall are paid once here instead of per-tool).

Sequence:
  1. absorb first-download stall
  2. reduce-mode A/B (scan/dot/pallas) on real prob maps + vmap check
  3. per-stage profile at HEAD (tools/profile_onecall.py main)
  4. eval gate: scratch/ckpt_rec_v5_photo.npz (the round-4 orphan)
  5. eval A/B: tpu_det_dtype=bfloat16 (real-only set for speed)

    python tools/tpu_session_r5a.py 2>&1 | tee scratch/tpu_r5a.log
"""
import contextlib
import io
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")

T0 = time.time()


def note(msg):
    print("[r5a %6.1fs] %s" % (time.time() - T0, msg), flush=True)


def run_eval(tag, argv):
    """Run tools/eval_heldout.py in-process (no new TPU client)."""
    import importlib
    sys.path.insert(0, "tools")
    eval_heldout = importlib.import_module("eval_heldout")
    old_argv = sys.argv
    buf = io.StringIO()
    try:
        sys.argv = ["eval_heldout.py"] + argv
        with contextlib.redirect_stdout(buf):
            eval_heldout.main()
    finally:
        sys.argv = old_argv
    out = buf.getvalue().strip().splitlines()[-1]
    path = "scratch/evalgate_%s.json" % tag
    with open(path, "w") as f:
        f.write(out + "\n")
    summary = json.loads(out).get("summary", json.loads(out))
    note("eval %s: recall=%s char=%s subtotals=%s (-> %s)" % (
        tag, summary.get("line_recall@0.5"), summary.get("char_accuracy"),
        summary.get("subtotals"), path))
    return summary


def main():
    import jax
    note("devices: %s" % jax.devices())
    t = time.time()
    np.asarray(jax.device_put(np.ones(8, np.uint8)))
    note("first download done (%.1fs)" % (time.time() - t))

    # ---- 2. reduce-mode A/B
    note("=== ab_reduce ===")
    import importlib
    sys.path.insert(0, "tools")
    try:
        ab = importlib.import_module("ab_reduce_r5")
        ab.main()
    except Exception as e:
        note("ab_reduce FAILED: %r" % e)

    # ---- 3. stage profile
    note("=== profile_onecall ===")
    try:
        prof = importlib.import_module("profile_onecall")
        prof.main()
    except Exception as e:
        note("profile FAILED: %r" % e)

    # ---- 4. orphan rec gate
    note("=== gate: ckpt_rec_v5_photo ===")
    if os.path.exists("scratch/gate_photo/native_params.npz"):
        try:
            run_eval("r5_photo_cand",
                     ["--rec-dir", "scratch/gate_photo/rec.onnx", "--json"])
        except Exception as e:
            note("gate FAILED: %r" % e)

    # ---- 5. det bf16 A/B (real subset for speed; full set if it wins)
    note("=== det bf16 eval ===")
    try:
        run_eval("r5_det_bf16",
                 ["--set", "tpu_det_dtype=bfloat16", "--json"])
    except Exception as e:
        note("det bf16 FAILED: %r" % e)

    note("session A done")


if __name__ == "__main__":
    main()
