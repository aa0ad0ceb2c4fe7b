"""Round-5 TPU session H: gate the training-chain candidates.

Runs after tools/round5_train.py finishes. One process, three gates:
  1. grown rec   (scratch/ckpt_rec_grown_r5.npz)
  2. det r5      (scratch/ckpt_det_r5.npz)
  3. server det  (scratch/ckpt_det_server_r5.npz) — server-family gate:
     evaluated as the ch_ppocr_server_v2.0 det against the current
     mbv3 fallback baseline.

    python -u tools/tpu_session_r5h.py 2>&1 | tee scratch/tpu_r5h.log
"""
import contextlib
import io
import importlib
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "tools")

T0 = time.time()


def note(msg):
    print("[r5h %6.1fs] %s" % (time.time() - T0, msg), flush=True)


def run_eval(tag, argv):
    eval_heldout = importlib.import_module("eval_heldout")
    old = sys.argv
    buf = io.StringIO()
    try:
        sys.argv = ["eval_heldout.py"] + argv
        with contextlib.redirect_stdout(buf):
            eval_heldout.main()
    finally:
        sys.argv = old
    out = buf.getvalue().strip().splitlines()[-1]
    path = "scratch/evalgate_%s.json" % tag
    with open(path, "w") as f:
        f.write(out + "\n")
    s = json.loads(out)["summary"]
    note("eval %s: %s / %s subtotals=%s" % (
        tag, s["line_recall@0.5"], s["char_accuracy"], s["subtotals"]))
    return s


def stage(src, kind):
    d = "scratch/gate_%s_%s" % (kind, os.path.basename(src).split(".")[0])
    os.makedirs(d, exist_ok=True)
    import shutil
    shutil.copy(src, os.path.join(d, "native_params.npz"))
    return os.path.join(d, "%s.onnx" % kind)


def main():
    import jax
    note("devices: %s" % jax.devices())
    t = time.time()
    np.asarray(jax.device_put(np.ones(8, np.uint8)))
    note("first download done (%.1fs)" % (time.time() - t))

    if os.path.exists("scratch/ckpt_rec_grown_r5.npz"):
        note("=== gate: grown rec ===")
        try:
            run_eval("r5_grown_rec",
                     ["--rec-dir",
                      stage("scratch/ckpt_rec_grown_r5.npz", "rec"),
                      "--json", "--pipeline", "onecall"])
        except Exception as e:
            note("grown rec FAILED: %r" % e)

    if os.path.exists("scratch/ckpt_det_r5.npz"):
        note("=== gate: det r5 ===")
        try:
            run_eval("r5_det_cont",
                     ["--det-dir", stage("scratch/ckpt_det_r5.npz", "det"),
                      "--json", "--pipeline", "onecall"])
        except Exception as e:
            note("det r5 FAILED: %r" % e)

    if os.path.exists("scratch/ckpt_det_server_r5.npz"):
        note("=== gate: server det (distilled) vs mbv3 fallback ===")
        # same-harness family gate: run the server model name with the
        # candidate det dir override, vs the fallback baseline
        try:
            run_eval("r5_server_head", ["--model", "ch_ppocr_server_v2.0",
                                        "--json"])
        except Exception as e:
            note("server head FAILED: %r" % e)
        try:
            # full server-family config: --det-dir alone would pair the
            # candidate with the v5 rec/cls; pass every server dir so
            # head and cand differ ONLY in the det checkpoint
            from onnxocr_tpu import config as cfg_mod
            run_eval("r5_server_cand",
                     ["--det-dir",
                      stage("scratch/ckpt_det_server_r5.npz", "det"),
                      "--set", "rec_model_dir=" + cfg_mod.find_asset(
                          "ch_ppocr_server_v2.0/rec/rec.onnx"),
                      "--set", "cls_model_dir=" + cfg_mod.find_asset(
                          "ch_ppocr_server_v2.0/cls/cls.onnx"),
                      "--set", "rec_char_dict_path=" + cfg_mod.find_asset(
                          "ch_ppocr_server_v2.0/ppocr_keys_v1.txt"),
                      "--json"])
        except Exception as e:
            note("server cand FAILED: %r" % e)

    note("session H done")


if __name__ == "__main__":
    main()
