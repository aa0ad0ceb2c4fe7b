"""Round-5 TPU session I: shear-staged warp decision + training-chain gates.

Runs as ONE long-lived TPU process (fresh processes pay multi-minute
spin-up + a 69-645 s first-download stall on this link; CLAUDE.md):

  1. full-program A/B sweep: tpu_warp_stage off vs shear on the
     representative corpus pages (doc pages were WARP-bound: rec_warp
     99 ms + cls_warp 29 ms on doc_a, profile r5d/r5f)
  2. held-out eval gate for tpu_warp_stage=shear (onecall) —
     must be head-equal (head: 0.864/0.764, real 0.730/0.683)
  3. eval gates for the round5_train.py checkpoints that exist:
     rec grown (JOB 1), det continuation (JOB 2), server-det
     distillation (JOB 3, server-family harness)

Each step writes scratch/evalgate_r5i_*.json and skips itself if the
output already exists (crash-resumable). Decisions/ledger lines happen
AFTER this session, via tools/evalgate.py log.

    python -u tools/tpu_session_r5i.py 2>&1 | tee scratch/tpu_r5i.log
"""
import contextlib
import glob
import importlib
import io
import json
import os
import shutil
import sys
import time

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "tools")

T0 = time.time()
A = "onnxocr_tpu/assets"


def note(msg):
    print("[r5i %6.1fs] %s" % (time.time() - T0, msg), flush=True)


def timeit(fn, args, kw, n=4):
    import jax
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1000.0


def sweep(model, tag, pages):
    import cv2
    import jax.numpy as jnp
    from onnxocr_tpu.ops import det_pre, resize_dev
    moc = model._onecall
    mdet = model.text_detector
    out = {}
    for pth in pages:
        img = cv2.imread(pth)
        if img is None:
            continue
        name = os.path.basename(pth)
        image_dev, src_h, src_w = resize_dev.put_src_bucket(img, "auto")
        rh, rw = det_pre.det_resize_target(
            src_h, src_w, mdet.limit_side_len, mdet.limit_type)
        cap = det_pre.round_up(int(mdet.limit_side_len), mdet.bucket)
        hb = wb = max(cap, det_pre.round_up(max(rh, rw), mdet.bucket))
        eh, ew = moc._ex_window(rh, rw, hb, wb)
        fn = moc._jit.get(True) or moc._build(True)
        moc._jit[True] = fn
        det_p, cls_p, rec_p = moc._params(True)
        args = (det_p, cls_p, rec_p, image_dev, jnp.int32(src_h),
                jnp.int32(src_w), jnp.int32(rh), jnp.int32(rw))
        try:
            ms = timeit(fn, args,
                        dict(out_h=hb, out_w=wb, ex_h=eh, ex_w=ew))
            out[name] = ms
            note("%s %-18s %7.1f ms" % (tag, name, ms))
        except Exception as e:
            note("%s %s FAILED: %r" % (tag, name, e))
    if out:
        vals = sorted(out.values())
        note("%s corpus: mean=%.1f median=%.1f max=%.1f" %
             (tag, float(np.mean(vals)), vals[len(vals) // 2], vals[-1]))
    return out


def run_eval(out_path, extra_argv):
    if os.path.exists(out_path):
        note("skip (exists): %s" % out_path)
        with open(out_path) as f:
            return json.loads(f.read())["summary"]
    eval_heldout = importlib.import_module("eval_heldout")
    old = sys.argv
    buf = io.StringIO()
    try:
        sys.argv = ["eval_heldout.py", "--json", "--pipeline", "onecall"] \
            + extra_argv
        with contextlib.redirect_stdout(buf):
            eval_heldout.main()
    finally:
        sys.argv = old
    out = buf.getvalue().strip().splitlines()[-1]
    with open(out_path, "w") as f:
        f.write(out + "\n")
    s = json.loads(out)["summary"]
    note("eval %s: %s/%s real=%s" % (
        os.path.basename(out_path), s["line_recall@0.5"],
        s["char_accuracy"], s["subtotals"].get("real")))
    return s


def gate_dir(name, ckpt, kind, copy_cal_from=None):
    d = "scratch/gate_%s" % name
    os.makedirs(d, exist_ok=True)
    shutil.copy(ckpt, os.path.join(d, "native_params.npz"))
    if copy_cal_from and os.path.exists(copy_cal_from):
        shutil.copy(copy_cal_from, os.path.join(d, "calibration.json"))
    return os.path.join(d, "%s.onnx" % kind)


def main():
    import jax
    import onnxocr_tpu  # noqa: F401  (XLA persistent cache)
    from onnxocr_tpu import ONNXPaddleOcr

    os.makedirs("scratch", exist_ok=True)
    note("devices: %s" % jax.devices())
    t = time.time()
    np.asarray(jax.device_put(np.ones(8, np.uint8)))
    note("first download done (%.1fs)" % (time.time() - t))

    pages = [os.path.join("onnxocr_tpu/test_images", n) for n in
             ("doc_a.jpg", "doc_b.jpg", "banner.jpg", "big_doc.jpg",
              "dense.jpg", "receipt.jpg", "photo_hard.jpg", "card.jpg")]

    # ---- 1. shear warp A/B sweep
    ab_path = "scratch/r5i_shear_ab.json"
    if not os.path.exists(ab_path):
        base_kw = dict(use_angle_cls=True, use_gpu=False, drop_score=0.0,
                       tpu_det_microbatch=False, tpu_rec_microbatch=False,
                       tpu_pipeline="onecall")
        m_off = ONNXPaddleOcr(**base_kw)
        off = sweep(m_off, "off  ", pages)
        m_sh = ONNXPaddleOcr(tpu_warp_stage="shear", **base_kw)
        sh = sweep(m_sh, "shear", pages)
        with open(ab_path, "w") as f:
            json.dump({"off": off, "shear": sh}, f)
        del m_off, m_sh
    else:
        note("skip (exists): %s" % ab_path)

    # ---- 2. shear eval gate
    run_eval("scratch/evalgate_r5i_shear.json",
             ["--set", "tpu_warp_stage=shear"])

    # ---- 3. training-chain gates
    rec_ck = "scratch/ckpt_rec_grown_r5.npz"
    if os.path.exists(rec_ck):
        run_eval("scratch/evalgate_r5i_rec_grown.json",
                 ["--rec-dir", gate_dir("rec_grown", rec_ck, "rec")])
    else:
        note("no rec grown checkpoint yet")

    det_ck = "scratch/ckpt_det_r5.npz"
    if os.path.exists(det_ck):
        run_eval("scratch/evalgate_r5i_det.json",
                 ["--det-dir",
                  gate_dir("det_r5", det_ck, "det",
                           copy_cal_from=f"{A}/ppocrv5/det/calibration.json")])
    else:
        note("no det checkpoint yet")

    srv_ck = "scratch/ckpt_det_server_r5.npz"
    if os.path.exists(srv_ck):
        # server-family harness: family rec/cls/dict + candidate det
        from onnxocr_tpu.service.engine import MODEL_REGISTRY
        from onnxocr_tpu import config as cfg_mod
        reg = MODEL_REGISTRY.get("ch_ppocr_server_v2.0", {})
        extra = []
        for key, rel in reg.items():
            if key == "det_model_dir":
                continue
            extra += ["--set", "%s=%s" % (key, cfg_mod.find_asset(rel))]
        run_eval("scratch/evalgate_r5i_server_cand.json",
                 ["--det-dir",
                  gate_dir("server_det", srv_ck, "det",
                           copy_cal_from=f"{A}/ppocrv5/det/calibration.json")]
                 + extra)
        # head-to-head: the family's current fallback config
        srv_args = []
        for key, rel in reg.items():
            srv_args += ["--set", "%s=%s" % (key, cfg_mod.find_asset(rel))]
        run_eval("scratch/evalgate_r5i_server_head.json", srv_args)
    else:
        note("no server det checkpoint yet")

    note("session I done")


if __name__ == "__main__":
    main()
