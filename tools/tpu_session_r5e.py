"""Round-5 TPU session E: staged separable warp decision.

  1. profile doc_a (rec_warp was 99 ms of its 148 ms program)
  2. corpus per-page full-program sweep at HEAD defaults
  3. held-out eval gate (staged warp on by default — must stay
     equal-or-better; tilted real-page crops keep the gather path)

    python -u tools/tpu_session_r5e.py 2>&1 | tee scratch/tpu_r5e.log
"""
import contextlib
import glob
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
    print("[r5e %6.1fs] %s" % (time.time() - T0, msg), flush=True)


def timeit(name, fn, args, n=6):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / n * 1000.0
    note("%-44s %8.2f ms" % (name, ms))
    return ms


def main():
    import cv2
    import jax
    import jax.numpy as jnp
    import onnxocr_tpu  # noqa: F401
    from onnxocr_tpu import ONNXPaddleOcr
    from onnxocr_tpu.ops import det_pre, resize_dev

    note("devices: %s" % jax.devices())
    t = time.time()
    np.asarray(jax.device_put(np.ones(8, np.uint8)))
    note("first download done (%.1fs)" % (time.time() - t))

    # ---- 1. doc_a stage profile (picks up the staged warp)
    os.environ["ONNXOCR_PROFILE_IMAGE"] = \
        "onnxocr_tpu/test_images/doc_a.jpg"
    prof = importlib.import_module("profile_onecall")
    try:
        prof.main()
    except Exception as e:
        note("profile FAILED: %r" % e)

    # ---- 2. corpus sweep at HEAD defaults
    model = ONNXPaddleOcr(use_angle_cls=True, use_gpu=False,
                          drop_score=0.0, tpu_det_microbatch=False,
                          tpu_rec_microbatch=False, tpu_pipeline="onecall")
    moc = model._onecall
    mdet = model.text_detector
    paths = sorted(glob.glob("onnxocr_tpu/test_images/*.png") +
                   glob.glob("onnxocr_tpu/test_images/*.jpg"))
    sweep = {}
    for pth in paths:
        img = cv2.imread(pth)
        if img is None:
            continue
        name = pth.split("/")[-1]
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
            sweep[name] = timeit(
                "sweep %s ex=%dx%d" % (name, eh, ew),
                lambda *a, _f=fn, _h=hb, _w=wb, _e=eh, _x=ew:
                _f(*a, out_h=_h, out_w=_w, ex_h=_e, ex_w=_x), args, n=4)
        except Exception as e:
            note("sweep %s FAILED: %r" % (name, e))
    if sweep:
        vals = sorted(sweep.values())
        note("corpus device ms: mean=%.1f median=%.1f max=%.1f" %
             (float(np.mean(vals)), vals[len(vals) // 2], vals[-1]))

    # ---- 3. eval gate at HEAD defaults (staged warp active)
    eval_heldout = importlib.import_module("eval_heldout")
    old = sys.argv
    buf = io.StringIO()
    try:
        sys.argv = ["eval_heldout.py", "--json", "--pipeline", "onecall"]
        with contextlib.redirect_stdout(buf):
            eval_heldout.main()
    finally:
        sys.argv = old
    out = buf.getvalue().strip().splitlines()[-1]
    with open("scratch/evalgate_r5_stagedwarp.json", "w") as f:
        f.write(out + "\n")
    s = json.loads(out)["summary"]
    note("eval staged-warp: %s / %s subtotals=%s" % (
        s["line_recall@0.5"], s["char_accuracy"], s["subtotals"]))
    note("session E done")


if __name__ == "__main__":
    main()
