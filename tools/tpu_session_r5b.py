"""Round-5 TPU session B: pallas reduce-mode decision.

  1. re-run the reduce A/B (trace bug fixed: static `big`)
  2. full onecall program A/B: tpu_db_reduce scan vs pallas on both
     profiled pages
  3. if pallas holds up: held-out eval gate at tpu_db_reduce=pallas
     (must be output-equal-or-better)

    python tools/tpu_session_r5b.py 2>&1 | tee scratch/tpu_r5b.log
"""
import contextlib
import io
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "tools")

T0 = time.time()


def note(msg):
    print("[r5b %6.1fs] %s" % (time.time() - T0, msg), flush=True)


def timeit(name, fn, args, n=10):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / n * 1000.0
    note("%-32s %8.2f ms" % (name, ms))
    return ms


def main():
    import cv2
    import glob
    import jax
    import jax.numpy as jnp
    import onnxocr_tpu  # noqa: F401
    from onnxocr_tpu import ONNXPaddleOcr
    from onnxocr_tpu.ops import det_pre, resize_dev

    note("devices: %s" % jax.devices())
    t = time.time()
    np.asarray(jax.device_put(np.ones(8, np.uint8)))
    note("first download done (%.1fs)" % (time.time() - t))

    # ---- 1. standalone reduce A/B
    import importlib
    ab = importlib.import_module("ab_reduce_r5")
    ab.main()

    # ---- 2. full-program A/B: one OneCallPipeline per reduce mode
    results = {}
    paths = sorted(glob.glob("onnxocr_tpu/test_images/*.png") +
                   glob.glob("onnxocr_tpu/test_images/*.jpg"))[:2]
    models = {}
    for mode in ("scan", "pallas"):
        models[mode] = ONNXPaddleOcr(
            use_angle_cls=True, use_gpu=False, drop_score=0.0,
            tpu_det_microbatch=False, tpu_rec_microbatch=False,
            tpu_pipeline="onecall", tpu_db_reduce=mode)
    outs = {}
    for p in paths:
        img = cv2.imread(p)
        for mode, model in models.items():
            oc = model._onecall
            det = model.text_detector
            image_dev, src_h, src_w = resize_dev.put_src_bucket(img, "auto")
            rh, rw = det_pre.det_resize_target(
                src_h, src_w, det.limit_side_len, det.limit_type)
            cap = det_pre.round_up(int(det.limit_side_len), det.bucket)
            hb = wb = max(cap, det_pre.round_up(max(rh, rw), det.bucket))
            fn = oc._jit.get(True) or oc._build(True)
            oc._jit[True] = fn
            det_p, cls_p, rec_p = oc._params(True)
            args = (det_p, cls_p, rec_p, image_dev, jnp.int32(src_h),
                    jnp.int32(src_w), jnp.int32(rh), jnp.int32(rw))
            key = "onecall_%s@%s" % (mode, p.split("/")[-1])
            try:
                results[key] = timeit(
                    key, lambda *a, _f=fn, _h=hb, _w=wb:
                    _f(*a, out_h=_h, out_w=_w), args, n=8)
                outs[key] = np.asarray(fn(*args, out_h=hb, out_w=wb))
            except Exception as e:
                note("%s FAILED: %r" % (key, e))
                results[key] = None
    for p in paths:
        b = outs.get("onecall_scan@%s" % p.split("/")[-1])
        g = outs.get("onecall_pallas@%s" % p.split("/")[-1])
        if b is not None and g is not None:
            note("packed equal @%s: %s (max|d|=%.4g)" % (
                p.split("/")[-1], bool((b == g).all()),
                float(np.abs(b - g).max())))

    # ---- 3. eval gate at pallas
    ok = all(v is not None for k, v in results.items() if "pallas" in k)
    if ok:
        eval_heldout = importlib.import_module("eval_heldout")
        old = sys.argv
        buf = io.StringIO()
        try:
            sys.argv = ["eval_heldout.py", "--json",
                        "--set", "tpu_db_reduce=pallas",
                        "--pipeline", "onecall"]
            with contextlib.redirect_stdout(buf):
                eval_heldout.main()
        finally:
            sys.argv = old
        out = buf.getvalue().strip().splitlines()[-1]
        with open("scratch/evalgate_r5_pallas.json", "w") as f:
            f.write(out + "\n")
        s = json.loads(out)["summary"]
        note("eval pallas: %s / %s subtotals=%s" % (
            s["line_recall@0.5"], s["char_accuracy"], s["subtotals"]))
    note(json.dumps(results))
    note("session B done")


if __name__ == "__main__":
    main()
