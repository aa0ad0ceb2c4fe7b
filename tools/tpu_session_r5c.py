"""Round-5 TPU session C: pallas2 + extraction-window decision.

  1. standalone device_boxes A/B: scan / pallas / pallas2 on real maps
  2. full onecall A/B: scan vs pallas2 vs pallas2+window(320) on both
     profiled pages, masked packed-buffer comparison (valid rows only)
  3. per-page full-program timing across the WHOLE corpus at the winner
     (explains corpus-wide device_ms vs profiled-shape gap)
  4. vmap(pallas2) wave-tier check
  5. eval gate at the winning config

    python tools/tpu_session_r5c.py 2>&1 | tee scratch/tpu_r5c.log
"""
import contextlib
import glob
import io
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "tools")

T0 = time.time()


def note(msg):
    print("[r5c %6.1fs] %s" % (time.time() - T0, msg), flush=True)


def timeit(name, fn, args, n=8):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / n * 1000.0
    note("%-40s %8.2f ms" % (name, ms))
    return ms


def masked_compare(tag, a, b, k_rec):
    """Compare packed onecall buffers on valid rows only (invalid rows
    carry garbage/nan in BOTH paths)."""
    va = a[:k_rec][a[:k_rec, 9] > 0.5]
    vb = b[:k_rec][b[:k_rec, 9] > 0.5]
    if va.shape != vb.shape:
        note("compare %s: VALID-COUNT MISMATCH %s vs %s" %
             (tag, va.shape, vb.shape))
        return
    d = float(np.abs(va - vb).max()) if va.size else 0.0
    note("compare %s: n_valid=%d max|d|=%.4g n_det=%s vs %s" %
         (tag, va.shape[0], d, a[k_rec, 0], b[k_rec, 0]))


def main():
    import cv2
    import jax
    import jax.numpy as jnp
    import onnxocr_tpu  # noqa: F401
    from onnxocr_tpu import ONNXPaddleOcr
    from onnxocr_tpu.ops import det_pre, resize_dev, db_device

    note("devices: %s" % jax.devices())
    t = time.time()
    np.asarray(jax.device_put(np.ones(8, np.uint8)))
    note("first download done (%.1fs)" % (time.time() - t))

    base = ONNXPaddleOcr(use_angle_cls=True, use_gpu=False, drop_score=0.0,
                         tpu_det_microbatch=False, tpu_rec_microbatch=False,
                         tpu_pipeline="onecall")
    det = base.text_detector
    pp = det.postprocess_op
    oc = base.k = base._onecall
    k_det, k_rec = oc.k_det, oc.k_rec

    paths = sorted(glob.glob("onnxocr_tpu/test_images/*.png") +
                   glob.glob("onnxocr_tpu/test_images/*.jpg"))
    # real prob maps from two pages
    probs = []
    for p in paths[:2]:
        img = cv2.imread(p)
        image_dev, src_h, src_w = resize_dev.put_src_bucket(img, "auto")
        rh, rw = det_pre.det_resize_target(src_h, src_w,
                                           det.limit_side_len,
                                           det.limit_type)
        cap = det_pre.round_up(int(det.limit_side_len), det.bucket)
        hb = wb = max(cap, det_pre.round_up(max(rh, rw), det.bucket))
        from onnxocr_tpu.models import dbnet

        @jax.jit
        def fwd(pdev, image_u8, s_h, s_w, r_h, r_w):
            x = resize_dev.resize_normalize_det(image_u8, s_h, s_w,
                                                r_h, r_w, hb, wb)
            return dbnet.apply(pdev, x[None].astype(det.forward.dtype),
                               backbone_arch=det.forward.arch,
                               valid_hw=(jnp.reshape(r_h, (1,)),
                                         jnp.reshape(r_w, (1,))))[0]
        prob = fwd(det.forward.pdev, image_dev, jnp.int32(src_h),
                   jnp.int32(src_w), jnp.int32(rh), jnp.int32(rw))
        probs.append((p.split("/")[-1], prob.astype(jnp.float32),
                      int(rh), int(rw)))

    # ---- 1. standalone A/B
    results = {}
    outs = {}
    for mode in ("scan", "pallas", "pallas2"):
        def run(prob, r_h, r_w, _m=mode):
            return db_device.device_boxes(
                prob, r_h, r_w, max_k=k_det, thresh=pp.thresh,
                box_thresh=pp.box_thresh, unclip_ratio=pp.unclip_ratio,
                min_size=float(pp.min_size), scale=oc.extract_scale,
                score_scale=oc.score_scale, reduce=_m,
                score_k=oc.score_k)
        for name, prob, rh, rw in probs:
            key = "boxes_%s@%s" % (mode, name)
            try:
                results[key] = timeit(key, run,
                                      (prob, jnp.int32(rh), jnp.int32(rw)))
                outs[key] = [np.asarray(x) for x in
                             run(prob, jnp.int32(rh), jnp.int32(rw))]
            except Exception as e:
                note("%s FAILED: %r" % (key, e))
    for name, prob, rh, rw in probs:
        sb = outs.get("boxes_scan@" + name)
        for mode in ("pallas", "pallas2"):
            g = outs.get("boxes_%s@%s" % (mode, name))
            if sb is None or g is None:
                continue
            vb, vg = sb[2], g[2]
            same = bool((vb == vg).all())
            dq = float(np.abs(sb[0][vb] - g[0][vb]).max()) if vb.any() \
                else 0.0
            note("boxes equal %s@%s: valid=%s dquad=%.4g" %
                 (mode, name, same, dq))

    # ---- 2. full-program A/B
    variants = {
        "scan": dict(tpu_db_reduce="scan"),
        "pallas2": dict(tpu_db_reduce="pallas2"),
        "pallas2_win": dict(tpu_db_reduce="pallas2",
                            tpu_det_extract_window=320),
    }
    models = {k: ONNXPaddleOcr(use_angle_cls=True, use_gpu=False,
                               drop_score=0.0, tpu_det_microbatch=False,
                               tpu_rec_microbatch=False,
                               tpu_pipeline="onecall", **kw)
              for k, kw in variants.items()}
    packed = {}
    for pth in paths[:2]:
        img = cv2.imread(pth)
        name = pth.split("/")[-1]
        for vname, model in models.items():
            moc = model._onecall
            mdet = model.text_detector
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
            key = "onecall_%s@%s" % (vname, name)
            try:
                results[key] = timeit(
                    key, lambda *a, _f=fn, _h=hb, _w=wb, _e=eh, _x=ew:
                    _f(*a, out_h=_h, out_w=_w, ex_h=_e, ex_w=_x), args)
                packed[key] = np.asarray(
                    fn(*args, out_h=hb, out_w=wb, ex_h=eh, ex_w=ew))
            except Exception as e:
                note("%s FAILED: %r" % (key, e))
    for pth in paths[:2]:
        name = pth.split("/")[-1]
        a = packed.get("onecall_scan@" + name)
        for vname in ("pallas2", "pallas2_win"):
            b = packed.get("onecall_%s@%s" % (vname, name))
            if a is not None and b is not None:
                masked_compare("%s@%s" % (vname, name), a, b, k_rec)

    # ---- 3. per-page full-program timing across the corpus (winner cfg)
    note("--- corpus sweep (pallas2_win) ---")
    model = models["pallas2_win"]
    moc = model._onecall
    mdet = model.text_detector
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
        fn = moc._jit[True]
        det_p, cls_p, rec_p = moc._params(True)
        args = (det_p, cls_p, rec_p, image_dev, jnp.int32(src_h),
                jnp.int32(src_w), jnp.int32(rh), jnp.int32(rw))
        try:
            sweep[name] = timeit(
                "sweep %s src=%s ex=%dx%d" % (name, tuple(image_dev.shape),
                                              eh, ew),
                lambda *a, _f=fn, _h=hb, _w=wb, _e=eh, _x=ew:
                _f(*a, out_h=_h, out_w=_w, ex_h=_e, ex_w=_x), args, n=4)
        except Exception as e:
            note("sweep %s FAILED: %r" % (name, e))
    if sweep:
        vals = sorted(sweep.values())
        note("corpus device ms: mean=%.1f median=%.1f max=%.1f" %
             (float(np.mean(vals)), vals[len(vals) // 2], vals[-1]))

    # ---- 4. vmap wave-tier check at pallas2
    try:
        prob2 = jnp.stack([probs[0][1], probs[0][1]])
        rh2 = jnp.full((2,), probs[0][2], jnp.int32)
        rw2 = jnp.full((2,), probs[0][3], jnp.int32)

        @jax.jit
        def vm(prob2, rh2, rw2):
            return jax.vmap(lambda p, a, b: db_device.device_boxes(
                p, a, b, max_k=k_det, thresh=pp.thresh,
                box_thresh=pp.box_thresh, unclip_ratio=pp.unclip_ratio,
                min_size=float(pp.min_size), scale=oc.extract_scale,
                score_scale=oc.score_scale, reduce="pallas2",
                score_k=oc.score_k))(prob2, rh2, rw2)
        jax.block_until_ready(vm(prob2, rh2, rw2))
        note("vmap(pallas2) OK")
        results["vmap_pallas2_ok"] = True
    except Exception as e:
        note("vmap(pallas2) FAILED: %r" % e)
        results["vmap_pallas2_ok"] = False

    # ---- 5. eval gate at the winning config
    import importlib
    eval_heldout = importlib.import_module("eval_heldout")
    old = sys.argv
    buf = io.StringIO()
    try:
        sys.argv = ["eval_heldout.py", "--json",
                    "--set", "tpu_db_reduce=pallas2",
                    "--set", "tpu_det_extract_window=320",
                    "--pipeline", "onecall"]
        with contextlib.redirect_stdout(buf):
            eval_heldout.main()
    finally:
        sys.argv = old
    out = buf.getvalue().strip().splitlines()[-1]
    with open("scratch/evalgate_r5_pallas2win.json", "w") as f:
        f.write(out + "\n")
    s = json.loads(out)["summary"]
    note("eval pallas2+win: %s / %s subtotals=%s" % (
        s["line_recall@0.5"], s["char_accuracy"], s["subtotals"]))

    note(json.dumps({k: v for k, v in results.items()
                     if not isinstance(v, dict)}))
    note("session C done")


if __name__ == "__main__":
    main()
