"""Round-5 on-chip A/B: DB-extraction segment reductions.

Times db_device.device_boxes with reduce in {scan, dot, pallas} on real
prob maps at the shipped working grid (1x2), checks output equality
against the scan baseline, and vmap-compiles the pallas mode over a
2-page batch (wave-tier compatibility).

Run as the one long-lived TPU process:
    python tools/ab_reduce_r5.py 2>&1 | tee scratch/ab_reduce_r5.log
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def timeit(name, fn, args, n=10):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / n * 1000.0
    print("%-28s %8.2f ms" % (name, ms), flush=True)
    return ms


def main():
    import cv2
    import jax
    import jax.numpy as jnp
    import onnxocr_tpu  # noqa: F401  (XLA cache)
    from onnxocr_tpu import ONNXPaddleOcr
    from onnxocr_tpu.ops import det_pre, resize_dev, db_device
    from onnxocr_tpu.models import dbnet

    t0 = time.time()
    print("devices: %s" % jax.devices(), flush=True)
    np.asarray(jax.device_put(np.ones(8, np.uint8)))
    print("first download done %.1fs" % (time.time() - t0), flush=True)

    model = ONNXPaddleOcr(use_angle_cls=True, use_gpu=False, drop_score=0.0,
                          tpu_det_microbatch=False, tpu_rec_microbatch=False,
                          tpu_pipeline="onecall")
    oc = model._onecall
    det = model.text_detector
    pp = det.postprocess_op
    k_det = oc.k_det

    # real prob maps from two corpus pages (dense + sparse)
    import glob
    paths = sorted(glob.glob("onnxocr_tpu/test_images/*.png") +
                   glob.glob("onnxocr_tpu/test_images/*.jpg"))
    probs = []
    for p in paths[:2]:
        img = cv2.imread(p)
        image_dev, src_h, src_w = resize_dev.put_src_bucket(img, "auto")
        rh, rw = det_pre.det_resize_target(src_h, src_w,
                                           det.limit_side_len,
                                           det.limit_type)
        cap = det_pre.round_up(int(det.limit_side_len), det.bucket)
        hb = wb = max(cap, det_pre.round_up(max(rh, rw), det.bucket))

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
        probs.append((p, prob.astype(jnp.float32), int(rh), int(rw)))
        print("prob map %s %s valid %dx%d" % (p, prob.shape, rh, rw),
              flush=True)

    results = {}
    outs = {}
    for mode in ("scan", "dot", "pallas"):
        def run(prob, r_h, r_w, _m=mode):
            return db_device.device_boxes(
                prob, r_h, r_w, max_k=k_det, thresh=pp.thresh,
                box_thresh=pp.box_thresh, unclip_ratio=pp.unclip_ratio,
                min_size=float(pp.min_size), scale=oc.extract_scale,
                score_scale=oc.score_scale, reduce=_m,
                score_k=oc.score_k)
        for name, prob, rh, rw in probs:
            key = "%s@%s" % (mode, name.split("/")[-1])
            try:
                results[key] = timeit(key, run,
                                      (prob, jnp.int32(rh), jnp.int32(rw)))
                outs[key] = [np.asarray(x) for x in
                             run(prob, jnp.int32(rh), jnp.int32(rw))]
            except Exception as e:
                print("%s FAILED: %r" % (key, e), flush=True)
                results[key] = None

    # output equality vs scan
    for name, prob, rh, rw in probs:
        base = outs.get("scan@%s" % name.split("/")[-1])
        for mode in ("dot", "pallas"):
            got = outs.get("%s@%s" % (mode, name.split("/")[-1]))
            if base is None or got is None:
                continue
            vb, vg = base[2], got[2]
            same_valid = bool((vb == vg).all())
            dq = float(np.abs(base[0][vb] - got[0][vb]).max()) \
                if vb.any() else 0.0
            ds = float(np.abs(base[1][vb] - got[1][vb]).max()) \
                if vb.any() else 0.0
            print("equal %s vs scan @%s: valid=%s dquad=%.4g dscore=%.4g"
                  % (mode, name.split("/")[-1], same_valid, dq, ds),
                  flush=True)

    # wave-tier compatibility: vmap the pallas mode over a 2-page batch
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
                score_scale=oc.score_scale, reduce="pallas",
                score_k=oc.score_k))(prob2, rh2, rw2)
        out2 = vm(prob2, rh2, rw2)
        jax.block_until_ready(out2)
        print("vmap(pallas) OK: %s" % (out2[0].shape,), flush=True)
        results["vmap_pallas_ok"] = True
    except Exception as e:
        print("vmap(pallas) FAILED: %r" % e, flush=True)
        results["vmap_pallas_ok"] = False

    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
