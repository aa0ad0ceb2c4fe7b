"""Standalone device A/B of the crop warp: gather vs shear-staged.

Builds doc_a's REAL onecall crop matrices (device DB extraction +
warp_dev.crop_matrices), pads to K_rec slots, and times:
  * warp_crops gather (status quo)
  * warp_crops staged='shear'
  * the shear sub-passes in isolation (stage rows / pass 1 y / pass 2a x)
so a flat full-program A/B can be attributed to the pass that owns it.

    python -u tools/ab_warp_shear.py 2>&1 | tee scratch/ab_warp_shear.log
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")

T0 = time.time()


def note(msg):
    print("[abw %6.1fs] %s" % (time.time() - T0, msg), flush=True)


def timeit(name, fn, *args, n=8):
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
    import jax
    import jax.numpy as jnp
    import functools
    import onnxocr_tpu  # noqa: F401
    from onnxocr_tpu import ONNXPaddleOcr
    from onnxocr_tpu.ops import det_pre, resize_dev, db_device, warp_dev
    from onnxocr_tpu.ops import warp as W
    from onnxocr_tpu.models import dbnet

    note("devices: %s" % jax.devices())
    t = time.time()
    np.asarray(jax.device_put(np.ones(8, np.uint8)))
    note("first download done (%.1fs)" % (time.time() - t))

    m = ONNXPaddleOcr(use_angle_cls=True, use_gpu=False, drop_score=0.0,
                      tpu_pipeline="onecall")
    det = m.text_detector
    oc = m._onecall
    img = cv2.imread("onnxocr_tpu/test_images/doc_a.jpg")
    image_dev, src_h, src_w = resize_dev.put_src_bucket(img, "auto")
    rh, rw = det_pre.det_resize_target(src_h, src_w, det.limit_side_len,
                                       det.limit_type)
    hb = wb = max(det_pre.round_up(int(det.limit_side_len), det.bucket),
                  det_pre.round_up(max(rh, rw), det.bucket))
    x = resize_dev.resize_normalize_det(
        image_dev, jnp.int32(src_h), jnp.int32(src_w), jnp.int32(rh),
        jnp.int32(rw), hb, wb)
    prob = dbnet.apply(det.forward.pdev, x[None].astype(det.forward.dtype),
                       backbone_arch=det.forward.arch,
                       valid_hw=(jnp.reshape(jnp.int32(rh), (1,)),
                                 jnp.reshape(jnp.int32(rw), (1,))))[0]
    pp = det.postprocess_op
    quads_m, scores, valid = db_device.device_boxes(
        prob.astype(jnp.float32), jnp.int32(rh), jnp.int32(rw),
        max_k=oc.k_det, thresh=pp.thresh, box_thresh=pp.box_thresh,
        unclip_ratio=pp.unclip_ratio, min_size=float(pp.min_size),
        scale=oc.extract_scale, score_scale=oc.score_scale,
        reduce=oc.db_reduce, score_k=oc.score_k)
    fw = jnp.float32(src_w)
    fh = jnp.float32(src_h)
    qx = jnp.clip(jnp.round(quads_m[..., 0] / jnp.float32(rw) * fw), 0, fw)
    qy = jnp.clip(jnp.round(quads_m[..., 1] / jnp.float32(rh) * fh), 0, fh)
    quads_s = warp_dev.order_points_clockwise(jnp.stack([qx, qy], -1))
    quads_s, keep = warp_dev.clip_filter_boxes(quads_s, jnp.int32(src_h),
                                               jnp.int32(src_w))
    valid = valid & keep
    order = jnp.argsort(jnp.where(valid, 0, 1), stable=True)
    take = order[:oc.k_rec]
    rec_m, rec_rot, rec_vw, _ = warp_dev.crop_matrices(
        quads_s[take], valid[take], oc.imgH, oc.rec_w)
    rec_vw = jnp.where(valid[take], rec_vw, 0)
    mats = jax.device_put(np.asarray(rec_m))
    vw = jax.device_put(np.asarray(rec_vw))
    n_valid = int(np.asarray(valid).sum())
    elig = np.asarray(W._shear_mask(jnp.asarray(np.asarray(rec_m)),
                                    image_dev.shape[0],
                                    jnp.asarray(np.asarray(rec_vw)),
                                    oc.imgH))
    note("page %s canvas %dx%d src_bucket %s n_valid %d elig %d/%d" %
         (img.shape, hb, wb, image_dev.shape, n_valid,
          int(elig[:n_valid].sum()), n_valid))

    out_h, out_w = oc.imgH, oc.rec_w
    timeit("gather", functools.partial(
        W.warp_crops, out_h=out_h, out_w=out_w, interp="bilinear",
        staged=False), image_dev, mats, vw)
    timeit("shear", functools.partial(
        W.warp_crops, out_h=out_h, out_w=out_w, interp="bilinear",
        staged="shear"), image_dev, mats, vw)
    timeit("upright", functools.partial(
        W.warp_crops, out_h=out_h, out_w=out_w, interp="bilinear",
        staged=True), image_dev, mats, vw)

    # --- sub-passes
    H, Wd = image_dev.shape[:2]
    K = mats.shape[0]

    @jax.jit
    def sub_stage(image_u8, mats, valid_w):
        a, b, c, d, e, f, _ = W._shear_affine(mats, valid_w, out_h)
        X = jnp.maximum(valid_w.astype(jnp.float32) - 1.0, 1.0)
        p00y = f
        p10y = d * X + f
        p01y = e * (out_h - 1.0) + f
        p11y = d * X + e * (out_h - 1.0) + f
        y0 = jnp.clip(jnp.floor(jnp.minimum(
            jnp.minimum(p00y, p10y), jnp.minimum(p01y, p11y))) - 1.0,
            0.0, float(max(H - 1, 0)))
        rows = jnp.clip(y0[:, None].astype(jnp.int32) +
                        jnp.arange(W._STAGE_ROWS, dtype=jnp.int32)[None, :],
                        0, H - 1)
        stage = jnp.take(image_u8, rows.reshape(-1), axis=0)
        return stage.reshape(K, W._STAGE_ROWS, Wd, 3).astype(jnp.float32)

    stage = timeit("sub: stage rows", sub_stage, image_dev, mats, vw)
    stage_arr = sub_stage(image_dev, mats, vw)

    @jax.jit
    def sub_pass1(stage, mats, valid_w):
        a, b, c, d, e, f, _ = W._shear_affine(mats, valid_w, out_h)
        a = jnp.where(jnp.abs(a) >= 0.05, a, 1.0)
        vs = jnp.arange(out_h, dtype=jnp.float32)
        ws = jnp.arange(Wd, dtype=jnp.float32)
        rs = jnp.arange(W._STAGE_ROWS, dtype=jnp.float32)
        A = d / a
        sig = (A[:, None, None] * (ws[None, None, :] -
                                   b[:, None, None] * vs[None, :, None] -
                                   c[:, None, None]) +
               e[:, None, None] * vs[None, :, None] + f[:, None, None])
        sig = jnp.clip(sig, 0.0, H - 1.0)
        sig = jnp.clip(sig, 0.0, W._STAGE_ROWS - 1.0)
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(sig[:, :, :, None] -
                                            rs[None, None, None, :]))
        return jnp.einsum("kvwr,krwc->kvwc", wy, stage)

    timeit("sub: pass1 y einsum", sub_pass1, stage_arr, mats, vw)
    T = sub_pass1(stage_arr, mats, vw)

    @jax.jit
    def sub_pass2a(T, mats, valid_w):
        a, b, c, d, e, f, _ = W._shear_affine(mats, valid_w, out_h)
        a = jnp.where(jnp.abs(a) >= 0.05, a, 1.0)
        xs = jnp.arange(out_w, dtype=jnp.float32)
        ws = jnp.arange(Wd, dtype=jnp.float32)
        u = jnp.clip(a[:, None] * xs[None, :] + c[:, None], 0.0, Wd - 1.0)
        wx = jnp.maximum(0.0, 1.0 - jnp.abs(u[:, :, None] -
                                            ws[None, None, :]))
        return jnp.einsum("kxw,kvwc->kvxc", wx, T)

    timeit("sub: pass2a x einsum", sub_pass2a, T, mats, vw)
    note("done")


if __name__ == "__main__":
    main()
