"""Per-stage device timing of the onecall program (VERDICT r3 task #1).

Splits pipeline/onecall.OneCallPipeline's single XLA program into isolated
sub-programs (det resize, det forward, each db_device phase, crop-matrix
build, cls warp+forward, rec warp+forward, pack) and times each back-to-back
with device-resident inputs, so the 160 ms/page device cost (BENCH_r03)
gets attributed to the stage that owns it.

Run as the one long-lived TPU process:
    python tools/profile_onecall.py 2>&1 | tee /tmp/profile_onecall.log
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
    from onnxocr_tpu.ops import det_pre, resize_dev, db_device, warp_dev
    from onnxocr_tpu.ops import warp as warp_ops
    from onnxocr_tpu.models import dbnet

    t_start = time.time()
    print("devices: %s" % jax.devices(), flush=True)
    # absorb the first-download stall up front
    np.asarray(jax.device_put(np.ones(8, np.uint8)))
    print("first download done %.1fs" % (time.time() - t_start), flush=True)

    model = ONNXPaddleOcr(use_angle_cls=True, use_gpu=False, drop_score=0.0,
                          tpu_det_microbatch=False, tpu_rec_microbatch=False,
                          tpu_pipeline="onecall")
    oc = model._onecall
    det = model.text_detector
    fused = model._fused
    import os as _os
    img = cv2.imread(_os.environ.get("ONNXOCR_PROFILE_IMAGE",
                                     "onnxocr_tpu/test_images/page_00.png"))
    if img is None:
        import glob
        path = sorted(glob.glob("onnxocr_tpu/test_images/*.png") +
                      glob.glob("onnxocr_tpu/test_images/*.jpg"))[0]
        img = cv2.imread(path)
    print("image %s" % (img.shape,), flush=True)

    # ---- replicate the onecall host preamble
    image_dev, src_h, src_w = resize_dev.put_src_bucket(img, "auto")
    rh, rw = det_pre.det_resize_target(src_h, src_w, det.limit_side_len,
                                       det.limit_type)
    cap = det_pre.round_up(int(det.limit_side_len), det.bucket)
    hb = wb = max(cap, det_pre.round_up(max(rh, rw), det.bucket))
    print("canvas %dx%d valid %dx%d" % (hb, wb, rh, rw), flush=True)

    det_p = det.forward.pdev
    cls_p = fused.cls_forward.pdev
    rec_p = fused.rec_forward.pdev
    pp = det.postprocess_op
    k_det, k_rec = oc.k_det, oc.k_rec
    imgH, rec_w = oc.imgH, oc.rec_w

    # ---- full program baseline
    full = oc._jit.get(True) or oc._build(True)
    args = (det_p, cls_p, rec_p, image_dev, jnp.int32(src_h),
            jnp.int32(src_w), jnp.int32(rh), jnp.int32(rw))
    results = {}
    results["full_onecall"] = timeit(
        "full_onecall",
        lambda *a: full(*a, out_h=hb, out_w=wb), args, n=6)

    # ---- stage 1: resize+normalize
    @jax.jit
    def s_resize(image_u8, s_h, s_w, r_h, r_w):
        return resize_dev.resize_normalize_det(image_u8, s_h, s_w, r_h, r_w,
                                               hb, wb)
    a_rs = (image_dev, jnp.int32(src_h), jnp.int32(src_w), jnp.int32(rh),
            jnp.int32(rw))
    results["det_resize"] = timeit("det_resize", s_resize, a_rs)
    x = s_resize(*a_rs)

    # ---- stage 2: det forward
    @jax.jit
    def s_det(p, x, r_h, r_w):
        return dbnet.apply(p, x[None].astype(det.forward.dtype),
                           backbone_arch=det.forward.arch,
                           valid_hw=(jnp.reshape(r_h, (1,)),
                                     jnp.reshape(r_w, (1,))))[0]
    a_det = (det_p, x, jnp.int32(rh), jnp.int32(rw))
    results["det_forward"] = timeit("det_forward", s_det, a_det)
    prob = s_det(*a_det).astype(jnp.float32)

    # ---- stage 3: device_boxes at both working scales
    def make_boxes(scl):
        @jax.jit
        def s_boxes(prob, r_h, r_w):
            return db_device.device_boxes(prob, r_h, r_w, max_k=k_det,
                                          thresh=pp.thresh,
                                          box_thresh=pp.box_thresh,
                                          unclip_ratio=pp.unclip_ratio,
                                          min_size=float(pp.min_size),
                                          scale=scl)
        return s_boxes
    a_bx = (prob, jnp.int32(rh), jnp.int32(rw))
    s_boxes = make_boxes(1)
    results["db_device_s1"] = timeit("db_device_s1", s_boxes, a_bx)
    results["db_device_s2"] = timeit("db_device_s2", make_boxes(2), a_bx)

    # ---- db_device sub-stages
    H, W = prob.shape

    @jax.jit
    def s_mask(prob, r_h, r_w):
        ys, xs = jnp.mgrid[0:H, 0:W]
        in_valid = (ys < r_h) & (xs < r_w)
        mask = (prob > pp.thresh) & in_valid
        seed = jnp.where(mask, (ys * W + xs + 1).astype(jnp.int32), 0)
        return mask, seed
    results["db_mask_seed"] = timeit("db_mask_seed", s_mask, a_bx)
    mask, seed = s_mask(*a_bx)

    @jax.jit
    def s_flood(seed, mask):
        return db_device._flood_scans(seed, mask)
    results["db_flood_scans"] = timeit("db_flood_scans", s_flood,
                                       (seed, mask))
    lab0 = s_flood(seed, mask)

    @jax.jit
    def s_dilate(lab, mask):
        return db_device._dilate_converge(lab, mask)
    results["db_dilate_converge"] = timeit("db_dilate_converge", s_dilate,
                                           (lab0, mask))
    lab = s_dilate(lab0, mask)

    @jax.jit
    def s_rank(lab, seed, mask):
        # mirrors _device_boxes_impl: 2-D restructured exclusive cumsum
        reps2d = mask & (lab == seed)
        reps = reps2d.reshape(-1)
        seed_flat = seed.reshape(-1)
        maxint = jnp.int32(2147483647)
        rcnt = jnp.sum(reps2d.astype(jnp.int32), axis=1)
        roff = jnp.cumsum(rcnt) - rcnt
        within = jnp.cumsum(reps2d.astype(jnp.int32), axis=1) - \
            reps2d.astype(jnp.int32)
        rank = (roff[:, None] + within).reshape(-1)
        tgt = jnp.where(reps & (rank < k_det), rank, k_det)
        ids = jnp.full((k_det + 1,), maxint, jnp.int32)
        ids = ids.at[tgt].min(jnp.where(reps, seed_flat, maxint))[:k_det]
        return ids, rank
    results["db_rank_ids"] = timeit("db_rank_ids", s_rank, (lab, seed, mask))
    ids, _ = s_rank(lab, seed, mask)

    @jax.jit
    def s_slot(lab, seed, mask):
        # mirrors _device_boxes_impl: seed-indexed slot map (scatter+gather)
        reps2d = mask & (lab == seed)
        reps = reps2d.reshape(-1)
        seed_flat = seed.reshape(-1)
        rcnt = jnp.sum(reps2d.astype(jnp.int32), axis=1)
        roff = jnp.cumsum(rcnt) - rcnt
        within = jnp.cumsum(reps2d.astype(jnp.int32), axis=1) - \
            reps2d.astype(jnp.int32)
        rank = (roff[:, None] + within).reshape(-1)
        flat_lab = lab.reshape(-1)
        n_cells = flat_lab.shape[0]
        slot_map = jnp.full((n_cells + 2,), jnp.int32(k_det))
        slot_map = slot_map.at[
            jnp.where(reps, seed_flat, n_cells + 1)
        ].set(jnp.minimum(rank, k_det).astype(jnp.int32))
        hit = flat_lab > 0
        slot = jnp.where(hit, slot_map[flat_lab], k_det)
        return slot, hit & (slot < k_det)
    results["db_slot_assign"] = timeit("db_slot_assign", s_slot,
                                       (lab, seed, mask))
    slot, hit = s_slot(lab, seed, mask)

    @jax.jit
    def s_stats(slot, hit, prob):
        ys, xs = jnp.mgrid[0:H, 0:W]
        fx = xs.reshape(-1).astype(jnp.float32)
        fy = ys.reshape(-1).astype(jnp.float32)
        fp = prob.reshape(-1).astype(jnp.float32)
        stats = jnp.stack([jnp.ones_like(fx), fx, fy, fx * fx, fy * fy,
                           fx * fy, fp], axis=-1)
        acc = jnp.zeros((k_det + 1, stats.shape[-1]), jnp.float32)
        return acc.at[slot].add(jnp.where(hit[:, None], stats, 0.0))
    results["db_scatter_stats"] = timeit("db_scatter_stats", s_stats,
                                         (slot, hit, prob))

    @jax.jit
    def s_ext(slot, hit):
        ys, xs = jnp.mgrid[0:H, 0:W]
        fx = xs.reshape(-1).astype(jnp.float32)
        fy = ys.reshape(-1).astype(jnp.float32)
        big = jnp.float32(3.4e38)
        # stand-in axes (cost model identical: gather axis + scatter-min)
        ux = jnp.ones((k_det,), jnp.float32)
        uy = jnp.zeros((k_det,), jnp.float32)
        cs = jnp.clip(slot, 0, k_det - 1)
        pu = fx * ux[cs] + fy * uy[cs]
        pv = fx * (-uy[cs]) + fy * ux[cs]
        cols = jnp.stack([pu, pv, -pu, -pv], -1)
        cols = jnp.where(hit[:, None], cols, big)
        ext = jnp.full((k_det + 1, 4), big, jnp.float32)
        return ext.at[slot].min(cols)[:k_det]
    results["db_scatter_ext"] = timeit("db_scatter_ext", s_ext, (slot, hit))

    quads_m, scores, valid = s_boxes(*a_bx)

    @jax.jit
    def s_score(prob, quads, r_h, r_w):
        ys, xs = jnp.mgrid[0:H, 0:W]
        in_valid = (ys < r_h) & (xs < r_w)
        return db_device._quad_mask_mean(prob, quads, in_valid)
    results["db_quad_score"] = timeit("db_quad_score", s_score,
                                      (prob, quads_m, jnp.int32(rh),
                                       jnp.int32(rw)))

    # ---- rescale + order + compact (host-mirror of onecall step mid-part)
    @jax.jit
    def s_compact(quads_m, scores, valid, s_h, s_w, r_h, r_w):
        fw = s_w.astype(jnp.float32)
        fh = s_h.astype(jnp.float32)
        qx = jnp.clip(jnp.round(
            quads_m[..., 0] / r_w.astype(jnp.float32) * fw), 0, fw)
        qy = jnp.clip(jnp.round(
            quads_m[..., 1] / r_h.astype(jnp.float32) * fh), 0, fh)
        quads_s = jnp.stack([qx, qy], axis=-1)
        quads_s = warp_dev.order_points_clockwise(quads_s)
        quads_s, keep = warp_dev.clip_filter_boxes(quads_s, s_h, s_w)
        valid = valid & keep
        order = jnp.argsort(jnp.where(valid, 0, 1), stable=True)
        take = order[:k_rec]
        return quads_s[take], scores[take], valid[take]
    a_cp = (quads_m, scores, valid, jnp.int32(src_h), jnp.int32(src_w),
            jnp.int32(rh), jnp.int32(rw))
    results["compact"] = timeit("compact", s_compact, a_cp)
    quads_c, scores_c, valid_c = s_compact(*a_cp)

    # ---- crop matrices
    @jax.jit
    def s_mats(quads_c, valid_c):
        rec = warp_dev.crop_matrices(quads_c, valid_c, imgH, rec_w)
        cls_m = warp_dev.crop_matrices(quads_c, valid_c, fused.cls_h,
                                       fused.cls_w)
        return rec, cls_m
    results["crop_matrices"] = timeit("crop_matrices", s_mats,
                                      (quads_c, valid_c))
    (rec_m, rec_m_rot, rec_vw, desired), (cls_m, _, cls_vw, _) = \
        s_mats(quads_c, valid_c)
    rec_vw = jnp.where(valid_c, rec_vw, 0)
    cls_vw = jnp.where(valid_c, cls_vw, 0)

    # ---- cls warp + forward
    @jax.jit
    def s_cls_warp(image_u8, cls_m, cls_vw):
        return warp_ops.warp_crops(image_u8, cls_m, cls_vw, fused.cls_h,
                                   fused.cls_w, fused.interp)
    results["cls_warp"] = timeit("cls_warp", s_cls_warp,
                                 (image_dev, cls_m, cls_vw))
    cls_crops = s_cls_warp(image_dev, cls_m, cls_vw)

    @jax.jit
    def s_cls_fwd(p, crops):
        return fused.cls_forward.pure_fn(p, crops)
    results["cls_forward"] = timeit("cls_forward", s_cls_fwd,
                                    (cls_p, cls_crops))

    # ---- rec warp + forward
    @jax.jit
    def s_rec_warp(image_u8, rec_m, rec_vw):
        return warp_ops.warp_crops(image_u8, rec_m, rec_vw, imgH, rec_w,
                                   fused.interp)
    results["rec_warp"] = timeit("rec_warp", s_rec_warp,
                                 (image_dev, rec_m, rec_vw))
    crops = s_rec_warp(image_dev, rec_m, rec_vw)

    if fused.rec_forward.masks_width:
        @jax.jit
        def s_rec_fwd(p, crops, vt):
            return fused.rec_forward.pure_fn(p, crops, vt)
        a_rf = (rec_p, crops, (rec_vw + 7) // 8)
    else:
        @jax.jit
        def s_rec_fwd(p, crops):
            return fused.rec_forward.pure_fn(p, crops)
        a_rf = (rec_p, crops)
    results["rec_forward"] = timeit("rec_forward", s_rec_fwd, a_rf)

    total_stages = sum(v for k, v in results.items() if k != "full_onecall")
    print("-" * 40, flush=True)
    print("sum of stages: %.2f ms   full: %.2f ms" %
          (total_stages, results["full_onecall"]), flush=True)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
