"""TextSystem: the det → sort → crop → cls → rec hot path.

Reference contract: onnxocr/predict_system.py TextSystem(args)(img, cls) →
(filter_boxes, filter_rec_res); quirks preserved: (None, None) when det
returns None (:40-41), sorted_boxes' single 10px-tolerance bubble pass
(:75-97), drop_score filtering of rec results only (:65-70).

TPU data flow (tpu_crop_backend='device'): the source image uploads to HBM
once; crops never materialize on host — cls reads warped 48×192 tensors from
the image, its 180° verdicts fold into the recognizer's warp homographies,
and rec runs per width bucket straight from the same HBM image.
"""
from __future__ import annotations

import os
import threading
from typing import List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from . import detector, classifier, recognizer
from ..utils.image import get_rotate_crop_image, get_minarea_rect_crop, \
    minarea_quad


class TextSystem:
    def __init__(self, args):
        self.args = args
        self.text_detector = detector.TextDetector(args)
        self.text_recognizer = recognizer.TextRecognizer(args)
        self.use_angle_cls = args.use_angle_cls
        self.drop_score = args.drop_score
        if self.use_angle_cls:
            self.text_classifier = classifier.TextClassifier(args)
        self.crop_backend = getattr(args, "tpu_crop_backend", "device")
        self.crop_image_res_index = 0
        self._crop_res_lock = threading.Lock()
        self._fused = None
        if getattr(args, "tpu_fused_cls_rec", True) and \
                self.crop_backend == "device":
            from . import fused as fused_mod
            from .. import config as cfg_mod
            if self.use_angle_cls:
                labels = self.text_classifier.label_list
                idx180 = next((i for i, l in enumerate(labels)
                               if "180" in str(l)), None)
                cls_shape = cfg_mod.parse_shape(args.cls_image_shape)[1:]
                self._fused = fused_mod.FusedClsRec(
                    self.text_classifier.forward,
                    self.text_recognizer.forward,
                    cls_shape=cls_shape,
                    cls_thresh=args.cls_thresh,
                    idx180=idx180,
                    interp=getattr(args, "tpu_warp_interp", "bicubic"),
                    stage=getattr(args, "tpu_warp_stage", "off"),
                    stage_tol=getattr(args, "tpu_warp_stage_tol", 0.35),
                    slow_k=getattr(args, "tpu_warp_slow_k", 16))
            else:
                self._fused = fused_mod.FusedClsRec(
                    None, self.text_recognizer.forward,
                    interp=getattr(args, "tpu_warp_interp", "bicubic"),
                    stage=getattr(args, "tpu_warp_stage", "off"),
                    stage_tol=getattr(args, "tpu_warp_stage_tol", 0.35),
                    slow_k=getattr(args, "tpu_warp_slow_k", 16))
        self._onecall = None
        if getattr(args, "tpu_pipeline", "staged") == "onecall" and \
                self._fused is not None and \
                args.det_box_type == "quad" and \
                not args.use_dilation and \
                args.det_db_score_mode == "fast" and \
                self.text_detector.limit_type == "max" and \
                self.text_detector.image_shape is None:
            from .onecall import OneCallPipeline
            self._onecall = OneCallPipeline(
                self.text_detector, self.text_recognizer, self._fused, args)

    def draw_crop_rec_res(self, output_dir, img_crop_list, rec_res):
        import cv2
        os.makedirs(output_dir, exist_ok=True)
        # the reference increments this counter unlocked across threads
        # (predict_system.py:20,33 — latent hazard flagged in SURVEY.md §5);
        # serialize it here.
        with self._crop_res_lock:
            base = self.crop_image_res_index
            self.crop_image_res_index += len(img_crop_list)
        for bno in range(len(img_crop_list)):
            cv2.imwrite(
                os.path.join(output_dir, f"mg_crop_{bno + base}.jpg"),
                img_crop_list[bno])

    def _call_host_crops(self, img, cls: bool):
        """Reference-style path: crops materialized with cv2 on host."""
        ori_im = img.copy()
        dt_boxes = self.text_detector(img)
        if dt_boxes is None:
            return None, None
        dt_boxes = sorted_boxes(dt_boxes)
        img_crop_list = []
        for box in dt_boxes:
            tmp_box = np.array(box, copy=True)
            if self.args.det_box_type == "quad":
                img_crop_list.append(get_rotate_crop_image(ori_im, tmp_box))
            else:
                img_crop_list.append(get_minarea_rect_crop(ori_im, tmp_box))
        if self.use_angle_cls and cls:
            img_crop_list, _ = self.text_classifier(img_crop_list)
        rec_res = self.text_recognizer(img_crop_list)
        if self.args.save_crop_res:
            self.draw_crop_rec_res(self.args.crop_res_save_dir,
                                   img_crop_list, rec_res)
        return dt_boxes, rec_res

    def _call_bitmap_wire(self, img, cls: bool, timer):
        """Bitmap-wire hot path: det forward downloads only the bitpacked
        DB bitmap (~8x smaller than the quantized map — the map download
        dominated det latency on the ~7 MB/s tunnel); the prob map stays
        in HBM, the host extracts score-DEFERRED candidates
        (db_post.candidates_from_bitmap), and ONE fused program scores
        them against the resident map while running cls+rec
        (fused.call_scored). Two downloads per page total."""
        import jax
        import jax.numpy as jnp
        from ..ops import resize_dev, det_pre, geometry, db_post

        det = self.text_detector
        rec = self.text_recognizer
        pp = det.postprocess_op
        with timer.stage("img_upload"):
            image_dev, src_h, src_w = resize_dev.put_src_bucket(
                img, getattr(self.args, "tpu_src_upload", "auto"))
        with timer.stage("det"):
            batcher = det._page_batcher
            if batcher is not None and batcher.wire == "bits":
                # cross-request path: the wave's det forwards coalesce and
                # its bitpacked bitmaps download as ONE transfer
                if batcher.canvas is not None and \
                        getattr(self.args, "tpu_det_batch_input",
                                "device") == "device":
                    # det canvas produced ON DEVICE from the HBM source
                    # (resize_dev) — kills the ~2.7 MB/page second upload
                    # the host-resize path pays
                    bitmap, prob_dev, (rh, rw), _info = \
                        batcher.submit_bits_dev(image_dev, src_h, src_w)
                else:
                    bitmap, prob_dev, (rh, rw), _info = \
                        batcher.submit_bits(img)
            else:
                rh, rw = det_pre.det_resize_target(
                    src_h, src_w, det.limit_side_len, det.limit_type)
                # fixed canvas on TPU collapses the det compile axis to
                # the source bucket (activation masking makes padding
                # invisible); CPU keeps per-page buckets
                mode = getattr(self.args, "tpu_det_fixed_canvas", "auto")
                fixed = (det.forward.backend == "native" and
                         det.forward.arch == "mbv3" and
                         (mode == "always" or
                          (mode == "auto" and
                           jax.default_backend() == "tpu")))
                if fixed:
                    cap = det_pre.round_up(int(det.limit_side_len),
                                           det.bucket)
                    hb = wb = max(cap, det_pre.round_up(max(rh, rw),
                                                        det.bucket))
                else:
                    hb = det_pre.round_up(rh, det.bucket)
                    wb = det_pre.round_up(rw, det.bucket)
                x = resize_dev.resize_normalize_det(
                    image_dev, jnp.int32(src_h), jnp.int32(src_w),
                    jnp.int32(rh), jnp.int32(rw), hb, wb)
                bits_dev, prob_dev = det.forward.call_normalized_bits(
                    x, (rh, rw), pp.thresh)
                # download the FULL fixed-shape bitmap and slice on host:
                # a device-side slice compiles a new program per distinct
                # (rh, rw) — each costing a multi-second compile/load round
                # on the tunneled backend — while the extra canvas bytes
                # are ~75 KB at link bandwidth (milliseconds)
                bitmap = det_pre.unpack_bitmap(
                    np.asarray(bits_dev)[:rh, :rw // 8], rw)
            if pp.use_dilation:
                bitmap = geometry.dilate2x2(bitmap.astype(np.uint8))
            pre_quads, cand = pp.candidates_from_bitmap(
                bitmap, img.shape[1], img.shape[0])
            # filter_tag_det_res with candidate-index tracking
            keep_pre, keep_boxes = [], []
            for q, b in zip(pre_quads, cand):
                box = geometry.order_points_clockwise(
                    np.asarray(b, np.float32))
                box = det.clip_det_res(box, img.shape[0], img.shape[1])
                w_i = int(np.linalg.norm(box[0] - box[1]))
                h_i = int(np.linalg.norm(box[0] - box[3]))
                if w_i <= 3 or h_i <= 3:
                    continue
                keep_pre.append(q)
                keep_boxes.append(box)
        if not keep_boxes:
            return [], []
        boxes = np.asarray(keep_boxes, np.float32)
        pre = np.asarray(keep_pre, np.float32)
        use_cls = bool(self.use_angle_cls and cls and
                       self._fused.idx180 is not None)
        cls_shape = (self._fused.cls_h, self._fused.cls_w)
        if len(boxes) <= rec.batch_ladder[-1] * 4:
            with timer.stage("cls_rec_fused"):
                rec_res, scores = rec.run_candidates_scored(
                    image_dev, prob_dev, rh, rw, boxes, pre, self._fused,
                    cls_shape, use_cls=use_cls)
            keep = scores >= pp.box_thresh
            fb = [b for b, k in zip(boxes, keep) if k]
            fr = [r for r, k in zip(rec_res, keep) if k]
            order = _sorted_pair_order(fb)
            return [fb[i] for i in order], [fr[i] for i in order]
        # candidate overflow (speckle-heavy page): score on host from the
        # downloaded map, then the standard sorted fused rec path
        with timer.stage("det"):
            prob = np.asarray(prob_dev)[:rh, :rw]  # host slice: no
            # per-shape device slice program (see bitmap note above)
            scores = np.asarray([db_post.box_score_fast(prob, q)
                                 for q in pre], np.float32)
            dt_boxes = sorted_boxes(
                [b for b, s in zip(boxes, scores) if s >= pp.box_thresh])
        if not dt_boxes:
            return dt_boxes, []
        with timer.stage("cls_rec_fused"):
            rec_res = rec.run_boxes_fused(
                image_dev, np.asarray(dt_boxes, np.float32), self._fused,
                cls_shape, use_cls=use_cls)
        return dt_boxes, rec_res

    def _call_device_crops(self, img, cls: bool):
        from ..utils.profiling import GLOBAL as timer
        image_dev = None
        # tiny-image quirk (reference operators.py:72-76): images with
        # h+w < 64 are zero-padded to >=32 before resize — only the host
        # path (det_pre.prepare_det_input) replicates that, so route tiny
        # images there to keep box-geometry parity.
        tiny = img.shape[0] + img.shape[1] < 64
        if self._onecall is not None and not tiny:
            # one-call mode: det→boxes→cls→rec in one program, ONE
            # download per image (pipeline/onecall.py); falls through to
            # the staged path when the page overflows the box budget
            with timer.stage("onecall"):
                out = self._onecall(img, cls)
            if out is not None:
                boxes, rec_res = out
                order = _sorted_pair_order(boxes)
                dt_boxes = [boxes[i] for i in order]
                rec_res = [rec_res[i] for i in order]
                return dt_boxes, rec_res
        det_batcher = self.text_detector._page_batcher
        bitmap_wire = (
            not tiny and
            getattr(self.args, "tpu_det_wire", "bitmap") == "bitmap" and
            self._fused is not None and
            (det_batcher is None or det_batcher.wire == "bits") and
            getattr(self.args, "tpu_det_postprocess", "host") == "host" and
            getattr(self.args, "tpu_det_input", "device") == "device" and
            self.args.det_box_type == "quad" and
            self.args.det_db_score_mode == "fast" and
            self.text_detector.limit_type == "max" and
            self.text_detector.image_shape is None)
        if bitmap_wire:
            out = self._call_bitmap_wire(img, cls, timer)
            if out is not None:
                return out
        det_post_device = (
            not tiny and
            getattr(self.args, "tpu_det_postprocess", "host") == "device" and
            self.args.det_box_type == "quad" and
            not self.args.use_dilation and
            self.text_detector.limit_type == "max" and
            self.text_detector.image_shape is None)
        batcher = self.text_detector._page_batcher
        if batcher is not None and batcher.post is not None:
            # cross-request batched det + on-device DB extraction: only
            # K quads per page cross the wire
            with timer.stage("det"):
                raw = batcher.submit_boxes(img)
                dt_boxes = self.text_detector.filter_tag_det_res(
                    raw, img.shape)
        elif det_post_device:
            # fast path: det postprocess runs on device; only K candidate
            # quads cross the wire (ops/db_device.py)
            from ..ops import resize_dev
            with timer.stage("img_upload"):
                image_dev, src_h, src_w = resize_dev.put_src_bucket(
                    img, getattr(self.args, "tpu_src_upload", "auto"))
            with timer.stage("det"):
                raw = self.text_detector.infer_boxes_device(
                    image_dev, src_h, src_w)
                dt_boxes = self.text_detector.filter_tag_det_res(
                    raw, img.shape)
        elif self.text_detector._page_batcher is not None:
            # cross-request batched det: host reference-resize, shared
            # device forward; the source uploads separately for the warps.
            # TextDetector.__call__ dispatches on the batcher's wire (maps
            # vs bits) — tiny pages land here too, and the bits wire's
            # submit() tuple must not be treated as a prob map.
            with timer.stage("det"):
                dt_boxes = self.text_detector(img)
        elif not tiny and \
                getattr(self.args, "tpu_det_input", "device") == "device":
            # one upload: det resizes on device from the same HBM image the
            # crop warps read (ops/resize_dev.py)
            from ..ops import resize_dev
            with timer.stage("img_upload"):
                image_dev, src_h, src_w = resize_dev.put_src_bucket(
                    img, getattr(self.args, "tpu_src_upload", "auto"))
            with timer.stage("det"):
                prob, shape_info = \
                    self.text_detector.infer_prob_map_device(
                        image_dev, src_h, src_w)
                dt_boxes = self.text_detector.boxes_from_prob(
                    prob, shape_info, img.shape)
        else:
            with timer.stage("det"):
                dt_boxes = self.text_detector(img)
        if dt_boxes is None:
            return None, None
        dt_boxes = sorted_boxes(dt_boxes)
        n = len(dt_boxes)
        if n == 0:
            return dt_boxes, []
        if self.args.det_box_type == "quad":
            crop_quads = np.asarray(dt_boxes, dtype=np.float32)
        else:
            crop_quads = np.stack([minarea_quad(np.asarray(b))
                                   for b in dt_boxes]).astype(np.float32)
        if image_dev is None:
            with timer.stage("img_upload"):
                image_dev = jax.device_put(np.ascontiguousarray(img))
        if self._fused is not None:
            use_cls = bool(self.use_angle_cls and cls and
                           self._fused.idx180 is not None)
            cls_shape = (self._fused.cls_h, self._fused.cls_w)
            with timer.stage("cls_rec_fused"):
                rec_res = self.text_recognizer.run_boxes_fused(
                    image_dev, crop_quads, self._fused, cls_shape,
                    use_cls=use_cls)
            return dt_boxes, rec_res
        rot180 = None
        if self.use_angle_cls and cls:
            with timer.stage("cls"):
                rot180, _ = self.text_classifier.run_boxes(image_dev,
                                                           crop_quads)
        with timer.stage("rec"):
            rec_res = self.text_recognizer.run_boxes(image_dev, crop_quads,
                                                     rot180)
        return dt_boxes, rec_res

    def __call__(self, img, cls: bool = True):
        # save_crop_res needs host-materialized crops (predict_system.py:63)
        if self.crop_backend == "device" and not self.args.save_crop_res:
            dt_boxes, rec_res = self._call_device_crops(img, cls)
        else:
            dt_boxes, rec_res = self._call_host_crops(img, cls)
        if dt_boxes is None:
            return None, None
        filter_boxes, filter_rec_res = [], []
        for box, rec_result in zip(dt_boxes, rec_res):
            text, score = rec_result
            if score >= self.drop_score:
                filter_boxes.append(box)
                filter_rec_res.append(rec_result)
        return filter_boxes, filter_rec_res


def _sorted_pair_order(boxes) -> List[int]:
    """Index permutation with sorted_boxes' exact semantics (sort + one
    10px-tolerance bubble pass) so (box, rec_result) pairs from the
    one-call pipeline reorder together."""
    n = len(boxes)
    order = sorted(range(n), key=lambda i: (boxes[i][0][1], boxes[i][0][0]))
    for i in range(n - 1):
        for j in range(i, -1, -1):
            bj1, bj = boxes[order[j + 1]], boxes[order[j]]
            if abs(bj1[0][1] - bj[0][1]) < 10 and (bj1[0][0] < bj[0][0]):
                order[j], order[j + 1] = order[j + 1], order[j]
            else:
                break
    return order


def sorted_boxes(dt_boxes) -> List[np.ndarray]:
    """Top-to-bottom then left-to-right with a single bubble pass of 10px
    y-tolerance — intentionally not a full sort (reference
    predict_system.py:75-97, parity trap #3 in SURVEY.md)."""
    num_boxes = len(dt_boxes)
    sorted_list = sorted(dt_boxes, key=lambda x: (x[0][1], x[0][0]))
    _boxes = list(sorted_list)
    for i in range(num_boxes - 1):
        for j in range(i, -1, -1):
            if abs(_boxes[j + 1][0][1] - _boxes[j][0][1]) < 10 and \
                    (_boxes[j + 1][0][0] < _boxes[j][0][0]):
                _boxes[j], _boxes[j + 1] = _boxes[j + 1], _boxes[j]
            else:
                break
    return _boxes
