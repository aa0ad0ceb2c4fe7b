"""CTC text recognizer.

Reference contract: onnxocr/predict_rec.py TextRecognizer(args)(img_list) →
[(text, score)] in input order. Two execution paths here:

* `__call__(img_list)` — reference-compatible: takes host crop arrays
  (BGR uint8/float), resizes with the exact reference arithmetic
  (predict_rec.py:54-80), routes to width buckets, runs one device call per
  (bucket, batch) and decodes. Used by the det=False API paths
  (onnx_paddleocr.py:46-61).
* `run_boxes(image_u8, boxes, rot180)` — TPU-native hot path used by
  TextSystem: crops never exist on host; warp+normalize+forward+CTC-reduce
  fuse into per-bucket device calls against the HBM-resident source image.
"""
from __future__ import annotations

import math
from typing import List, Optional, Sequence, Tuple

import numpy as np
import jax.numpy as jnp

from .. import config as cfg_mod
from ..ops import ctc as ctc_ops
from ..ops import warp as warp_ops
from . import backends, batching


class TextRecognizer:
    def __init__(self, args):
        self.args = args
        self.rec_image_shape = cfg_mod.parse_shape(args.rec_image_shape)
        self.rec_batch_num = args.rec_batch_num
        self.rec_algorithm = args.rec_algorithm
        self.width_ladder = tuple(getattr(args, "tpu_rec_width_buckets",
                                          (320, 480, 640, 800, 960, 1280)))
        self.batch_ladder = tuple(getattr(args, "tpu_batch_buckets",
                                          (1, 2, 4, 8, 16, 32, 64)))
        self.interp = getattr(args, "tpu_warp_interp", "bicubic")
        _st = getattr(args, "tpu_warp_stage", "off")
        self.stage = False if _st in ("off", "", None, False) else _st
        self.stage_tol = getattr(args, "tpu_warp_stage_tol", 0.35)
        self.slow_k = getattr(args, "tpu_warp_slow_k", 16)
        self.postprocess_op = ctc_ops.CTCLabelDecode(
            character_dict_path=args.rec_char_dict_path,
            use_space_char=args.use_space_char)
        dtype = jnp.bfloat16 if getattr(args, "tpu_dtype", "float32") == \
            "bfloat16" else jnp.float32
        arch = backends.pick_arch("rec", args.rec_model_dir,
                                  args.rec_algorithm)
        backend, path, params, arch, _calib = backends.resolve_backend(
            "rec", args.rec_model_dir, getattr(args, "tpu_backend", "auto"),
            vocab_size=len(self.postprocess_op.character), dtype=dtype,
            arch=arch,
            allow_untrained=getattr(args, "tpu_allow_untrained", False))
        if backend == "native" and params is not None and \
                getattr(args, "tpu_decode_support", "trained") == "trained":
            # native checkpoints are synthetic-trained: restrict decode to
            # the trained charset so argmax can't emit never-seen glyphs
            # (backends.trained_support / apply_support_bias)
            sup = backends.trained_support(args.rec_char_dict_path)
            if sup is not None:
                params = backends.apply_support_bias(params, sup)
        self.forward = backends.RecForward(backend, path, params, dtype)
        self.forward.arch = arch
        self._crop_batcher = None
        if getattr(args, "tpu_rec_microbatch", False):
            self.enable_crop_batching(
                max_wait_ms=float(getattr(args, "tpu_microbatch_wait_ms",
                                          8.0)))

    def enable_crop_batching(self, max_wait_ms: float = 4.0) -> None:
        """Cross-request cls+rec batching: concurrent pages' crop chunks of
        the same (source bucket, width bucket) run as ONE fused device call
        (runtime/batcher.RecCropBatcher + ops/warp.warp_crops_multi)."""
        from ..runtime.batcher import RecCropBatcher
        self._crop_batcher = RecCropBatcher(
            max_wait_ms=max_wait_ms, batch_ladder=self.batch_ladder)

    # ---------------------------------------------------------------- shared
    def _group(self, desired_ws: List[int]):
        """Width-bucket routing. The masked SVTR forward makes valid-region
        outputs bucket-invariant, so all (non-extreme) crops of a page share
        one bucket — one device round trip instead of one per bucket."""
        if self.forward.masks_width:
            return batching.group_collapsed(desired_ws, self.width_ladder)
        return batching.group_by_bucket(desired_ws, self.width_ladder)

    def _decode_chunk(self, crops: np.ndarray, valid_ws: List[int],
                      n_real: int) -> List[Tuple[str, float]]:
        imgH = self.rec_image_shape[1]
        if self.forward.masks_width:
            vt = np.asarray([(w + 7) // 8 for w in valid_ws], np.int32)
            idx, prob = self.forward(crops, vt)
        else:
            idx, prob = self.forward(crops)
        idx = np.asarray(idx)[:n_real]
        prob = np.asarray(prob)[:n_real]
        # Restrict decode to valid (un-padded) time steps. The model reduces
        # width by 8 (T = W/8); padded columns were zeroed.
        stride = crops.shape[2] // idx.shape[1]
        valid_t = [min(idx.shape[1], math.ceil(w / stride))
                   for w in valid_ws[:n_real]]
        return self.postprocess_op.decode_indices(
            idx, prob, is_remove_duplicate=True, valid_t=valid_t)

    def _run_batches(self, make_crops, desired_ws: List[int]
                     ) -> List[Tuple[str, float]]:
        """make_crops(indices, bucket_w, bsz) → ((bsz, 48, bucket_w, 3) f32,
        valid_ws[bsz]) with rows past len(indices) zero-padded. Routes
        indices to width buckets, pads batches up the ladder, restores input
        order."""
        n = len(desired_ws)
        results: List[Tuple[str, float]] = [("", 0.0)] * n
        groups = self._group(desired_ws)
        max_batch = self.batch_ladder[-1]
        for bucket_w, indices in groups.items():
            for chunk in batching.chunks_of(indices, max_batch):
                bsz = batching.pick_batch_bucket(len(chunk),
                                                 self.batch_ladder)
                crops, valid_ws = make_crops(chunk, bucket_w, bsz)
                out = self._decode_chunk(crops, list(valid_ws), len(chunk))
                for i, res in zip(chunk, out):
                    results[i] = res
        return results

    # ------------------------------------------------------- host crop path
    def resize_norm_img(self, img: np.ndarray, bucket_w: int
                        ) -> Tuple[np.ndarray, int]:
        """Reference resize arithmetic (predict_rec.py:54-80) against a
        bucket width instead of the per-batch dynamic imgW."""
        import cv2
        imgC, imgH, _ = self.rec_image_shape
        h, w = img.shape[:2]
        ratio = w / float(h)
        if math.ceil(imgH * ratio) > bucket_w:
            resized_w = bucket_w
        else:
            resized_w = int(math.ceil(imgH * ratio))
        resized = cv2.resize(img, (resized_w, imgH)).astype(np.float32)
        resized = resized / 255.0
        resized = (resized - 0.5) / 0.5
        out = np.zeros((imgH, bucket_w, imgC), dtype=np.float32)
        out[:, :resized_w] = resized if resized.ndim == 3 \
            else resized[..., None]
        return out, resized_w

    def __call__(self, img_list: Sequence[np.ndarray]
                 ) -> List[Tuple[str, float]]:
        if len(img_list) == 0:
            return []
        imgH = self.rec_image_shape[1]
        min_w = int(self.rec_image_shape[2])  # quirk: ratio floor 320/48
        desired = [max(min_w, math.ceil(imgH * im.shape[1] / im.shape[0]))
                   for im in img_list]

        def make_crops(indices, bucket_w, bsz):
            crops = np.zeros((bsz, imgH, bucket_w, 3), np.float32)
            valid = []
            for row, i in enumerate(indices):
                crops[row], vw = self.resize_norm_img(img_list[i], bucket_w)
                valid.append(vw)
            valid += [bucket_w] * (bsz - len(indices))
            return crops, valid

        return self._run_batches(make_crops, desired)

    # ------------------------------------------------------ device hot path
    def run_boxes(self, image_u8_dev, boxes: np.ndarray,
                  rot180: Optional[np.ndarray] = None
                  ) -> List[Tuple[str, float]]:
        """image_u8_dev: device (H, W, 3) uint8; boxes: (N, 4, 2) source
        coords; rot180: (N,) bool from the angle classifier."""
        n = len(boxes)
        if n == 0:
            return []
        imgH = self.rec_image_shape[1]
        min_w = int(self.rec_image_shape[2])
        if rot180 is None:
            rot180 = np.zeros(n, dtype=bool)
        desired = []
        for b in boxes:
            cw, ch = warp_ops.crop_geometry(b)
            cw = max(cw, 1)
            ch = max(ch, 1)
            if ch / cw >= 1.5:
                cw, ch = ch, cw
            desired.append(max(min_w, math.ceil(imgH * cw / ch)))

        def make_crops(indices, bucket_w, bsz):
            mats = np.tile(np.eye(3, dtype=np.float32), (bsz, 1, 1))
            valid = []
            for row, i in enumerate(indices):
                mats[row], vw = warp_ops.build_crop_matrix(
                    boxes[i], imgH, bucket_w, rotate180=bool(rot180[i]))
                valid.append(vw)
            valid_arr = np.array(valid + [0] * (bsz - len(indices)), np.int32)
            crops = warp_ops.warp_crops(
                image_u8_dev, jnp.asarray(mats), jnp.asarray(valid_arr),
                imgH, bucket_w, self.interp, self.stage,
                self.stage_tol, self.slow_k)
            return crops, list(valid_arr)

        return self._run_batches(make_crops, desired)

    def _desired_widths(self, boxes: np.ndarray) -> List[int]:
        imgH = self.rec_image_shape[1]
        min_w = int(self.rec_image_shape[2])
        desired = []
        for b in boxes:
            cw, ch = warp_ops.crop_geometry(b)
            cw = max(cw, 1)
            ch = max(ch, 1)
            if ch / cw >= 1.5:
                cw, ch = ch, cw
            desired.append(max(min_w, math.ceil(imgH * cw / ch)))
        return desired

    def run_boxes_fused(self, image_u8_dev, boxes: np.ndarray, fused,
                        cls_shape, use_cls: bool = True
                        ) -> List[Tuple[str, float]]:
        """Single fused device call per width bucket: cls verdicts select the
        180°-rotated homographies on device (pipeline/fused.py), eliminating
        the cls→host→rec round trip."""
        n = len(boxes)
        if n == 0:
            return []
        imgH = self.rec_image_shape[1]
        cls_h, cls_w = cls_shape
        desired = self._desired_widths(boxes)
        results: List[Tuple[str, float]] = [("", 0.0)] * n
        groups = self._group(desired)
        max_batch = self.batch_ladder[-1]
        eye = np.eye(3, dtype=np.float32)
        for bucket_w, indices in groups.items():
            for chunk in batching.chunks_of(indices, max_batch):
                k = len(chunk)
                rec_mats = np.tile(eye, (k, 1, 1))
                rot_mats = np.tile(eye, (k, 1, 1))
                cls_mats = np.tile(eye, (k, 1, 1))
                rec_valid = np.zeros(k, np.int32)
                cls_valid = np.zeros(k, np.int32)
                for row, i in enumerate(chunk):
                    rec_mats[row], rec_valid[row] = \
                        warp_ops.build_crop_matrix(boxes[i], imgH, bucket_w)
                    rot_mats[row], _ = warp_ops.build_crop_matrix(
                        boxes[i], imgH, bucket_w, rotate180=True)
                    cls_mats[row], cls_valid[row] = \
                        warp_ops.build_crop_matrix(boxes[i], cls_h, cls_w)
                run_w = bucket_w
                if self._crop_batcher is not None:
                    # cross-request path: the batcher coalesces chunks from
                    # concurrent pages and pads across requests. With the
                    # masked forward the warp matrices / valid widths are
                    # frozen at submit time, so a chunk can run in any wider
                    # bucket unchanged — let non-extreme chunks coalesce
                    # across width buckets (the group runs at its max).
                    promote = bool(self.forward.masks_width and
                                   bucket_w <= batching.COLLAPSE_CAP)
                    idx, prob, run_w = self._crop_batcher.submit(
                        fused, image_u8_dev, cls_mats, cls_valid, rec_mats,
                        rot_mats, rec_valid, imgH, bucket_w, use_cls,
                        promote=promote)
                else:
                    bsz = batching.pick_batch_bucket(k, self.batch_ladder)
                    if bsz > k:
                        pad_m = np.tile(eye, (bsz - k, 1, 1))
                        pad_v = np.zeros(bsz - k, np.int32)
                        rec_mats = np.concatenate([rec_mats, pad_m])
                        rot_mats = np.concatenate([rot_mats, pad_m])
                        cls_mats = np.concatenate([cls_mats, pad_m])
                        rec_valid = np.concatenate([rec_valid, pad_v])
                        cls_valid = np.concatenate([cls_valid, pad_v])
                    packed = np.asarray(fused(
                        image_u8_dev, cls_mats, cls_valid, rec_mats,
                        rot_mats, rec_valid, imgH, bucket_w,
                        use_cls=use_cls))
                    T = (packed.shape[1] - 3) // 2
                    idx, prob = packed[:, :T], packed[:, T:2 * T]
                idx = np.asarray(idx)[:k].astype(np.int32)
                prob = np.asarray(prob)[:k]
                stride = run_w // idx.shape[1]
                valid_t = [min(idx.shape[1], math.ceil(w / stride))
                           for w in rec_valid[:k]]
                out = self.postprocess_op.decode_indices(
                    idx, prob, is_remove_duplicate=True, valid_t=valid_t)
                for i, res in zip(chunk, out):
                    results[i] = res
        return results

    def run_candidates_scored(self, image_u8_dev, prob_dev, rh: int,
                              rw: int, boxes: np.ndarray,
                              pre_quads: np.ndarray, fused, cls_shape,
                              use_cls: bool = True
                              ) -> Tuple[List[Tuple[str, float]],
                                         np.ndarray]:
        """Bitmap-wire rec: like run_boxes_fused, but each chunk's program
        also scores the candidates' pre-unclip quads against the
        HBM-resident prob map (fused.call_scored) — no prob-map download.
        Returns (rec results, DB box scores) in candidate order; the
        caller applies the box_thresh filter."""
        n = len(boxes)
        scores = np.zeros(n, np.float32)
        if n == 0:
            return [], scores
        imgH = self.rec_image_shape[1]
        cls_h, cls_w = cls_shape
        desired = self._desired_widths(boxes)
        results: List[Tuple[str, float]] = [("", 0.0)] * n
        groups = self._group(desired)
        max_batch = self.batch_ladder[-1]
        eye = np.eye(3, dtype=np.float32)
        for bucket_w, indices in groups.items():
            for chunk in batching.chunks_of(indices, max_batch):
                k = len(chunk)
                rec_mats = np.tile(eye, (k, 1, 1))
                rot_mats = np.tile(eye, (k, 1, 1))
                cls_mats = np.tile(eye, (k, 1, 1))
                rec_valid = np.zeros(k, np.int32)
                cls_valid = np.zeros(k, np.int32)
                quads = np.zeros((k, 4, 2), np.float32)
                for row, i in enumerate(chunk):
                    rec_mats[row], rec_valid[row] = \
                        warp_ops.build_crop_matrix(boxes[i], imgH, bucket_w)
                    rot_mats[row], _ = warp_ops.build_crop_matrix(
                        boxes[i], imgH, bucket_w, rotate180=True)
                    cls_mats[row], cls_valid[row] = \
                        warp_ops.build_crop_matrix(boxes[i], cls_h, cls_w)
                    quads[row] = pre_quads[i]
                run_w = bucket_w
                if self._crop_batcher is not None:
                    # cross-request scored batching: chunks from
                    # concurrent pages share one program; every quad
                    # scores against its own page's resident prob map
                    promote = bool(self.forward.masks_width and
                                   bucket_w <= batching.COLLAPSE_CAP)
                    idx, prob, sc, run_w = self._crop_batcher.submit(
                        fused, image_u8_dev, cls_mats, cls_valid,
                        rec_mats, rot_mats, rec_valid, imgH, bucket_w,
                        use_cls, promote=promote, prob_dev=prob_dev,
                        pre_quads=quads,
                        rhw=np.array([rh, rw], np.int32))
                    idx = np.asarray(idx).astype(np.int32)
                    prob = np.asarray(prob)
                    sc = np.asarray(sc)
                else:
                    bsz = batching.pick_batch_bucket(k, self.batch_ladder)
                    if bsz > k:
                        pad_m = np.tile(eye, (bsz - k, 1, 1))
                        pad_v = np.zeros(bsz - k, np.int32)
                        rec_mats = np.concatenate([rec_mats, pad_m])
                        rot_mats = np.concatenate([rot_mats, pad_m])
                        cls_mats = np.concatenate([cls_mats, pad_m])
                        rec_valid = np.concatenate([rec_valid, pad_v])
                        cls_valid = np.concatenate([cls_valid, pad_v])
                        quads = np.concatenate(
                            [quads, np.zeros((bsz - k, 4, 2), np.float32)])
                    packed = np.asarray(fused.call_scored(
                        image_u8_dev, prob_dev, rh, rw, quads, cls_mats,
                        cls_valid, rec_mats, rot_mats, rec_valid, imgH,
                        bucket_w, use_cls=use_cls))
                    T = (packed.shape[1] - 1) // 2
                    idx = packed[:k, :T].astype(np.int32)
                    prob = packed[:k, T:2 * T]
                    sc = packed[:k, 2 * T]
                stride = run_w // idx.shape[1]
                valid_t = [min(idx.shape[1], math.ceil(w / stride))
                           for w in rec_valid[:k]]
                out = self.postprocess_op.decode_indices(
                    idx, prob, is_remove_duplicate=True, valid_t=valid_t)
                for row, i in enumerate(chunk):
                    results[i] = out[row]
                    scores[i] = sc[row]
        return results, scores
