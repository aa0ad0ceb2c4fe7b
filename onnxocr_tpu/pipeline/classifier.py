"""Text angle classifier (0° / 180°).

Reference contract: onnxocr/predict_cls.py TextClassifier(args)(img_list) →
(rotated_img_list, [(label, score)]); crops whose label contains "180" with
score > cls_thresh are rotated in place (predict_cls.py:85-88).

Device path `run_boxes(image_u8, boxes)` used by TextSystem returns only the
rotation decisions — the actual 180° flip is folded into the recognizer's
warp homography instead of touching pixels twice.
"""
from __future__ import annotations

import math
from typing import List, Sequence, Tuple

import numpy as np
import jax.numpy as jnp

from .. import config as cfg_mod
from ..ops import ctc as ctc_ops
from ..ops import warp as warp_ops
from . import backends, batching


class TextClassifier:
    def __init__(self, args):
        self.args = args
        self.cls_image_shape = cfg_mod.parse_shape(args.cls_image_shape)
        self.cls_batch_num = args.cls_batch_num
        self.cls_thresh = args.cls_thresh
        self.label_list = args.label_list
        self.batch_ladder = tuple(getattr(args, "tpu_batch_buckets",
                                          (1, 2, 4, 8, 16, 32, 64)))
        self.interp = getattr(args, "tpu_warp_interp", "bicubic")
        _st = getattr(args, "tpu_warp_stage", "off")
        self.stage = False if _st in ("off", "", None, False) else _st
        self.stage_tol = getattr(args, "tpu_warp_stage_tol", 0.35)
        self.slow_k = getattr(args, "tpu_warp_slow_k", 16)
        self.postprocess_op = ctc_ops.ClsPostProcess(
            label_list=args.label_list)
        dtype = jnp.bfloat16 if getattr(args, "tpu_dtype", "float32") == \
            "bfloat16" else jnp.float32
        backend, path, params, _arch, _calib = backends.resolve_backend(
            "cls", args.cls_model_dir, getattr(args, "tpu_backend", "auto"),
            dtype=dtype,
            allow_untrained=getattr(args, "tpu_allow_untrained", False))
        self.forward = backends.ClsForward(backend, path, params, dtype)

    def _forward_batches(self, crops: np.ndarray) -> np.ndarray:
        """(N, H, W, 3) → (N, 2) probs, batching up the ladder."""
        n = len(crops)
        out = np.zeros((n, 2), np.float32)
        max_batch = self.batch_ladder[-1]
        for start in range(0, n, max_batch):
            chunk = crops[start:start + max_batch]
            bsz = batching.pick_batch_bucket(len(chunk), self.batch_ladder)
            if bsz > len(chunk):
                pad = np.zeros((bsz - len(chunk),) + chunk.shape[1:],
                               chunk.dtype)
                chunk = np.concatenate([chunk, pad], axis=0)
            probs = np.asarray(self.forward(chunk))
            out[start:start + min(max_batch, n - start)] = \
                probs[: min(max_batch, n - start)]
        return out

    def resize_norm_img(self, img: np.ndarray) -> np.ndarray:
        """Reference cls resize (predict_cls.py:22-42): pad to 3×48×192."""
        import cv2
        imgC, imgH, imgW = self.cls_image_shape
        h, w = img.shape[:2]
        ratio = w / float(h)
        if math.ceil(imgH * ratio) > imgW:
            resized_w = imgW
        else:
            resized_w = int(math.ceil(imgH * ratio))
        resized = cv2.resize(img, (resized_w, imgH)).astype(np.float32)
        if imgC == 1 and resized.ndim == 2:
            resized = resized[..., None]
        resized = resized / 255.0
        resized = (resized - 0.5) / 0.5
        out = np.zeros((imgH, imgW, imgC), dtype=np.float32)
        out[:, :resized_w] = resized
        return out

    def __call__(self, img_list: Sequence[np.ndarray]
                 ) -> Tuple[List[np.ndarray], List[List]]:
        """Reference-compatible host path: returns (rotated crops, results)."""
        import cv2
        img_list = list(img_list)
        n = len(img_list)
        if n == 0:
            return img_list, []
        crops = np.stack([self.resize_norm_img(im) for im in img_list])
        probs = self._forward_batches(crops)
        cls_res = self.postprocess_op(probs)
        out_res: List[List] = []
        for i, (label, score) in enumerate(cls_res):
            out_res.append([label, score])
            if "180" in label and score > self.cls_thresh:
                img_list[i] = cv2.rotate(img_list[i], 1)
        return img_list, out_res

    # ------------------------------------------------------ device hot path
    def run_boxes(self, image_u8_dev, boxes: np.ndarray
                  ) -> Tuple[np.ndarray, List[List]]:
        """Classify crops straight from the device-resident image.
        Returns (rot180 bool mask (N,), [(label, score)])."""
        n = len(boxes)
        if n == 0:
            return np.zeros(0, bool), []
        imgC, imgH, imgW = self.cls_image_shape
        max_batch = self.batch_ladder[-1]
        probs_all = np.zeros((n, 2), np.float32)
        for start in range(0, n, max_batch):
            idxs = range(start, min(start + max_batch, n))
            bsz = batching.pick_batch_bucket(len(idxs), self.batch_ladder)
            mats = np.tile(np.eye(3, dtype=np.float32), (bsz, 1, 1))
            valid = np.zeros(bsz, np.int32)
            for row, i in enumerate(idxs):
                mats[row], valid[row] = warp_ops.build_crop_matrix(
                    boxes[i], imgH, imgW)
            crops = warp_ops.warp_crops(image_u8_dev, jnp.asarray(mats),
                                        jnp.asarray(valid), imgH, imgW,
                                        self.interp, self.stage,
                                        self.stage_tol, self.slow_k)
            probs = np.asarray(self.forward(crops))
            probs_all[start:start + len(idxs)] = probs[: len(idxs)]
        cls_res = self.postprocess_op(probs_all)
        rot = np.array([("180" in label and score > self.cls_thresh)
                        for label, score in cls_res], dtype=bool)
        return rot, [[label, score] for label, score in cls_res]
