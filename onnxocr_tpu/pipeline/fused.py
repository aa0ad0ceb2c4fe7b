"""Fused cls→rec device step: one XLA program per width bucket.

Reference data flow makes three host round trips between detection and text
(cls batches → host rotate → rec batches, predict_system.py:57-61). Over the
TPU link each round trip costs ~40 ms, so this module fuses, per width
bucket:

    warp 48×192 cls crops from the HBM image → cls forward →
    device-side rotation verdict → homography select (rot180 matrices were
    precomputed on host) → warp 48×W rec crops → rec forward → CTC reduce

into ONE jit-compiled call whose only downloads are (N, T) argmax indices,
(N, T) probs, and the (N, 2) cls probs.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import ctc as ctc_ops
from ..ops import warp as warp_ops


class FusedClsRec:
    def __init__(self, cls_forward, rec_forward, cls_shape=(48, 192),
                 cls_thresh: float = 0.9, idx180: Optional[int] = 1,
                 interp: str = "bicubic", stage: str = "off",
                 stage_tol: float = 0.35, slow_k: int = 16):
        self.cls_forward = cls_forward
        self.rec_forward = rec_forward
        self.cls_h, self.cls_w = cls_shape
        self.cls_thresh = cls_thresh
        self.idx180 = idx180
        self.interp = interp
        # staged dense warp mode ('off'|'upright'|'shear') → warp_crops
        # staged arg (False disables; see ops/warp.warp_crops)
        self.stage = False if stage in ("off", "", None, False) else stage
        self.stage_tol = float(stage_tol)
        self.slow_k = int(slow_k)
        self._jit = {}

    def _pp(self, use_cls: bool):
        """(cls params, rec params) device-resident pytrees — passed as jit
        ARGUMENTS so the weights live once in HBM instead of being embedded
        as constants in every shape bucket's program (backends._ParamsAsArgs)."""
        cls_p = self.cls_forward.pdev if \
            (use_cls and self.cls_forward is not None) else {}
        return cls_p, self.rec_forward.pdev

    def _build(self, use_cls: bool):
        cls_fn = self.cls_forward.pure_fn if \
            self.cls_forward is not None else None
        rec_fn = self.rec_forward.pure_fn

        def step(cls_p, rec_p, image_u8, cls_mats, cls_valid, rec_mats,
                 rec_mats_rot, rec_valid, out_h: int, out_w: int):
            if use_cls:
                cls_crops = warp_ops.warp_crops(
                    image_u8, cls_mats, cls_valid, self.cls_h, self.cls_w,
                    self.interp, self.stage, self.stage_tol, self.slow_k)
                cls_probs = cls_fn(cls_p, cls_crops)
                rot = (jnp.argmax(cls_probs, axis=1) == self.idx180) & \
                    (cls_probs[:, self.idx180] > self.cls_thresh)
                mats = jnp.where(rot[:, None, None], rec_mats_rot, rec_mats)
            else:
                cls_probs = jnp.zeros((rec_mats.shape[0], 2), jnp.float32)
                rot = jnp.zeros((rec_mats.shape[0],), bool)
                mats = rec_mats
            crops = warp_ops.warp_crops(image_u8, mats, rec_valid, out_h,
                                        out_w, self.interp, self.stage, self.stage_tol, self.slow_k)
            if self.rec_forward.masks_width:
                idx, prob = rec_fn(rec_p, crops, (rec_valid + 7) // 8)
            else:
                idx, prob = rec_fn(rec_p, crops)
            # ONE packed download — every extra np.asarray costs a ~25 ms
            # round trip on the tunneled link. Layout: (N, 2T+3) =
            # [idx (T), prob (T), cls_probs (2), rot (1)].
            return jnp.concatenate(
                [idx.astype(jnp.float32), prob.astype(jnp.float32),
                 cls_probs.astype(jnp.float32),
                 rot.astype(jnp.float32)[:, None]], axis=-1)

        return jax.jit(step, static_argnames=("out_h", "out_w"))

    def _build_multi(self, use_cls: bool):
        """Cross-image variant: crops gather from a BATCH of source pages
        (warp_crops_multi) so concurrent requests' cls+rec fuse into one
        device call (runtime/batcher.RecPageBatcher)."""
        cls_fn = self.cls_forward.pure_fn if \
            self.cls_forward is not None else None
        rec_fn = self.rec_forward.pure_fn

        def step(cls_p, rec_p, images_u8, img_idx, cls_mats, cls_valid,
                 rec_mats, rec_mats_rot, rec_valid, out_h: int, out_w: int):
            if use_cls:
                cls_crops = warp_ops.warp_crops_multi(
                    images_u8, img_idx, cls_mats, cls_valid,
                    self.cls_h, self.cls_w, self.interp)
                cls_probs = cls_fn(cls_p, cls_crops)
                rot = (jnp.argmax(cls_probs, axis=1) == self.idx180) & \
                    (cls_probs[:, self.idx180] > self.cls_thresh)
                mats = jnp.where(rot[:, None, None], rec_mats_rot, rec_mats)
            else:
                mats = rec_mats
            crops = warp_ops.warp_crops_multi(images_u8, img_idx, mats,
                                              rec_valid, out_h, out_w,
                                              self.interp)
            if self.rec_forward.masks_width:
                idx, prob = rec_fn(rec_p, crops, (rec_valid + 7) // 8)
            else:
                idx, prob = rec_fn(rec_p, crops)
            # packed (N, 2T) = [idx, prob] — one download per group
            return jnp.concatenate(
                [idx.astype(jnp.float32), prob.astype(jnp.float32)],
                axis=-1)

        return jax.jit(step, static_argnames=("out_h", "out_w"))

    def _build_scored(self, use_cls: bool):
        """Bitmap-wire variant: the DB box scores ride in the SAME program
        as cls+rec. Host extracts candidate quads from the bitpacked
        bitmap (db_post.candidates_from_bitmap) without ever downloading
        the prob map; this step scores the pre-unclip quads against the
        HBM-resident map (ops/db_device._quad_mask_mean — the exact
        even-odd twin of the host scorer) while warping/recognizing every
        candidate, and the host applies box_thresh afterwards."""
        from ..ops.db_device import _quad_mask_mean
        cls_fn = self.cls_forward.pure_fn if \
            self.cls_forward is not None else None
        rec_fn = self.rec_forward.pure_fn

        def step(cls_p, rec_p, image_u8, prob, r_h, r_w, pre_quads, cls_mats,
                 cls_valid, rec_mats, rec_mats_rot, rec_valid,
                 out_h: int, out_w: int):
            H, W = prob.shape
            in_valid = (jnp.arange(H, dtype=jnp.int32)[:, None] < r_h) & \
                (jnp.arange(W, dtype=jnp.int32)[None, :] < r_w)
            scores = _quad_mask_mean(prob, pre_quads, in_valid)
            if use_cls:
                cls_crops = warp_ops.warp_crops(
                    image_u8, cls_mats, cls_valid, self.cls_h, self.cls_w,
                    self.interp, self.stage, self.stage_tol, self.slow_k)
                cls_probs = cls_fn(cls_p, cls_crops)
                rot = (jnp.argmax(cls_probs, axis=1) == self.idx180) & \
                    (cls_probs[:, self.idx180] > self.cls_thresh)
                mats = jnp.where(rot[:, None, None], rec_mats_rot, rec_mats)
            else:
                mats = rec_mats
            crops = warp_ops.warp_crops(image_u8, mats, rec_valid, out_h,
                                        out_w, self.interp, self.stage, self.stage_tol, self.slow_k)
            if self.rec_forward.masks_width:
                idx, prob_max = rec_fn(rec_p, crops, (rec_valid + 7) // 8)
            else:
                idx, prob_max = rec_fn(rec_p, crops)
            # packed (N, 2T+1) = [idx, prob, score] — one download
            return jnp.concatenate(
                [idx.astype(jnp.float32), prob_max.astype(jnp.float32),
                 scores.astype(jnp.float32)[:, None]], axis=-1)

        return jax.jit(step, static_argnames=("out_h", "out_w"))

    def call_scored(self, image_u8_dev, prob_dev, r_h: int, r_w: int,
                    pre_quads, cls_mats, cls_valid, rec_mats, rec_mats_rot,
                    rec_valid, out_h: int, out_w: int, use_cls: bool = True):
        key = ("scored", use_cls)
        fn = self._jit.get(key)
        if fn is None:
            fn = self._build_scored(use_cls)
            self._jit[key] = fn
        cls_p, rec_p = self._pp(use_cls)
        args = (cls_p, rec_p, image_u8_dev, prob_dev, jnp.int32(r_h),
                jnp.int32(r_w),
                jnp.asarray(pre_quads), jnp.asarray(cls_mats),
                jnp.asarray(cls_valid), jnp.asarray(rec_mats),
                jnp.asarray(rec_mats_rot), jnp.asarray(rec_valid),
                out_h, out_w)
        from ..utils.profiling import CAPTURE
        CAPTURE.record("fused_scored", fn, args)
        return fn(*args)

    def _build_multi_scored(self, use_cls: bool):
        """Cross-request variant of _build_scored: crops AND candidate
        scores from a batch of concurrent pages in one program. Each
        quad scores against its own page's HBM-resident prob map
        (ops/db_device.quad_mask_mean_multi)."""
        from ..ops.db_device import quad_mask_mean_multi
        cls_fn = self.cls_forward.pure_fn if \
            self.cls_forward is not None else None
        rec_fn = self.rec_forward.pure_fn

        def step(cls_p, rec_p, images_u8, probs, rhw, img_idx, pre_quads,
                 cls_mats, cls_valid, rec_mats, rec_mats_rot, rec_valid,
                 out_h: int, out_w: int):
            scores = quad_mask_mean_multi(probs, rhw, pre_quads, img_idx)
            if use_cls:
                cls_crops = warp_ops.warp_crops_multi(
                    images_u8, img_idx, cls_mats, cls_valid,
                    self.cls_h, self.cls_w, self.interp)
                cls_probs = cls_fn(cls_p, cls_crops)
                rot = (jnp.argmax(cls_probs, axis=1) == self.idx180) & \
                    (cls_probs[:, self.idx180] > self.cls_thresh)
                mats = jnp.where(rot[:, None, None], rec_mats_rot, rec_mats)
            else:
                mats = rec_mats
            crops = warp_ops.warp_crops_multi(images_u8, img_idx, mats,
                                              rec_valid, out_h, out_w,
                                              self.interp)
            if self.rec_forward.masks_width:
                idx, prob = rec_fn(rec_p, crops, (rec_valid + 7) // 8)
            else:
                idx, prob = rec_fn(rec_p, crops)
            # packed (N, 2T+1) = [idx, prob, score] — one download
            return jnp.concatenate(
                [idx.astype(jnp.float32), prob.astype(jnp.float32),
                 scores.astype(jnp.float32)[:, None]], axis=-1)

        return jax.jit(step, static_argnames=("out_h", "out_w"))

    def call_multi_scored(self, images_u8, probs, rhw, img_idx, pre_quads,
                          cls_mats, cls_valid, rec_mats, rec_mats_rot,
                          rec_valid, out_h: int, out_w: int,
                          use_cls: bool = True):
        key = ("multi_scored", use_cls)
        fn = self._jit.get(key)
        if fn is None:
            fn = self._build_multi_scored(use_cls)
            self._jit[key] = fn
        cls_p, rec_p = self._pp(use_cls)
        return fn(cls_p, rec_p, jnp.asarray(images_u8), probs,
                  jnp.asarray(rhw),
                  jnp.asarray(img_idx), jnp.asarray(pre_quads),
                  jnp.asarray(cls_mats), jnp.asarray(cls_valid),
                  jnp.asarray(rec_mats), jnp.asarray(rec_mats_rot),
                  jnp.asarray(rec_valid), out_h, out_w)

    def call_multi(self, images_u8, img_idx, cls_mats, cls_valid, rec_mats,
                   rec_mats_rot, rec_valid, out_h: int, out_w: int,
                   use_cls: bool = True):
        key = ("multi", use_cls)
        fn = self._jit.get(key)
        if fn is None:
            fn = self._build_multi(use_cls)
            self._jit[key] = fn
        cls_p, rec_p = self._pp(use_cls)
        return fn(cls_p, rec_p, jnp.asarray(images_u8),
                  jnp.asarray(img_idx),
                  jnp.asarray(cls_mats), jnp.asarray(cls_valid),
                  jnp.asarray(rec_mats), jnp.asarray(rec_mats_rot),
                  jnp.asarray(rec_valid), out_h, out_w)

    def __call__(self, image_u8_dev, cls_mats, cls_valid, rec_mats,
                 rec_mats_rot, rec_valid, out_h: int, out_w: int,
                 use_cls: bool = True):
        key = use_cls
        fn = self._jit.get(key)
        if fn is None:
            fn = self._build(use_cls)
            self._jit[key] = fn
        cls_p, rec_p = self._pp(use_cls)
        return fn(cls_p, rec_p, image_u8_dev, jnp.asarray(cls_mats),
                  jnp.asarray(cls_valid), jnp.asarray(rec_mats),
                  jnp.asarray(rec_mats_rot), jnp.asarray(rec_valid),
                  out_h, out_w)
