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
                 interp: str = "bicubic"):
        self.cls_forward = cls_forward
        self.rec_forward = rec_forward
        self.cls_h, self.cls_w = cls_shape
        self.cls_thresh = cls_thresh
        self.idx180 = idx180
        self.interp = interp
        self._jit = {}

    def _build(self, use_cls: bool):
        cls_fn = self.cls_forward._native_fn if \
            self.cls_forward is not None and \
            self.cls_forward.backend == "native" else \
            (self.cls_forward._graph_fn if self.cls_forward else None)
        rec_fn = self.rec_forward._native_fn if \
            self.rec_forward.backend == "native" else self.rec_forward._graph_fn

        def step(image_u8, cls_mats, cls_valid, rec_mats, rec_mats_rot,
                 rec_valid, out_h: int, out_w: int):
            if use_cls:
                cls_crops = warp_ops.warp_crops(
                    image_u8, cls_mats, cls_valid, self.cls_h, self.cls_w,
                    self.interp)
                cls_probs = cls_fn(cls_crops)
                rot = (jnp.argmax(cls_probs, axis=1) == self.idx180) & \
                    (cls_probs[:, self.idx180] > self.cls_thresh)
                mats = jnp.where(rot[:, None, None], rec_mats_rot, rec_mats)
            else:
                cls_probs = jnp.zeros((rec_mats.shape[0], 2), jnp.float32)
                rot = jnp.zeros((rec_mats.shape[0],), bool)
                mats = rec_mats
            crops = warp_ops.warp_crops(image_u8, mats, rec_valid, out_h,
                                        out_w, self.interp)
            if self.rec_forward.masks_width:
                idx, prob = rec_fn(crops, (rec_valid + 7) // 8)
            else:
                idx, prob = rec_fn(crops)
            return idx, prob, cls_probs, rot

        return jax.jit(step, static_argnames=("out_h", "out_w"))

    def _build_multi(self, use_cls: bool):
        """Cross-image variant: crops gather from a BATCH of source pages
        (warp_crops_multi) so concurrent requests' cls+rec fuse into one
        device call (runtime/batcher.RecPageBatcher)."""
        cls_fn = self.cls_forward._native_fn if \
            self.cls_forward is not None and \
            self.cls_forward.backend == "native" else \
            (self.cls_forward._graph_fn if self.cls_forward else None)
        rec_fn = self.rec_forward._native_fn if \
            self.rec_forward.backend == "native" else self.rec_forward._graph_fn

        def step(images_u8, img_idx, cls_mats, cls_valid, rec_mats,
                 rec_mats_rot, rec_valid, out_h: int, out_w: int):
            if use_cls:
                cls_crops = warp_ops.warp_crops_multi(
                    images_u8, img_idx, cls_mats, cls_valid,
                    self.cls_h, self.cls_w, self.interp)
                cls_probs = cls_fn(cls_crops)
                rot = (jnp.argmax(cls_probs, axis=1) == self.idx180) & \
                    (cls_probs[:, self.idx180] > self.cls_thresh)
                mats = jnp.where(rot[:, None, None], rec_mats_rot, rec_mats)
            else:
                mats = rec_mats
            crops = warp_ops.warp_crops_multi(images_u8, img_idx, mats,
                                              rec_valid, out_h, out_w,
                                              self.interp)
            if self.rec_forward.masks_width:
                idx, prob = rec_fn(crops, (rec_valid + 7) // 8)
            else:
                idx, prob = rec_fn(crops)
            return idx, prob

        return jax.jit(step, static_argnames=("out_h", "out_w"))

    def call_multi(self, images_u8, img_idx, cls_mats, cls_valid, rec_mats,
                   rec_mats_rot, rec_valid, out_h: int, out_w: int,
                   use_cls: bool = True):
        key = ("multi", use_cls)
        fn = self._jit.get(key)
        if fn is None:
            fn = self._build_multi(use_cls)
            self._jit[key] = fn
        return fn(jnp.asarray(images_u8), jnp.asarray(img_idx),
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
        return fn(image_u8_dev, jnp.asarray(cls_mats),
                  jnp.asarray(cls_valid), jnp.asarray(rec_mats),
                  jnp.asarray(rec_mats_rot), jnp.asarray(rec_valid),
                  out_h, out_w)
