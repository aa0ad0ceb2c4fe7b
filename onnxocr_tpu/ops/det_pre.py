"""Detection preprocessing: resize semantics + bucketed device input prep.

Replicates the reference op chain DetResizeForTest → NormalizeImage →
ToCHWImage → KeepKeys (reference: onnxocr/operators.py:34-187, assembled in
predict_det.py:11-28) with TPU static-shape discipline:

* The /32-rounded resize target is computed on host (exact reference
  arithmetic, operators.py:91-138).
* The resized image is padded up to a *bucket* (multiple of
  ``tpu_det_bucket``) so each distinct padded shape compiles exactly once.
* Normalization (ImageNet mean/std) happens inside the jitted model call —
  XLA fuses it into the first conv — so only uint8 travels host→device.
"""
from __future__ import annotations

import math
from typing import Optional, Tuple

import numpy as np
import jax.numpy as jnp

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], dtype=np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], dtype=np.float32)


def det_resize_target(h: int, w: int, limit_side_len: float = 960,
                      limit_type: str = "max") -> Tuple[int, int]:
    """Compute the /32-rounded (resize_h, resize_w) the reference would use
    (operators.py:99-127 resize_image_type0)."""
    if limit_type == "max":
        ratio = float(limit_side_len) / max(h, w) if max(h, w) > limit_side_len else 1.0
    elif limit_type == "min":
        ratio = float(limit_side_len) / min(h, w) if min(h, w) < limit_side_len else 1.0
    elif limit_type == "resize_long":
        ratio = float(limit_side_len) / max(h, w)
    else:
        raise ValueError(f"unsupported limit_type {limit_type!r}")
    resize_h = int(h * ratio)
    resize_w = int(w * ratio)
    resize_h = max(int(round(resize_h / 32) * 32), 32)
    resize_w = max(int(round(resize_w / 32) * 32), 32)
    return resize_h, resize_w


def det_resize_long_target(h: int, w: int, resize_long: float = 960
                           ) -> Tuple[int, int]:
    """resize_type 2: scale longest side to resize_long, round sides UP to
    /128 (reference operators.py:140-161 resize_image_type2)."""
    ratio = float(resize_long) / max(h, w)
    resize_h = int(h * ratio)
    resize_w = int(w * ratio)
    stride = 128
    resize_h = (resize_h + stride - 1) // stride * stride
    resize_w = (resize_w + stride - 1) // stride * stride
    return resize_h, resize_w


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def prepare_det_input(img: np.ndarray, limit_side_len: float = 960,
                      limit_type: str = "max", bucket: int = 320,
                      image_shape: Optional[Tuple[int, int]] = None,
                      keep_ratio: bool = False,
                      canvas: Optional[Tuple[int, int]] = None,
                      ) -> Tuple[np.ndarray, np.ndarray, Tuple[int, int]]:
    """Host-side det input prep.

    Returns (padded_u8 (Hb, Wb, 3), shape_info [src_h, src_w, ratio_h,
    ratio_w], (resize_h, resize_w)). The tiny-image zero-pad quirk
    (operators.py:57-58, 72-76: pad to ≥32 when h+w < 64) is preserved.

    canvas overrides the per-page bucket canvas with a fixed (Hb, Wb)
    (must cover the resize target) — used by fixed-canvas page batching,
    where activation masking makes the padding invisible.
    """
    import cv2
    src_h, src_w = img.shape[:2]
    if src_h + src_w < 64:
        pad = np.zeros((max(32, src_h), max(32, src_w), img.shape[2]),
                       np.uint8)
        pad[:src_h, :src_w] = img
        img = pad

    h, w = img.shape[:2]
    if image_shape is not None:
        # resize_type 1: fixed target shape (operators.py:78-89)
        resize_h, resize_w = image_shape
        if keep_ratio:
            resize_w = int(math.ceil(w * resize_h / h / 32) * 32)
        ratio_h = float(resize_h) / h
        ratio_w = float(resize_w) / w
    else:
        resize_h, resize_w = det_resize_target(h, w, limit_side_len,
                                               limit_type)
        ratio_h = resize_h / float(h)
        ratio_w = resize_w / float(w)
    resized = cv2.resize(img, (resize_w, resize_h))

    if canvas is not None:
        hb = max(canvas[0], round_up(resize_h, bucket))
        wb = max(canvas[1], round_up(resize_w, bucket))
    else:
        hb = round_up(resize_h, bucket)
        wb = round_up(resize_w, bucket)
    padded = np.zeros((hb, wb, 3), dtype=np.uint8)
    padded[:resize_h, :resize_w] = resized
    shape_info = np.array([src_h, src_w, ratio_h, ratio_w], dtype=np.float64)
    return padded, shape_info, (resize_h, resize_w)


def bitpack_map(prob: jnp.ndarray, vh, vw, thresh) -> jnp.ndarray:
    """(H, W) float prob → (H, W//8) uint8 little-endian bitpacked
    (prob > thresh), zeroed outside the (vh, vw) valid region. The wire
    for the DB bitmap costs 8x less than the quantized map — on the
    tunneled TPU link (~7 MB/s device→host) that's the difference between
    ~90 ms and ~12 ms per page. Host side unpacks with
    np.unpackbits(..., axis=1, bitorder='little')."""
    H, W = prob.shape
    row = jnp.arange(H, dtype=jnp.int32)[:, None] < vh
    col = jnp.arange(W, dtype=jnp.int32)[None, :] < vw
    bits = (prob > thresh) & row & col
    b = bits.reshape(H, W // 8, 8).astype(jnp.int32)
    weights = (1 << jnp.arange(8, dtype=jnp.int32))
    return jnp.sum(b * weights[None, None], axis=-1).astype(jnp.uint8)


def unpack_bitmap(bits_u8: np.ndarray, rw: int) -> np.ndarray:
    """Host twin of bitpack_map: (rh, ceil(rw/8)) packed rows → (rh, rw)
    uint8 0/1 bitmap."""
    return np.unpackbits(bits_u8, axis=1, bitorder="little")[:, :rw]


def normalize_det(x_u8: jnp.ndarray) -> jnp.ndarray:
    """uint8 NHWC → ImageNet-normalized float32 NHWC (device-side; fused by
    XLA into the first conv). Matches NormalizeImage(scale=1/255, ImageNet
    mean/std) (operators.py:7-31)."""
    x = x_u8.astype(jnp.float32) / 255.0
    return (x - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)


def normalize_pm1(x_u8: jnp.ndarray) -> jnp.ndarray:
    """uint8 → [-1, 1] float (rec/cls normalization, predict_rec.py:74-77)."""
    return x_u8.astype(jnp.float32) / 127.5 - 1.0
