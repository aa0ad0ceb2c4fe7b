"""Device-side detector input prep: bilinear resize from the HBM-resident
original image into the padded det bucket.

Replaces the hot-path host cv2.resize + second upload (the original image is
already in HBM for the crop warps): one jit per (source-bucket, det-bucket)
pair, with the actual resize factors passed as runtime scalars so arbitrary
source sizes reuse the same compiled program.

Half-pixel mapping matches cv2.resize INTER_LINEAR (ops/warp.py convention).
Output is float32 NHWC, ImageNet-normalized (det_pre.normalize_det), with
rows ≥ resize_h / cols ≥ resize_w zeroed.
"""
from __future__ import annotations

import functools
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

from . import det_pre


def _resize_normalize_det(image_u8: jax.Array, src_h: jax.Array,
                          src_w: jax.Array, resize_h: jax.Array,
                          resize_w: jax.Array, out_h: int,
                          out_w: int) -> jax.Array:
    """image_u8: (Hs, Ws, 3) padded source (valid region src_h × src_w).
    Returns (out_h, out_w, 3) float32 normalized det input whose top-left
    resize_h × resize_w region is the bilinear resize of the valid source.
    """
    Hs, Ws = image_u8.shape[:2]

    ys = jnp.arange(out_h, dtype=jnp.float32)
    xs = jnp.arange(out_w, dtype=jnp.float32)
    sy = src_h.astype(jnp.float32) / resize_h.astype(jnp.float32)
    sx = src_w.astype(jnp.float32) / resize_w.astype(jnp.float32)
    src_y = jnp.clip((ys + 0.5) * sy - 0.5, 0.0,
                     src_h.astype(jnp.float32) - 1.0)
    src_x = jnp.clip((xs + 0.5) * sx - 0.5, 0.0,
                     src_w.astype(jnp.float32) - 1.0)

    # Separable bilinear as TWO dense matmuls instead of 4 full-canvas
    # gathers (gathers are index-rate-bound on TPU: 16 ms at 960²,
    # tools/profile_onecall.py r4; the MXU does this in <1 ms). Each
    # weight row has exactly the two taps max(0, 1-|i-src|) of the
    # half-pixel formula — same taps, same weights as the gather form.
    iy = jnp.arange(Hs, dtype=jnp.float32)
    ix = jnp.arange(Ws, dtype=jnp.float32)
    Wy = jnp.maximum(0.0, 1.0 - jnp.abs(iy[None, :] - src_y[:, None]))
    Wx = jnp.maximum(0.0, 1.0 - jnp.abs(ix[None, :] - src_x[:, None]))
    # rows beyond the valid source never get weight: src_y <= src_h-1
    # keeps taps at <= src_h-1 by construction (likewise columns)
    tmp = (Wy @ image_u8.reshape(Hs, Ws * 3).astype(jnp.float32)
           ).reshape(out_h, Ws, 3)
    vals = jnp.einsum("hwc,xw->hxc", tmp, Wx,
                      preferred_element_type=jnp.float32)

    # cv2.resize rounds to uint8 between resize and normalize; replicate.
    vals = jnp.round(jnp.clip(vals, 0.0, 255.0))
    norm = (vals / 255.0 - jnp.asarray(det_pre.IMAGENET_MEAN)) / \
        jnp.asarray(det_pre.IMAGENET_STD)
    row_mask = (jnp.arange(out_h) < resize_h)[:, None, None]
    col_mask = (jnp.arange(out_w) < resize_w)[None, :, None]
    return jnp.where(row_mask & col_mask, norm, 0.0).astype(jnp.float32)


resize_normalize_det = functools.partial(
    jax.jit, static_argnames=("out_h", "out_w"))(_resize_normalize_det)


def resize_normalize_det_batch(images_u8, src_hs, src_ws, resize_hs,
                               resize_ws, out_h: int, out_w: int):
    """Batched variant (for engine-level det batching): images_u8
    (B, Hs, Ws, 3) sharing one source bucket; per-page valid/resize extents.
    → (B, out_h, out_w, 3). NOT jitted here — meant to be traced inside the
    caller's fused resize+forward program."""
    return jax.vmap(_resize_normalize_det,
                    in_axes=(0, 0, 0, 0, 0, None, None)
                    )(images_u8, src_hs, src_ws, resize_hs, resize_ws,
                      out_h, out_w)


# Source-bucket granularity. Deliberately coarse (512, min one full tile):
# every distinct padded source shape compiles its own resize/warp/fused
# programs, and on the tunneled TPU each program costs seconds of
# compile/load once per process, while the padding it avoids costs
# milliseconds of upload bandwidth (~160 MB/s up). 512 collapses a typical
# mixed corpus from ~9 source buckets to ~4-5.
SRC_BUCKET = 512


def src_bucket_shape(h: int, w: int) -> Tuple[int, int]:
    """The padded (hb, wb) source bucket for an h×w image — the compile key
    for every program that gathers from the HBM-resident source."""
    return (max(SRC_BUCKET, det_pre.round_up(h, SRC_BUCKET)),
            max(SRC_BUCKET, det_pre.round_up(w, SRC_BUCKET)))


def pad_src_bucket(img: np.ndarray) -> Tuple[np.ndarray, int, int]:
    """EDGE-pad the original image up to a source bucket so each distinct
    padded shape compiles the resize/warp programs once. Edge padding (not
    zeros) keeps BORDER_REPLICATE semantics for crop warps that clamp at the
    padded boundary."""
    h, w = img.shape[:2]
    hb, wb = src_bucket_shape(h, w)
    if (hb, wb) == (h, w):
        return np.ascontiguousarray(img), h, w
    out = np.pad(img, ((0, hb - h), (0, wb - w), (0, 0)), mode="edge")
    return out, h, w


# ----------------------------------------------------------- flat upload
# 2-D bucket padding wastes upload bytes (a 968×724 page pads to 1024² —
# +50%) and costs a host edge-pad copy of the whole image on the 1-core
# host. The flat path uploads only the CONTENT (row-major, padded to a
# geometric 1-D length ladder, ~15% mean waste) and reconstructs the
# edge-padded 2-D canvas ON DEVICE with one clamp-gather per
# (length-bucket, canvas) pair — bit-identical to np.pad(mode='edge'),
# so every downstream consumer (resize, warps, onecall) is unchanged.

def _build_len_ladder(lo: int = 1 << 18, hi: int = 9_500_000,
                      num: int = 4, den: int = 3) -> Tuple[int, ...]:
    ladder = [lo]
    while ladder[-1] < hi:
        ladder.append(ladder[-1] * num // den)
    return tuple(ladder)


LEN_LADDER_PX = _build_len_ladder()


def flat_len_bucket(npx: int) -> int:
    for L in LEN_LADDER_PX:
        if npx <= L:
            return L
    return LEN_LADDER_PX[-1] if npx <= LEN_LADDER_PX[-1] else npx


@functools.partial(jax.jit, static_argnames=("hb", "wb"))
def _unpack_src(flat_u8: jax.Array, h: jax.Array, w: jax.Array,
                hb: int, wb: int) -> jax.Array:
    """(L, 3) row-major content (valid h*w rows) → (hb, wb, 3) canvas with
    edge replication beyond (h, w): out[y, x] = flat[min(y,h-1)*w +
    min(x,w-1)] — exactly np.pad(mode='edge') semantics."""
    yy = jnp.minimum(jnp.arange(hb), h - 1)[:, None]
    xx = jnp.minimum(jnp.arange(wb), w - 1)[None, :]
    idx = (yy * w + xx).reshape(-1)
    return jnp.take(flat_u8, idx, axis=0).reshape(hb, wb, 3)


def put_src_bucket(img: np.ndarray, mode: str = "auto"):
    """Upload a BGR page and return (canvas_dev (hb, wb, 3) uint8 DEVICE,
    src_h, src_w) — the HBM-resident source every device program gathers
    from. mode: 'flat' (content-only upload + device unpack), 'padded'
    (host edge-pad + full-canvas upload), 'auto' (flat on TPU, padded
    elsewhere — CPU tests keep the zero-program path)."""
    h, w = img.shape[:2]
    use_flat = mode == "flat" or (mode == "auto" and
                                  jax.default_backend() == "tpu")
    if not use_flat:
        padded, h, w = pad_src_bucket(img)
        return jax.device_put(padded), h, w
    hb, wb = src_bucket_shape(h, w)
    L = flat_len_bucket(h * w)
    flat = np.empty((L, 3), np.uint8)
    flat[:h * w] = img.reshape(-1, 3)
    fdev = jax.device_put(flat)
    canvas = _unpack_src(fdev, jnp.int32(h), jnp.int32(w), hb, wb)
    return canvas, h, w
