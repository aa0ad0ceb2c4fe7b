"""Batched perspective-warp cropping on device.

Replaces the reference's per-box host loop of cv2.getPerspectiveTransform +
cv2.warpPerspective(..., BORDER_REPLICATE, INTER_CUBIC) followed by the
recognizer's cv2.resize + pad (reference: onnxocr/utils.py:12-53,
onnxocr/predict_rec.py:26-80, onnxocr/predict_system.py:48-54).

TPU-native design: the source image is uploaded to HBM once (uint8), and all
N crops are produced by ONE jit-compiled gather kernel that composes
  dest pixel → (resize + optional rot90/rot180) → inverse homography → source
into a single 3×3 matrix per crop, sampling bilinearly or bicubically and
writing the recognizer-normalized float directly. The warp, the resize, the
rotation quirks, the [-1,1] normalization, and the width-padding mask all fuse
into one XLA program — no intermediate crops ever exist.
"""
from __future__ import annotations

import functools
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp


# ----------------------------------------------------------------- homography
def perspective_transform(src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    """Solve the 3x3 homography H mapping src[i] → dst[i] (4 points each).

    Equivalent to cv2.getPerspectiveTransform. Used with roles swapped to get
    the dest→source map the gather kernel needs.
    """
    src = np.asarray(src, dtype=np.float64).reshape(4, 2)
    dst = np.asarray(dst, dtype=np.float64).reshape(4, 2)
    A = np.zeros((8, 8))
    b = np.zeros(8)
    for i in range(4):
        x, y = src[i]
        u, v = dst[i]
        A[2 * i] = [x, y, 1, 0, 0, 0, -u * x, -u * y]
        A[2 * i + 1] = [0, 0, 0, x, y, 1, -v * x, -v * y]
        b[2 * i] = u
        b[2 * i + 1] = v
    h = np.linalg.solve(A, b)
    return np.append(h, 1.0).reshape(3, 3)


def crop_geometry(box: np.ndarray) -> Tuple[int, int]:
    """Crop width/height from a quad, as the reference computes them
    (onnxocr/utils.py:24-33)."""
    pts = np.asarray(box, dtype=np.float32)
    w = int(max(np.linalg.norm(pts[0] - pts[1]),
                np.linalg.norm(pts[2] - pts[3])))
    h = int(max(np.linalg.norm(pts[0] - pts[3]),
                np.linalg.norm(pts[1] - pts[2])))
    return w, h


def _affine(a, b, c, d, tx, ty) -> np.ndarray:
    return np.array([[a, b, tx], [c, d, ty], [0, 0, 1.0]])


def build_crop_matrix(box: np.ndarray, out_h: int, bucket_w: int,
                      min_wh_ratio: float = 0.0,
                      rotate180: bool = False) -> Tuple[np.ndarray, int]:
    """Compose the dest→source matrix for one crop.

    Replicates the reference chain: perspective warp to (cw, ch); rot90 if
    ch/cw >= 1.5 (utils.py:51-52); optional 180° rotation (the cls fix,
    predict_cls.py:85-88); then resize height→out_h with width
    ceil(out_h * ratio) capped at bucket_w (predict_rec.py:63-68).

    Returns (H_mat 3x3 float32 dest(x,y)→src(x,y), resized_w).
    """
    pts = np.asarray(box, dtype=np.float32).reshape(4, 2)
    cw, ch = crop_geometry(pts)
    cw = max(cw, 1)
    ch = max(ch, 1)
    dst_std = np.array([[0, 0], [cw, 0], [cw, ch], [0, ch]], dtype=np.float32)
    # dest crop coords → source image coords (roles swapped vs cv2 call)
    M_inv = perspective_transform(dst_std, pts)

    if ch * 1.0 / cw >= 1.5:
        # np.rot90 (counter-clockwise): rotated[y', x'] = crop[x', cw-1-y']
        rot = _affine(0, -1, 1, 0, cw - 1.0, 0.0)  # (x',y') → (crop_x,crop_y)
        M_inv = M_inv @ rot
        cw, ch = ch, cw

    if rotate180:
        # cv2.rotate(img, ROTATE_180): out[y,x] = in[ch-1-y, cw-1-x]
        rot = _affine(-1, 0, 0, -1, cw - 1.0, ch - 1.0)
        M_inv = M_inv @ rot

    ratio = cw / float(ch)
    if int(np.ceil(out_h * ratio)) > bucket_w:
        resized_w = bucket_w
    else:
        resized_w = max(1, int(np.ceil(out_h * ratio)))
    if ratio < min_wh_ratio:
        # reference pads to imgW = imgH * max_wh_ratio; bucket_w plays that
        # role here, resized_w already computed from the true ratio.
        pass
    # resize inverse with half-pixel convention (cv2.resize INTER_LINEAR):
    # crop_x = (x + 0.5) * cw / resized_w - 0.5
    sx = cw / float(resized_w)
    sy = ch / float(out_h)
    rs = _affine(sx, 0, 0, sy, 0.5 * sx - 0.5, 0.5 * sy - 0.5)
    M = M_inv @ rs
    return M.astype(np.float32), resized_w


# ----------------------------------------------------------------- sampling
def _cubic_weights(t, a=-0.75):
    """cv2 INTER_CUBIC kernel (Catmull-Rom family, a=-0.75) weights for the
    4 taps at offsets -1, 0, 1, 2 relative to floor(coord)."""
    t2 = t * t
    t3 = t2 * t
    w0 = a * (t3 - 2 * t2 + t)
    w1 = (a + 2) * t3 - (a + 3) * t2 + 1
    w2 = -(a + 2) * t3 + (2 * a + 3) * t2 - a * t
    w3 = a * (t2 - t3)
    return w0, w1, w2, w3


def _sample_bilinear(flat, H, W, sx, sy):
    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    fx = sx - x0
    fy = sy - y0
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)

    def tap(yy, xx):
        # gather the uint8 source and convert AFTER: 4x less gather
        # bandwidth and no full-image f32 materialization; bit-identical
        # (u8→f32 commutes with the gather)
        yy = jnp.clip(yy, 0, H - 1)
        xx = jnp.clip(xx, 0, W - 1)
        return jnp.take(flat, yy * W + xx, axis=0).astype(jnp.float32)

    fx = fx[..., None]
    fy = fy[..., None]
    top = tap(y0, x0) * (1 - fx) + tap(y0, x0 + 1) * fx
    bot = tap(y0 + 1, x0) * (1 - fx) + tap(y0 + 1, x0 + 1) * fx
    return top * (1 - fy) + bot * fy


def _sample_bicubic(flat, H, W, sx, sy):
    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    fx = sx - x0
    fy = sy - y0
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)
    wx = _cubic_weights(fx)
    wy = _cubic_weights(fy)

    def tap(yy, xx):
        # uint8 gather — see _sample_bilinear.tap
        yy = jnp.clip(yy, 0, H - 1)
        xx = jnp.clip(xx, 0, W - 1)
        return jnp.take(flat, yy * W + xx, axis=0).astype(jnp.float32)

    out = 0.0
    for j in range(4):
        row = 0.0
        for i in range(4):
            row = row + tap(y0 + j - 1, x0 + i - 1) * wx[i][..., None]
        out = out + row * wy[j][..., None]
    return out


# Staged-warp fast path: rows of source staged per crop. 128 rows covers
# every text-line crop (taller spans take the gather path).
_STAGE_ROWS = 128


def _separable_mask(mats, H: int, out_h: int, out_w: int, tol: float):
    """Crops whose dest→src map is an axis-separable affine (upright
    rectangles: no cross terms, no perspective) AND whose source-row span
    fits the staging window."""
    b = jnp.abs(mats[:, 0, 1])
    d = jnp.abs(mats[:, 1, 0])
    g = jnp.abs(mats[:, 2, 0])
    h = jnp.abs(mats[:, 2, 1])
    affine = (g < 1e-8) & (h < 1e-8)
    upright = affine & (b <= tol) & (d <= tol)
    e, f = mats[:, 1, 1], mats[:, 1, 2]
    sy_ends = jnp.stack([f, e * (out_h - 1.0) + f], axis=-1)
    span = jnp.abs(sy_ends[:, 1] - sy_ends[:, 0])
    return upright & (span <= _STAGE_ROWS - 3)


# pass-2b shift bank half-width (columns of per-row x drift)
_SHIFT_BANK = 5


def _shear_affine(mats, valid_w, out_h: int, tol: float = 0.35):
    """Per-crop least-squares affine through the 4 mapped corners of the
    valid dest rect, plus eligibility for the shear-staged path.

    The onecall quads are ROUNDED to integer source coords
    (unpack_boxes contract), which deforms parallelograms into true
    small-perspective quads (|g| up to ~4e-4 measured on doc pages) —
    so "affine" cannot be tested on the homography's g/h rows, and the
    numerator coefficients alone misplace samples by the dropped
    denominator. Instead: push the dest corners (0,0) (X,0) (0,Y) (X,Y)
    through the full homography and fit the affine exactly through
    their midpoints; for a rect-grid the LS fit is closed-form and the
    non-affine residual is a single vector r = (p00 − p10 − p01 + p11)/4
    (each corner off by ±r). Exact for parallelograms.

    Returns (a, b, c, d, e, f, elig): the affine dest→src coefficients
    and the eligibility mask:
      * map-vs-affine deviation ≤ tol px at 5 interior probes (edge
        midpoints + center — rounding-deformed quads' fitted homography
        bows 1-2 px there). tol=0.35 keeps those on the gather path;
        larger tol "de-bows" them through the affine (accuracy-gated)
      * |a| ≥ 0.05 (excludes rot90-composed verticals)
      * |d/a| ≤ 0.3 (Catmull-Smith y-position error bound, px)
      * |b·(out_h−1)/a| < _SHIFT_BANK (pass-2b shift-bank reach)
      * corner y-span ≤ staging window
    """
    X = jnp.maximum(valid_w.astype(jnp.float32) - 1.0, 1.0)
    Y = float(max(out_h - 1, 1))

    def corner(x, y):
        u = mats[:, 0, 0] * x + mats[:, 0, 1] * y + mats[:, 0, 2]
        v = mats[:, 1, 0] * x + mats[:, 1, 1] * y + mats[:, 1, 2]
        w = mats[:, 2, 0] * x + mats[:, 2, 1] * y + mats[:, 2, 2]
        w_ok = jnp.abs(w) > 1e-3
        w_safe = jnp.where(w_ok, w, 1.0)
        return u / w_safe, v / w_safe, w_ok

    zero = jnp.zeros_like(X)
    p00x, p00y, ok00 = corner(zero, 0.0)
    p10x, p10y, ok10 = corner(X, 0.0)
    p01x, p01y, ok01 = corner(zero, Y)
    p11x, p11y, ok11 = corner(X, Y)
    w_ok = ok00 & ok10 & ok01 & ok11

    a = (p10x + p11x - p00x - p01x) / (2.0 * X)
    d = (p10y + p11y - p00y - p01y) / (2.0 * X)
    b = (p01x + p11x - p00x - p10x) / (2.0 * Y)
    e = (p01y + p11y - p00y - p10y) / (2.0 * Y)
    c = 0.25 * (p00x + p10x + p01x + p11x) - a * X * 0.5 - b * Y * 0.5
    f = 0.25 * (p00y + p10y + p01y + p11y) - d * X * 0.5 - e * Y * 0.5

    # interior deviation probes: the fitted homography through 4 rounded
    # corners BOWS between them (projective leverage: a 0.5 px corner
    # residual measured 1.4-2 px at edge midpoints on a 320-wide crop),
    # so bound the REAL map-vs-affine deviation at the 4 edge midpoints
    # + center, not the corner residual.
    dev = jnp.zeros(mats.shape[0])
    for (px_, py_) in ((0.5, 0.0), (0.0, 0.5), (1.0, 0.5), (0.5, 1.0),
                       (0.5, 0.5)):
        qx, qy, _ = corner(px_ * X, py_ * Y)
        ex = qx - (a * px_ * X + b * py_ * Y + c)
        ey = qy - (d * px_ * X + e * py_ * Y + f)
        dev = jnp.maximum(dev, jnp.maximum(jnp.abs(ex), jnp.abs(ey)))
    near_affine = dev <= tol

    ok_a = jnp.abs(a) >= 0.05
    a_safe = jnp.where(ok_a, a, 1.0)
    shear = jnp.abs(d / a_safe) <= 0.3
    drift = jnp.abs(b * (out_h - 1.0) / a_safe) <= (_SHIFT_BANK - 0.001)
    lo = jnp.minimum(jnp.minimum(p00y, p10y), jnp.minimum(p01y, p11y))
    hi = jnp.maximum(jnp.maximum(p00y, p10y), jnp.maximum(p01y, p11y))
    span_ok = (hi - lo) <= (_STAGE_ROWS - 4)
    elig = w_ok & near_affine & ok_a & shear & drift & span_ok
    return a, b, c, d, e, f, elig


def _shear_mask(mats, H: int, valid_w, out_h: int, tol: float = 0.35):
    """Eligibility half of _shear_affine (kept as the select mask)."""
    return _shear_affine(mats, valid_w, out_h, tol)[-1]


def _staged_shear(image_u8, mats, valid_w, out_h: int, out_w: int):
    """Deskew-preserving staged warp for small-tilt affine crops.

    The per-pixel gather warp is issue-rate-bound (~120 M gathers/s —
    rec_warp 99 ms on a 32-crop doc page, profile r5d) and real det
    quads carry 1-3° tilts that the rejected axis-snap gate proved must
    be DESKEWED, not dropped (evalgates.jsonl r5_axis_snap). This path
    keeps the deskew while replacing every per-pixel gather with dense
    VPU/MXU work, via a Catmull-Smith style decomposition of the affine
    dest→src map  sx = a·x + b·y + c,  sy = d·x + e·y + f:

      stage   gather the crop's _STAGE_ROWS source rows (dense reads)
      pass 1  y-resample each source column w at the EXACT shear height
              σ(v,w) = d·(w − b·v − c)/a + e·v + f — the sy at the dest
              x that reads column w — as a dense hat-weighted reduction
              over the staged rows (no gathers; weights built on the fly)
      pass 2a x-resample at u(x) = a·x + c with per-crop (x,w) hat
              weights shared across rows — an MXU einsum
      pass 2b apply the remaining per-row drift b·v/a as a sub-pixel
              shift from a ±3-column static shift bank (edge-padded
              slices + select; exact no-op when b = 0)

    vs the gather path: y error ≤ |d/a| ≤ 0.3 px (typ. ≤0.04), x adds
    one sub-pixel re-interpolation — accuracy-gated before adoption.
    Returns (K, out_h, out_w, 3) f32 in [0, 255]."""
    H, W = image_u8.shape[:2]
    K = mats.shape[0]
    # LS affine through the mapped corners (NOT the homography's top rows:
    # rounded quads carry a real denominator — see _shear_affine)
    a, b, c, d, e, f, _ = _shear_affine(mats, valid_w, out_h)
    a = jnp.where(jnp.abs(a) >= 0.05, a, 1.0)  # ineligible rows: finite math

    vs = jnp.arange(out_h, dtype=jnp.float32)
    xs = jnp.arange(out_w, dtype=jnp.float32)
    ws = jnp.arange(W, dtype=jnp.float32)
    rs = jnp.arange(_STAGE_ROWS, dtype=jnp.float32)

    # --- stage: source rows from floor(min corner sy) - 1
    xw = jnp.maximum(valid_w.astype(jnp.float32) - 1.0, 0.0)
    yv = out_h - 1.0
    corners = jnp.stack([f, d * xw + f, e * yv + f, d * xw + e * yv + f],
                        axis=-1)
    y0 = jnp.clip(jnp.floor(jnp.min(corners, axis=-1)) - 1.0, 0.0,
                  float(max(H - 1, 0)))
    rows = jnp.clip(y0[:, None].astype(jnp.int32) +
                    jnp.arange(_STAGE_ROWS, dtype=jnp.int32)[None, :],
                    0, H - 1)                                    # (K, RH)
    stage = jnp.take(image_u8, rows.reshape(-1), axis=0)
    stage = stage.reshape(K, _STAGE_ROWS, W, 3).astype(jnp.float32)

    # --- pass 1: T[k,v,w] = Σ_r hat(σl − r) · stage[k,r,w]
    A = d / a                                                     # (K,)
    sig = (A[:, None, None] * (ws[None, None, :] -
                               b[:, None, None] * vs[None, :, None] -
                               c[:, None, None]) +
           e[:, None, None] * vs[None, :, None] + f[:, None, None])
    sig = jnp.clip(sig, 0.0, H - 1.0) - y0[:, None, None]
    sig = jnp.clip(sig, 0.0, _STAGE_ROWS - 1.0)          # (K, out_h, W)
    wy = jnp.maximum(0.0, 1.0 - jnp.abs(sig[:, :, :, None] -
                                        rs[None, None, None, :]))
    T = jnp.einsum("kvwr,krwc->kvwc", wy, stage)

    # --- pass 2a: P[k,v,x] = Σ_w hat(clip(a·x + c) − w) · T[k,v,w]
    u = jnp.clip(a[:, None] * xs[None, :] + c[:, None], 0.0, W - 1.0)
    wx = jnp.maximum(0.0, 1.0 - jnp.abs(u[:, :, None] -
                                        ws[None, None, :]))  # (K,out_w,W)
    P = jnp.einsum("kxw,kvwc->kvxc", wx, T)

    # --- pass 2b: per-row drift b·v/a via the ±_SHIFT_BANK column bank
    shift = b[:, None] * vs[None, :] / a[:, None]            # (K, out_h)
    m = jnp.clip(jnp.floor(shift), -float(_SHIFT_BANK),
                 float(_SHIFT_BANK))
    phi = jnp.clip(shift - m, 0.0, 1.0)[..., None, None]
    mi = m.astype(jnp.int32)
    PAD = _SHIFT_BANK + 1
    Pp = jnp.pad(P, ((0, 0), (0, 0), (PAD, PAD), (0, 0)), mode="edge")
    out = jnp.zeros_like(P)
    for s in range(-_SHIFT_BANK, _SHIFT_BANK + 1):
        sl = Pp[:, :, PAD + s:PAD + s + out_w, :]
        sl1 = Pp[:, :, PAD + s + 1:PAD + s + 1 + out_w, :]
        sel = (mi == s)[..., None, None]
        out = jnp.where(sel, (1.0 - phi) * sl + phi * sl1, out)
    return out


def _staged_separable(image_u8, mats, out_h: int, out_w: int):
    """Separable bilinear warp via staged rows + two MXU einsums.

    The per-pixel gather warp is issue-rate-bound on TPU (~120 M
    gathers/s measured — rec_warp 99 ms on a 32-crop doc page,
    tools/profile_onecall.py round 5) and its cost is linear in REAL
    crop pixels. For upright crops (b = d = 0: sx depends only on x, sy
    only on y — every synthetic/scanned doc line) the warp is exactly
    separable bilinear, so: gather each crop's _STAGE_ROWS source rows
    (dense 6 KB row reads), then contract with per-crop bilinear hat
    weights along y and x on the MXU. Weight tensors are dense but
    bandwidth-cheap (~170 MB ≈ 0.4 ms vs the 99 ms they replace).
    Returns (N, out_h, out_w, 3) f32 in [0, 255]."""
    H, W = image_u8.shape[:2]
    K = mats.shape[0]
    a, c = mats[:, 0, 0], mats[:, 0, 2]
    e, f = mats[:, 1, 1], mats[:, 1, 2]
    ys = jnp.arange(out_h, dtype=jnp.float32)
    xs = jnp.arange(out_w, dtype=jnp.float32)
    sy = jnp.clip(e[:, None] * ys[None, :] + f[:, None], 0.0, H - 1.0)
    sx = jnp.clip(a[:, None] * xs[None, :] + c[:, None], 0.0, W - 1.0)

    y0 = jnp.clip(jnp.floor(jnp.min(sy, axis=1)) - 1.0, 0.0,
                  float(max(H - 1, 0)))
    rows = jnp.clip(y0[:, None].astype(jnp.int32) +
                    jnp.arange(_STAGE_ROWS, dtype=jnp.int32)[None, :],
                    0, H - 1)                               # (K, RH)
    stage = jnp.take(image_u8, rows.reshape(-1), axis=0)
    stage = stage.reshape(K, _STAGE_ROWS, W, 3).astype(jnp.float32)

    syl = sy - y0[:, None]                                   # (K, out_h)
    r_idx = jnp.arange(_STAGE_ROWS, dtype=jnp.float32)
    Wy = jnp.maximum(0.0, 1.0 - jnp.abs(syl[:, :, None] -
                                        r_idx[None, None, :]))
    w_idx = jnp.arange(W, dtype=jnp.float32)
    Wx = jnp.maximum(0.0, 1.0 - jnp.abs(sx[:, :, None] -
                                        w_idx[None, None, :]))
    inter = jnp.einsum("khr,krwc->khwc", Wy, stage)
    return jnp.einsum("khwc,kxw->khxc", inter, Wx)


@functools.partial(jax.jit,
                   static_argnames=("out_h", "out_w", "interp", "staged",
                                    "stage_tol", "slow_k"))
def warp_crops(image_u8: jax.Array, mats: jax.Array, valid_w: jax.Array,
               out_h: int, out_w: int, interp: str = "bicubic",
               staged=False, stage_tol: float = 0.35,
               slow_k: int = 16) -> jax.Array:
    """Produce N normalized crops from one source image.

    Args:
      image_u8: (H, W, 3) uint8 source image (device-resident).
      mats: (N, 3, 3) float32 dest→source matrices from build_crop_matrix.
      valid_w: (N,) int32 resized widths; columns >= valid_w are zeroed
        (matching the reference's zero-pad in normalized space,
        predict_rec.py:78-79).
      staged: route crops through a staged dense fast path instead of
        per-pixel gathers (bilinear only; tilted/perspective crops
        always keep the gather path):
          True/'upright' — exact separable path, engages ONLY on
            exactly-upright affines (b = d = 0). Real det quads carry
            1-2% PCA tilt so ~no crop qualifies without axis snapping,
            and the snap was rejected on a real-page accuracy gate
            (evalgates.jsonl r5_axis_snap).
          'shear' — deskew-PRESERVING staged warp (_staged_shear):
            small-tilt affines resample at the exact shear heights via
            a Catmull-Smith two-pass; subsumes the upright case.
        Default False (gather everywhere).
      stage_tol: shear-mode eligibility bound (px) on the map-vs-affine
        deviation at the interior probes. 0.35 keeps the fast path
        sub-pixel-faithful to the reference homography; larger values
        additionally "de-bow" rounding-deformed quads (accuracy-gate).
      slow_k: static sub-batch size for the shear mode's gather leg.
        The full-K gather costs ~55 M taps/s REGARDLESS of index
        locality (doc_a microbench: pinning 9/10 crops saved nothing),
        so ineligible crops are compacted into slow_k slots and only
        those gather; >slow_k ineligible crops lax.cond-falls back to
        the full gather. 0 disables the compaction.
    Returns:
      (N, out_h, out_w, 3) float32, normalized to [-1, 1] (rec/cls scheme:
      x/255 → (x-0.5)/0.5, predict_rec.py:74-77).
    """
    H, W = image_u8.shape[:2]
    K = mats.shape[0]
    flat = image_u8.reshape(-1, 3)  # stays uint8; taps convert post-gather

    xs = jnp.arange(out_w, dtype=jnp.float32)
    ys = jnp.arange(out_h, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(xs, ys)  # (out_h, out_w)

    def one(mat, vw):
        u = mat[0, 0] * gx + mat[0, 1] * gy + mat[0, 2]
        v = mat[1, 0] * gx + mat[1, 1] * gy + mat[1, 2]
        w = mat[2, 0] * gx + mat[2, 1] * gy + mat[2, 2]
        inv_w = 1.0 / w
        sx = u * inv_w
        sy = v * inv_w
        # BORDER_REPLICATE == clamp to the valid source rectangle
        sx = jnp.clip(sx, 0.0, W - 1.0)
        sy = jnp.clip(sy, 0.0, H - 1.0)
        # padded columns (gx >= vw) are zeroed by the output mask —
        # pin their coords to a constant index (dead lanes must not
        # wander; output identical)
        live = gx < vw
        sx = jnp.where(live, sx, 0.0)
        sy = jnp.where(live, sy, 0.0)
        if interp == "bicubic":
            vals = _sample_bicubic(flat, H, W, sx, sy)
        else:
            vals = _sample_bilinear(flat, H, W, sx, sy)
        return vals

    use_staged = bool(staged) and interp != "bicubic"
    if not use_staged:
        vals = jax.vmap(one)(mats, valid_w)
    elif staged != "shear":
        # 1e-5 absorbs the f32 homography-solve residual on exactly
        # axis-aligned quads (measured <=1.2e-8); x-shift error bound
        # 48 * 1e-5 < 0.001 px
        sep = _separable_mask(mats, H, out_h, out_w, 1e-5)
        fast = _staged_separable(image_u8, mats, out_h, out_w)
        degen = jnp.zeros_like(mats).at[:, 2, 2].set(1.0)
        pinned = jnp.where(sep[:, None, None], degen, mats)
        vals = jnp.where(sep[:, None, None, None], fast,
                         jax.vmap(one)(pinned, valid_w))
    else:
        sep = _shear_mask(mats, H, valid_w, out_h, stage_tol)
        fast = _staged_shear(image_u8, mats, valid_w, out_h, out_w)
        degen = jnp.zeros_like(mats).at[:, 2, 2].set(1.0)
        pinned = jnp.where(sep[:, None, None], degen, mats)

        def full_gather(fast):
            g = jax.vmap(one)(pinned, valid_w)
            return jnp.where(sep[:, None, None, None], fast, g)

        if not slow_k or slow_k >= K:
            vals = full_gather(fast)
        else:
            # compact the ineligible live crops into slow_k static slots:
            # the gather runs at ~55 M taps/s regardless of locality, so
            # its cost is set by the STATIC slot count alone
            slow = (~sep) & (valid_w > 0)
            n_slow = jnp.sum(slow.astype(jnp.int32))
            idx = jnp.argsort(jnp.where(slow, 0, 1), stable=True)[:slow_k]
            sub_vw = jnp.where(slow[idx], valid_w[idx], 0)

            def small_gather(fast):
                sub = jax.vmap(one)(mats[idx], sub_vw)
                cur = fast[idx]
                sub = jnp.where(slow[idx][:, None, None, None], sub, cur)
                return fast.at[idx].set(sub)

            def some_slow(fast):
                return jax.lax.cond(n_slow <= slow_k, small_gather,
                                    full_gather, fast)

            # fully-eligible pages (the common case on docs/scans) skip
            # the gather leg entirely — without this tier the slow_k
            # sub-gather alone cost small pages +20 ms (sweep r5k)
            vals = jax.lax.cond(n_slow == 0, lambda f: f, some_slow, fast)

    vals = jnp.clip(vals, 0.0, 255.0)
    norm = (vals / 255.0 - 0.5) / 0.5
    mask = (gx[None] < valid_w[:, None, None])[..., None]
    return jnp.where(mask, norm, 0.0)


@functools.partial(jax.jit, static_argnames=("out_h", "out_w", "interp"))
def warp_crops_multi(images_u8: jax.Array, img_idx: jax.Array,
                     mats: jax.Array, valid_w: jax.Array,
                     out_h: int, out_w: int,
                     interp: str = "bicubic") -> jax.Array:
    """Multi-source variant of warp_crops: N crops gather from a BATCH of
    source images (cross-request rec batching — crops from concurrent pages
    fuse into one device call).

    Args:
      images_u8: (B, H, W, 3) uint8 sources sharing one padded bucket.
      img_idx: (N,) int32 source row per crop.
      mats / valid_w / out_*: as in warp_crops.
    Returns (N, out_h, out_w, 3) float32 normalized crops.
    """
    B, H, W = images_u8.shape[:3]
    flat = images_u8.reshape(-1, 3)  # uint8; taps convert post-gather

    xs = jnp.arange(out_w, dtype=jnp.float32)
    ys = jnp.arange(out_h, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(xs, ys)

    def one(mat, vw, base):
        u = mat[0, 0] * gx + mat[0, 1] * gy + mat[0, 2]
        v = mat[1, 0] * gx + mat[1, 1] * gy + mat[1, 2]
        w = mat[2, 0] * gx + mat[2, 1] * gy + mat[2, 2]
        inv_w = 1.0 / w
        sx = jnp.clip(u * inv_w, 0.0, W - 1.0)
        sy = jnp.clip(v * inv_w, 0.0, H - 1.0)
        # dead-lane pinning — see warp_crops.one
        live = gx < vw
        sx = jnp.where(live, sx, 0.0)
        sy = jnp.where(live, sy, 0.0)
        if interp == "bicubic":
            vals = _sample_bicubic_off(flat, H, W, sx, sy, base)
        else:
            vals = _sample_bilinear_off(flat, H, W, sx, sy, base)
        vals = jnp.clip(vals, 0.0, 255.0)
        norm = (vals / 255.0 - 0.5) / 0.5
        mask = (gx < vw)[..., None]
        return jnp.where(mask, norm, 0.0)

    base = img_idx.astype(jnp.int32) * (H * W)
    return jax.vmap(one)(mats, valid_w, base)


def _sample_bilinear_off(flat, H, W, sx, sy, base):
    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    fx = sx - x0
    fy = sy - y0
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)

    def tap(yy, xx):
        yy = jnp.clip(yy, 0, H - 1)
        xx = jnp.clip(xx, 0, W - 1)
        return jnp.take(flat, base + yy * W + xx, axis=0)

    fx = fx[..., None]
    fy = fy[..., None]
    top = tap(y0, x0) * (1 - fx) + tap(y0, x0 + 1) * fx
    bot = tap(y0 + 1, x0) * (1 - fx) + tap(y0 + 1, x0 + 1) * fx
    return top * (1 - fy) + bot * fy


def _sample_bicubic_off(flat, H, W, sx, sy, base):
    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    fx = sx - x0
    fy = sy - y0
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)
    wx = _cubic_weights(fx)
    wy = _cubic_weights(fy)

    def tap(yy, xx):
        yy = jnp.clip(yy, 0, H - 1)
        xx = jnp.clip(xx, 0, W - 1)
        return jnp.take(flat, base + yy * W + xx, axis=0)

    out = 0.0
    for j in range(4):
        row = 0.0
        for i in range(4):
            row = row + tap(y0 + j - 1, x0 + i - 1) * wx[i][..., None]
        out = out + row * wy[j][..., None]
    return out


def warp_crops_host(image: np.ndarray, mats: np.ndarray, valid_w: np.ndarray,
                    out_h: int, out_w: int) -> np.ndarray:
    """cv2-based host fallback with identical output contract (used for
    parity tests and when tpu_crop_backend='host')."""
    import cv2
    n = len(mats)
    out = np.zeros((n, out_h, out_w, 3), dtype=np.float32)
    for i in range(n):
        # cv2.warpPerspective wants src→dest; invert our dest→src matrix.
        M = np.linalg.inv(mats[i].astype(np.float64))
        vw = int(valid_w[i])
        crop = cv2.warpPerspective(
            image, M, (out_w, out_h),
            borderMode=cv2.BORDER_REPLICATE, flags=cv2.INTER_CUBIC)
        norm = (crop.astype(np.float32) / 255.0 - 0.5) / 0.5
        norm[:, vw:] = 0.0
        out[i] = norm
    return out
