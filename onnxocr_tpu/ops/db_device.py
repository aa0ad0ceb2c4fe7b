"""Device-side DB box extraction: connected components → oriented quads →
scores, entirely inside one XLA program.

The reference's box extraction is irregular host work — binarize, OpenCV
contours, minAreaRect, pyclipper offset (onnxocr/db_postprocess.py:104-157)
— which forces the full prob map across the device→host boundary every
image. This module keeps the map in HBM and downloads only K candidate
boxes (~10 KB instead of ~1 MB at 960²):

1. binarize the valid region of the prob map;
2. label connected components (8-connectivity) with segmented max-scans
   along rows/columns (one scan floods a whole run in a single pass) plus
   a 3×3-dilation `while_loop` to convergence for snake-shaped remainders;
3. pick ≤K component representatives with `top_k`;
4. per-component moments via one scatter-add pass → PCA axes; a second
   scatter pass takes min/max projections onto those axes → the exact
   oriented bounding rectangle along the principal axes (for text-line
   blobs this coincides with minAreaRect);
5. score = mean prob over the component (the box_score_slow notion);
   unclip by the DB formula d = A·r / P applied to the rect dims;
6. download (quads, scores, valid) — the host only rescales/clips/orders.

This is the opt-in fast path (`tpu_det_postprocess='device'`): box
geometry matches the host path to ~1px on text-shaped components but is
not bit-identical (PCA-rect vs rotating-calipers, component-mean vs
quad-mask score), so the default stays on the host contract.
"""
from __future__ import annotations

import functools
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def _seg_scan(values, resets, axis, reverse=False):
    """Segmented running-max: max of `values` since the last True in
    `resets` along `axis`. Classic conditional-reset scan, associative."""

    def combine(a, b):
        av, af = a
        bv, bf = b
        return jnp.where(bf, bv, jnp.maximum(av, bv)), af | bf

    out, _ = lax.associative_scan(combine, (values, resets), axis=axis,
                                  reverse=reverse)
    return out


def _flood_scans(lab, mask, n_sweeps: int = 3):
    """Propagate labels along rows and columns (both directions) — one
    sweep floods every straight run; a few sweeps handle corners."""
    gaps = ~mask
    for _ in range(n_sweeps):
        lab = _seg_scan(lab, gaps, axis=1) * mask
        lab = _seg_scan(lab, gaps, axis=1, reverse=True) * mask
        lab = _seg_scan(lab, gaps, axis=0) * mask
        lab = _seg_scan(lab, gaps, axis=0, reverse=True) * mask
    return lab


def _dilate_converge(lab, mask, max_iters: int = 256):
    """3×3 max propagation until fixpoint (8-connectivity closure for
    shapes the axis scans can't finish, e.g. spirals)."""

    def pool(x):
        return lax.reduce_window(x, jnp.int32(0), lax.max, (3, 3), (1, 1),
                                 "SAME")

    def cond(state):
        _, changed, it = state
        return changed & (it < max_iters)

    def body(state):
        lab, _, it = state
        nxt = pool(lab) * mask
        return nxt, jnp.any(nxt != lab), it + 1

    lab, _, _ = lax.while_loop(cond, body, (lab, jnp.bool_(True),
                                            jnp.int32(0)))
    return lab


@functools.partial(jax.jit,
                   static_argnames=("max_k", "thresh", "box_thresh",
                                    "unclip_ratio", "min_size"))
def device_boxes(prob: jax.Array, resize_h, resize_w, max_k: int = 256,
                 thresh: float = 0.3, box_thresh: float = 0.6,
                 unclip_ratio: float = 1.5, min_size: float = 3.0
                 ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """prob: (H, W) float32 map (padded); valid region resize_h × resize_w.

    Returns (quads (max_k, 4, 2) float32 in map coords, scores (max_k,),
    valid (max_k,) bool). Quads are unclipped (DB d = A·r/P) PCA-oriented
    rectangles, corner order [tl, tr, br, bl] by the DB convention.
    """
    H, W = prob.shape
    ys, xs = jnp.mgrid[0:H, 0:W]
    in_valid = (ys < resize_h) & (xs < resize_w)
    mask = (prob > thresh) & in_valid

    seed = jnp.where(mask, (ys * W + xs + 1).astype(jnp.int32), 0)
    lab = _flood_scans(seed, mask)
    lab = _dilate_converge(lab, mask)
    # representative pixel: the one whose own seed survived
    reps = mask & (lab == seed)
    ids = lax.top_k(jnp.where(reps, lab, 0).reshape(-1), max_k)[0]
    present = ids > 0

    # map every pixel's label to a slot in ids (descending order)
    ids_asc = ids[::-1]
    flat_lab = lab.reshape(-1)
    pos = jnp.searchsorted(ids_asc, flat_lab)
    pos = jnp.clip(pos, 0, max_k - 1)
    hit = (ids_asc[pos] == flat_lab) & (flat_lab > 0)
    slot = jnp.where(hit, (max_k - 1) - pos, max_k)  # back to desc index

    fx = xs.reshape(-1).astype(jnp.float32)
    fy = ys.reshape(-1).astype(jnp.float32)
    fp = prob.reshape(-1).astype(jnp.float32)
    stats = jnp.stack([jnp.ones_like(fx), fx, fy, fx * fx, fy * fy,
                       fx * fy, fp], axis=-1)
    acc = jnp.zeros((max_k + 1, stats.shape[-1]), jnp.float32)
    acc = acc.at[slot].add(jnp.where(hit[:, None], stats, 0.0))
    acc = acc[:max_k]
    n = jnp.maximum(acc[:, 0], 1.0)
    mx, my = acc[:, 1] / n, acc[:, 2] / n
    cxx = acc[:, 3] / n - mx * mx
    cyy = acc[:, 4] / n - my * my
    cxy = acc[:, 5] / n - mx * my
    score = acc[:, 6] / n

    # principal axis of the 2x2 covariance (closed form)
    tr_half = (cxx + cyy) * 0.5
    det = cxx * cyy - cxy * cxy
    disc = jnp.sqrt(jnp.maximum(tr_half * tr_half - det, 0.0))
    l1 = tr_half + disc
    # eigvec for l1: (cxy, l1 - cxx); axis-aligned when cxy ~ 0
    small = jnp.abs(cxy) <= 1e-9
    ex = jnp.where(small, jnp.where(cxx >= cyy, 1.0, 0.0), cxy)
    ey = jnp.where(small, jnp.where(cxx >= cyy, 0.0, 1.0), l1 - cxx)
    norm = jnp.sqrt(ex * ex + ey * ey)
    ux, uy = ex / norm, ey / norm        # major axis
    vx, vy = -uy, ux                      # minor axis

    # second pass: min/max projections of each pixel onto its slot's axes
    pu = fx * ux[jnp.clip(slot, 0, max_k - 1)] + \
        fy * uy[jnp.clip(slot, 0, max_k - 1)]
    pv = fx * vx[jnp.clip(slot, 0, max_k - 1)] + \
        fy * vy[jnp.clip(slot, 0, max_k - 1)]
    big = jnp.float32(3.4e38)
    pu = jnp.where(hit, pu, big)
    pv = jnp.where(hit, pv, big)
    mins = jnp.full((max_k + 1, 2), big, jnp.float32)
    mins = mins.at[slot].min(jnp.stack([pu, pv], -1))[:max_k]
    pu = jnp.where(hit, jnp.where(pu < big, pu, -big), -big)
    pv = jnp.where(hit, jnp.where(pv < big, pv, -big), -big)
    maxs = jnp.full((max_k + 1, 2), -big, jnp.float32)
    maxs = maxs.at[slot].max(jnp.stack([pu, pv], -1))[:max_k]

    w_rect = maxs[:, 0] - mins[:, 0]
    h_rect = maxs[:, 1] - mins[:, 1]
    sside = jnp.minimum(w_rect, h_rect)
    area = jnp.maximum(w_rect * h_rect, 1e-6)
    perim = jnp.maximum(2.0 * (w_rect + h_rect), 1e-6)
    d = area * unclip_ratio / perim
    w2 = w_rect * 0.5 + d
    h2 = h_rect * 0.5 + d

    cu = (mins[:, 0] + maxs[:, 0]) * 0.5
    cv = (mins[:, 1] + maxs[:, 1]) * 0.5
    cx = cu * ux + cv * vx
    cy = cu * uy + cv * vy
    du = jnp.stack([ux, uy], -1) * w2[:, None]
    dv = jnp.stack([vx, vy], -1) * h2[:, None]
    c = jnp.stack([cx, cy], -1)
    quads = jnp.stack([c - du - dv, c + du - dv, c + du + dv, c - du + dv],
                      axis=1)

    post_sside = jnp.minimum(w_rect + 2 * d, h_rect + 2 * d)
    valid = present & (score >= box_thresh) & (sside >= min_size) & \
        (post_sside >= min_size + 2)
    return quads, score, valid
