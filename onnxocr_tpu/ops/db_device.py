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
3. pick ≤K component representatives by raster rank (exclusive cumsum);
4. per-component moments via one scatter-add pass → PCA axes; a second
   scatter pass takes min/max projections onto those axes → the exact
   oriented bounding rectangle along the principal axes (for text-line
   blobs this coincides with minAreaRect);
5. score = mean prob over the component (the box_score_slow notion);
   unclip by the DB formula d = A·r / P applied to the rect dims;
6. download (quads, scores, valid) — the host only rescales/clips/orders.

This is the opt-in fast path (`tpu_det_postprocess='device'`): box
geometry matches the host path to ~1-2px on text-shaped components and
scoring follows the same even-odd quad-mask convention, but it is not
bit-identical to the reference contract: (a) the rect is PCA-oriented
rather than rotating-calipers min-area (coincident for elongated text),
(b) the unit is the connected COMPONENT — the reference emits one
candidate per contour, so regions with holes yield extra (nested)
reference boxes, and (c) when candidates exceed max_k the kept subset is
the raster-first components rather than the first max_candidates contour
records. The default path keeps the exact host contract.
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


def _seg_sum_scan(slot, vals, K: int, chunk: int = 8192):
    """Segment-sum vals (n, C) by slot into (K, C) via a chunked
    masked-select + VPU f32 reduce instead of a scatter-add: the TPU
    lowers scatter serially while the (chunk, K) compare + sum is dense
    vector work. Rows with slot >= K contribute nothing."""
    n, C = vals.shape
    pad = (-n) % chunk
    if pad:
        slot = jnp.concatenate([slot, jnp.full((pad,), K, jnp.int32)])
        vals = jnp.concatenate([vals, jnp.zeros((pad, C), vals.dtype)])
    nch = (n + pad) // chunk
    ks = jnp.arange(K, dtype=jnp.int32)

    def body(acc, inp):
        sl, st = inp
        m = sl[:, None] == ks[None, :]                  # (chunk, K)
        part = jnp.sum(jnp.where(m[:, :, None], st[:, None, :], 0.0),
                       axis=0)                           # (K, C)
        return acc + part, None

    out, _ = lax.scan(body, jnp.zeros((K, C), vals.dtype),
                      (slot.reshape(nch, chunk),
                       vals.reshape(nch, chunk, C)))
    return out


def _seg_sum_dot(slot, vals, K: int, chunk: int = 16384):
    """Segment-sum via chunked one-hot matmul on the MXU. The one-hot
    mask is exactly 0/1 and HIGHEST precision keeps f32 accumulation, so
    this is numerically equivalent to _seg_sum_scan up to f32 addition
    order — but the compare+select+reduce moves from the VPU (O(N·K)
    vector ops) to the MXU (the round-4 einsum attempt was rejected on
    DEFAULT-precision bf16 products; HIGHEST removes that)."""
    n, C = vals.shape
    pad = (-n) % chunk
    if pad:
        slot = jnp.concatenate([slot, jnp.full((pad,), K, jnp.int32)])
        vals = jnp.concatenate([vals, jnp.zeros((pad, C), vals.dtype)])
    nch = (n + pad) // chunk
    ks = jnp.arange(K, dtype=jnp.int32)

    def body(acc, inp):
        sl, st = inp
        m = (sl[:, None] == ks[None, :]).astype(jnp.float32)  # (chunk, K)
        part = lax.dot_general(m, st, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=lax.Precision.HIGHEST)  # (K, C)
        return acc + part, None

    out, _ = lax.scan(body, jnp.zeros((K, C), jnp.float32),
                      (slot.reshape(nch, chunk),
                       vals.reshape(nch, chunk, C)))
    return out


def _seg_min_scan(slot, vals, K: int, big, chunk: int = 8192):
    """Segment-min counterpart of _seg_sum_scan. Rows with slot >= K (or
    pre-masked to `big`) never win."""
    n, C = vals.shape
    pad = (-n) % chunk
    if pad:
        slot = jnp.concatenate([slot, jnp.full((pad,), K, jnp.int32)])
        vals = jnp.concatenate([vals, jnp.full((pad, C), big, vals.dtype)])
    nch = (n + pad) // chunk
    ks = jnp.arange(K, dtype=jnp.int32)

    def body(acc, inp):
        sl, cl = inp
        m = sl[:, None] == ks[None, :]
        part = jnp.min(jnp.where(m[:, :, None], cl[:, None, :], big),
                       axis=0)
        return jnp.minimum(acc, part), None

    out, _ = lax.scan(body, jnp.full((K, C), big, vals.dtype),
                      (slot.reshape(nch, chunk),
                       vals.reshape(nch, chunk, C)))
    return out


def parse_extract_scale(val) -> Tuple[int, int]:
    """Config value → (sy, sx). Accepts int (isotropic) or 'SYxSX' string
    (e.g. '1x2' = x-only downsample, the line-separation-safe default)."""
    if isinstance(val, (tuple, list)):
        return int(val[0]), int(val[1])
    if isinstance(val, str) and "x" in val:
        a, _, b = val.partition("x")
        return int(a), int(b)
    s = int(val)
    return s, s


@functools.partial(jax.jit,
                   static_argnames=("max_k", "thresh", "box_thresh",
                                    "unclip_ratio", "min_size", "scale",
                                    "score_scale", "reduce", "score_k",
                                    "axis_snap"))
def device_boxes(prob: jax.Array, resize_h, resize_w, max_k: int = 256,
                 thresh: float = 0.3, box_thresh: float = 0.6,
                 unclip_ratio: float = 1.5, min_size: float = 3.0,
                 scale=1, score_scale=1, reduce="scatter", score_k: int = 0,
                 axis_snap: float = 0.0
                 ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """prob: (H, W) float32 map (padded); valid region resize_h × resize_w.

    Returns (quads (max_k, 4, 2) float32 in map coords, scores (max_k,),
    valid (max_k,) bool). Quads are unclipped (DB d = A·r/P) PCA-oriented
    rectangles, corner order [tl, tr, br, bl] by the DB convention.

    scale — int or (sy, sx) — runs labeling/moments/scoring on a
    downsampled grid: every stage here is pixel-bound (78 of the onecall
    program's 155 device ms at 960², tools/profile_onecall.py), so the
    cost drops ~sy·sx×. The mask uses a block MAX-pool (thin strokes
    survive) and scoring the block MEAN-pool; geometry (moments, PCA,
    extents, output quads) is computed in FULL map coordinates of the
    block centers, so boxes move only by the ±(s-1)/2 quantization.
    CAVEAT measured on synthetic line stacks: sy=2 MERGES text lines
    separated by <3 px (a 2 px gap can straddle two ds rows) — the
    anisotropic (1, 2) form keeps vertical separation exact and is the
    accuracy-safe speed setting; isotropic 2 is the aggressive one.
    """
    sy, sx = parse_extract_scale(scale)
    ssy, ssx = parse_extract_scale(score_scale)
    if sy > 1 or sx > 1:
        H0, W0 = prob.shape
        Hp, Wp = H0 // sy, W0 // sx
        blocks = prob[:Hp * sy, :Wp * sx].reshape(Hp, sy, Wp, sx)
        prob_mask = blocks.max(axis=(1, 3))
        prob_score = blocks.mean(axis=(1, 3))
        rh = -(-resize_h // sy)
        rw = -(-resize_w // sx)
        return _device_boxes_impl(prob_mask, prob_score, rh, rw, max_k,
                                  thresh, box_thresh, unclip_ratio,
                                  min_size, sy, sx, ssy, ssx, reduce,
                                  score_k, axis_snap)
    return _device_boxes_impl(prob, prob, resize_h, resize_w, max_k,
                              thresh, box_thresh, unclip_ratio, min_size,
                              1, 1, ssy, ssx, reduce, score_k, axis_snap)


def _device_boxes_impl(prob, prob_score, resize_h, resize_w, max_k,
                       thresh, box_thresh, unclip_ratio, min_size, sy, sx,
                       ssy=1, ssx=1, reduce="scatter", score_k=0,
                       axis_snap=0.0
                       ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Core extraction on the (possibly downsampled) working grid.
    prob: map used for thresholding/labeling; prob_score: map used for
    box scoring. Geometry runs in FULL map coords of the grid-cell
    centers (x = sx·i + (sx-1)/2), so min_size and output quads need no
    rescaling."""
    H, W = prob.shape
    ys, xs = jnp.mgrid[0:H, 0:W]
    in_valid = (ys < resize_h) & (xs < resize_w)
    mask = (prob > thresh) & in_valid

    seed = jnp.where(mask, (ys * W + xs + 1).astype(jnp.int32), 0)
    lab = _flood_scans(seed, mask)
    lab = _dilate_converge(lab, mask)
    # representative pixel: the one whose own seed survived. When there
    # are more components than max_k, keep the SMALLEST ids — raster
    # order, like the reference's first-max_candidates contours
    # (db_postprocess.py:124). Seeds are raster indices, so the k
    # smallest rep ids are simply the first k reps in flat order: an
    # exclusive cumsum ranks them (O(n) scan) — measured ~8x cheaper
    # than lax.top_k over the full map on the v5e.
    reps2d = mask & (lab == seed)
    reps = reps2d.reshape(-1)
    seed_flat = seed.reshape(-1)
    maxint = jnp.int32(2147483647)
    # exclusive cumsum in raster order, restructured 2-D (row-local cumsum
    # + row-offset prefix): a flat (H·W,) scan lowers poorly on TPU
    # (measured 10.8 ms at 960²; this form is row-parallel)
    rcnt = jnp.sum(reps2d.astype(jnp.int32), axis=1)
    roff = jnp.cumsum(rcnt) - rcnt
    within = jnp.cumsum(reps2d.astype(jnp.int32), axis=1) - \
        reps2d.astype(jnp.int32)
    rank = (roff[:, None] + within).reshape(-1)
    tgt = jnp.where(reps & (rank < max_k), rank, max_k)
    ids = jnp.full((max_k + 1,), maxint, jnp.int32)
    # each kept rank is written by exactly one rep; .min keeps the
    # overflow slot (max_k) and never-written slots at maxint padding
    ids = ids.at[tgt].min(jnp.where(reps, seed_flat, maxint))[:max_k]
    present = ids < maxint

    if reduce in ("pallas", "pallas2") and \
            jax.default_backend() != "tpu":
        # the band-sparse kernels are TPU Mosaic programs; tests and CPU
        # runs take the equivalent scan lowering
        reduce = "scan"

    if reduce == "pallas2":
        # label-keyed kernels (ops/pallas/seg_reduce2): the one-hot keys
        # on lab == ids[k] directly, so the slot map (an N-sized
        # scatter+gather), the (N, 7) stats materialization, and the
        # per-pixel axis gathers below are all skipped — coordinates and
        # projections are built in-kernel from the raster index.
        from .pallas import seg_reduce2
        slot = None
        hit = None
        acc = seg_reduce2.label_moment_sums(lab, prob, ids, W=W,
                                            sy=sy, sx=sx)
    else:
        # map every pixel's label to its slot through a seed-indexed slot
        # map: every rep scatters its raster rank at its own seed index,
        # and each pixel gathers slot_map[label] (a component's label IS
        # its rep's seed). Exactly equivalent to ranking by
        # #(kept ids < label) but O(N) scatter+gather instead of the
        # O(N·max_k) broadcast compare it replaces (the compare was ~11
        # of the 78 extraction ms at 960², tools/profile_onecall.py
        # db_rank_ids).
        flat_lab = lab.reshape(-1)
        n_cells = flat_lab.shape[0]
        # non-reps write their (unread) rank to a dump slot; index
        # n_cells+1 is never gathered because labels are seeds
        # (1..n_cells) or 0
        slot_map = jnp.full((n_cells + 2,), jnp.int32(max_k))
        slot_map = slot_map.at[
            jnp.where(reps, seed_flat, n_cells + 1)
        ].set(jnp.minimum(rank, max_k).astype(jnp.int32))
        hit = flat_lab > 0
        slot = jnp.where(hit, slot_map[flat_lab], max_k)
        hit = hit & (slot < max_k)

        # FULL map coordinates of grid-cell centers: geometry below is
        # scale-free (cell (i, j) covers full px [sx·i, sx·i+sx-1] × ...)
        fx = xs.reshape(-1).astype(jnp.float32) * sx + (sx - 1) * 0.5
        fy = ys.reshape(-1).astype(jnp.float32) * sy + (sy - 1) * 0.5
        fp = prob.reshape(-1).astype(jnp.float32)
        stats = jnp.stack([jnp.ones_like(fx), fx, fy, fx * fx, fy * fy,
                           fx * fy, fp], axis=-1)
        stats = jnp.where(hit[:, None], stats, 0.0)
        if reduce == "pallas":
            from .pallas import seg_reduce
            acc = seg_reduce.seg_sum_bands(slot, stats, max_k)
        elif reduce == "dot":
            acc = _seg_sum_dot(slot, stats, max_k)
        elif reduce == "scan":
            acc = _seg_sum_scan(slot, stats, max_k)
        else:
            acc = jnp.zeros((max_k + 1, stats.shape[-1]), jnp.float32)
            acc = acc.at[slot].add(stats)[:max_k]
    n = jnp.maximum(acc[:, 0], 1.0)
    mx, my = acc[:, 1] / n, acc[:, 2] / n
    cxx = acc[:, 3] / n - mx * mx
    cyy = acc[:, 4] / n - my * my
    cxy = acc[:, 5] / n - mx * my

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
    if axis_snap > 0:
        # Snap near-axis-aligned PCA axes to exact (±1,0)/(0,±1): text
        # components' covariance carries ~1-2% tilt from ascender/
        # descender asymmetry even on perfectly upright lines; snapping
        # (a) removes that sampling skew from the crops and (b) makes
        # the quads exactly axis-separable so the staged MXU warp fast
        # path engages (ops/warp._staged_separable). tan(angle) <=
        # axis_snap; genuinely rotated text (photos) is unaffected.
        horiz = jnp.abs(uy) <= axis_snap * jnp.abs(ux)
        vert = (~horiz) & (jnp.abs(ux) <= axis_snap * jnp.abs(uy))
        sgn_x = jnp.where(ux >= 0, 1.0, -1.0)
        sgn_y = jnp.where(uy >= 0, 1.0, -1.0)
        ux = jnp.where(horiz, sgn_x, jnp.where(vert, 0.0, ux))
        uy = jnp.where(horiz, 0.0, jnp.where(vert, sgn_y, uy))
    vx, vy = -uy, ux                      # minor axis

    # second pass: min/max projections of each pixel onto its slot's axes.
    # max folds into the same scatter as min via negation — ONE scatter
    # pass over the map instead of two.
    big = jnp.float32(3.4e38)
    if reduce == "pallas2":
        from .pallas import seg_reduce2
        axes = jnp.stack([ux, uy], axis=-1)
        ext = seg_reduce2.label_proj_extents(lab, axes, ids, W=W,
                                             sy=sy, sx=sx)
    else:
        pu = fx * ux[jnp.clip(slot, 0, max_k - 1)] + \
            fy * uy[jnp.clip(slot, 0, max_k - 1)]
        pv = fx * vx[jnp.clip(slot, 0, max_k - 1)] + \
            fy * vy[jnp.clip(slot, 0, max_k - 1)]
        cols = jnp.stack([pu, pv, -pu, -pv], -1)
        cols = jnp.where(hit[:, None], cols, big)
        if reduce == "pallas":
            from .pallas import seg_reduce
            ext = seg_reduce.seg_min_bands(slot, cols, max_k, 3.4e38)
        elif reduce in ("scan", "dot"):
            ext = _seg_min_scan(slot, cols, max_k, big)
        else:
            ext = jnp.full((max_k + 1, 4), big, jnp.float32)
            ext = ext.at[slot].min(cols)[:max_k]
    mins = ext[:, :2]
    maxs = -ext[:, 2:]

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

    # exact box_score_fast on device: mean prob over the PRE-unclip rect's
    # even-odd raster mask, evaluated analytically per scanline against a
    # row-wise prob integral (convex quad → one interval per row).
    du0 = jnp.stack([ux, uy], -1) * (w_rect * 0.5)[:, None]
    dv0 = jnp.stack([vx, vy], -1) * (h_rect * 0.5)[:, None]
    pre_quads = jnp.stack(
        [c - du0 - dv0, c + du0 - dv0, c + du0 + dv0, c - du0 + dv0], axis=1)
    # the scorer rasterizes against the (downsampled) grid: full coords →
    # grid coords. score_scale (ssy, ssx) pools the SCORE grid further —
    # scoring is a masked mean, so (unlike the extraction mask, where
    # y-pooling merges close text lines) a coarser score grid cannot merge
    # components; it only quantizes each box's mean-prob estimate.
    if ssy > 1 or ssx > 1:
        Hs, Ws = H // ssy, W // ssx
        grid_prob = prob_score[:Hs * ssy, :Ws * ssx].reshape(
            Hs, ssy, Ws, ssx).mean(axis=(1, 3))
        ys2, xs2 = jnp.mgrid[0:Hs, 0:Ws]
        grid_valid = (ys2 < -(-resize_h // ssy)) & \
            (xs2 < -(-resize_w // ssx))
        tx, ty = sx * ssx, sy * ssy
        off = jnp.asarray([(tx - 1) * 0.5, (ty - 1) * 0.5], jnp.float32)
        sc = jnp.asarray([float(tx), float(ty)], jnp.float32)
    else:
        grid_prob, grid_valid = prob_score, in_valid
        off = jnp.asarray([(sx - 1) * 0.5, (sy - 1) * 0.5], jnp.float32)
        sc = jnp.asarray([float(sx), float(sy)], jnp.float32)
    q_grid = (pre_quads - off) / sc
    masked_sc = jnp.where(grid_valid, grid_prob, 0.0)
    csum = jnp.concatenate(
        [jnp.zeros((masked_sc.shape[0], 1), jnp.float32),
         jnp.cumsum(masked_sc.astype(jnp.float32), axis=1)], axis=1)

    post_sside = jnp.minimum(w_rect + 2 * d, h_rect + 2 * d)
    geo = present & (sside >= min_size) & (post_sside >= min_size + 2)
    if 0 < score_k < max_k:
        # Score only the candidates that survive the geometric filters:
        # the scorer's cost is linear in K ((K, H) interval lookups —
        # 24.6 ms standalone at K=1024/960², tools/profile_onecall.py
        # db_quad_score) while real pages have <100 survivors. Raster
        # order is preserved by the stable argsort, and exactness by the
        # lax.cond: if survivors overflow score_k, the full-K scorer
        # runs instead, so every geometric survivor is ALWAYS scored —
        # identical output to score_k=0 at any input.
        n_geo = jnp.sum(geo.astype(jnp.int32))
        order = jnp.argsort(jnp.where(geo, 0, 1), stable=True)
        take = order[:score_k]

        def _score_subset(q):
            sub = _quads_vs_csum(csum, q[take])
            return jnp.zeros((max_k,), jnp.float32).at[take].set(sub)

        score = lax.cond(n_geo > score_k,
                         lambda q: _quads_vs_csum(csum, q),
                         _score_subset, q_grid)
    else:
        score = _quads_vs_csum(csum, q_grid)
    valid = geo & (score >= box_thresh)
    return quads, score, valid


def _quad_mask_mean(prob, quads, in_valid):
    """Mean of prob inside each quad's even-odd raster mask, matching the
    host scorer's convention (ops/geometry.fill_poly_mask: pixel (x, y)
    is inside iff an odd number of edge crossings lie strictly right of
    x). quads: (K, 4, 2) float. Uses an exclusive row cumsum so each
    row's contribution is one interval lookup."""
    masked = jnp.where(in_valid, prob, 0.0)
    # exclusive cumsum along x: csum[y, i] = sum(prob[y, :i])
    csum = jnp.concatenate(
        [jnp.zeros((prob.shape[0], 1), jnp.float32),
         jnp.cumsum(masked.astype(jnp.float32), axis=1)], axis=1)
    return _quads_vs_csum(csum, quads)


def quad_mask_mean_multi(probs, rhw, quads, img_idx):
    """Multi-page scorer for cross-request batching: probs (B, H, W) with
    per-page valid extents rhw (B, 2); quads (K, 4, 2) each belonging to
    page img_idx (K,). Scores every quad against every page's csum
    ((B, K) intermediate — cheap) then selects its own page's value, so
    no (K, H, W) gather materializes."""
    B, H, W = probs.shape
    row = jnp.arange(H, dtype=jnp.int32)[None, :, None] < \
        rhw[:, 0][:, None, None]
    col = jnp.arange(W, dtype=jnp.int32)[None, None, :] < \
        rhw[:, 1][:, None, None]
    masked = jnp.where(row & col, probs, 0.0)
    csum = jnp.concatenate(
        [jnp.zeros((B, H, 1), jnp.float32),
         jnp.cumsum(masked.astype(jnp.float32), axis=2)], axis=2)
    per_page = jax.vmap(lambda c: _quads_vs_csum(c, quads))(csum)  # (B, K)
    return per_page[img_idx, jnp.arange(quads.shape[0])]


def _quads_vs_csum(csum, quads):
    """(H, W+1) exclusive row cumsum + (K, 4, 2) quads → (K,) masked
    means (shared core of _quad_mask_mean / quad_mask_mean_multi)."""
    H = csum.shape[0]
    W = csum.shape[1] - 1
    K = quads.shape[0]

    # host scorer shifts vertices by the int bbox corner and truncates to
    # int32; reproduce that quantization
    bx = jnp.clip(jnp.floor(jnp.min(quads[..., 0], axis=1)), 0, W - 1)
    by = jnp.clip(jnp.floor(jnp.min(quads[..., 1], axis=1)), 0, H - 1)
    qx = jnp.trunc(quads[..., 0] - bx[:, None]) + bx[:, None]
    qy = jnp.trunc(quads[..., 1] - by[:, None]) + by[:, None]

    ys = jnp.arange(H, dtype=jnp.float32)[None, :]         # (1, H)
    x_lo = jnp.full((K, H), jnp.float32(W))
    x_hi = jnp.full((K, H), jnp.float32(0))
    n_cross = jnp.zeros((K, H), jnp.int32)
    for i in range(4):
        j = (i + 3) % 4
        yi, yj = qy[:, i:i + 1], qy[:, j:j + 1]
        xi, xj = qx[:, i:i + 1], qx[:, j:j + 1]
        crosses = (yi > ys) != (yj > ys)
        t = (ys - yi) / jnp.where(yj == yi, 1.0, yj - yi)
        xint = xi + (xj - xi) * t
        x_lo = jnp.where(crosses, jnp.minimum(x_lo, xint), x_lo)
        x_hi = jnp.where(crosses, jnp.maximum(x_hi, xint), x_hi)
        n_cross = n_cross + crosses.astype(jnp.int32)
    has = n_cross >= 2
    # inside pixels: ceil(x_lo) <= px < ceil(x_hi)  (px < xint convention)
    lo = jnp.clip(jnp.ceil(x_lo), 0, W).astype(jnp.int32)
    hi = jnp.clip(jnp.ceil(x_hi), 0, W).astype(jnp.int32)
    lo = jnp.minimum(lo, hi)
    row_idx = jnp.broadcast_to(jnp.arange(H)[None, :], (K, H))
    seg_sum = csum[row_idx, hi] - csum[row_idx, lo]
    seg_cnt = (hi - lo).astype(jnp.float32)
    seg_sum = jnp.where(has, seg_sum, 0.0)
    seg_cnt = jnp.where(has, seg_cnt, 0.0)
    total = jnp.sum(seg_sum, axis=1)
    count = jnp.sum(seg_cnt, axis=1)
    return jnp.where(count > 0, total / jnp.maximum(count, 1.0), 0.0)


def unpack_boxes(packed: np.ndarray, resize_w: int, resize_h: int,
                 src_w: int, src_h: int) -> np.ndarray:
    """Host side of the device fast path: select valid rows of a
    (K, 10) packed array and rescale map coords → source coords with the
    reference round/clip contract (db_postprocess.py:141-147)."""
    rows = packed[packed[:, 9] > 0.5]
    quads = rows[:, :8].reshape(-1, 4, 2).astype(np.float64)
    quads[..., 0] = np.clip(np.round(quads[..., 0] / resize_w * src_w),
                            0, src_w)
    quads[..., 1] = np.clip(np.round(quads[..., 1] / resize_h * src_h),
                            0, src_h)
    return quads.astype(np.int32)
