"""Label-keyed band-sparse DB-extraction reductions (v2).

v1 (seg_reduce.py) consumes a per-pixel SLOT map whose construction is
itself hot XLA work: an N-sized scatter+gather (db_slot_assign, ~13.7 ms
at 960²) plus materialized (N, 7) stats and (N, 4) projection columns in
HBM. These kernels key the one-hot directly on the LABEL map instead:

  m = (lab_band == ids_tile)        ids = kept rep seeds, raster-ordered

and build everything else IN KERNEL:
  * cell coordinates fx, fy from the band's flat offset + iota (the
    extraction grid is raster-flattened, so flat = y*W + x);
  * moment stats [1, fx, fy, fx², fy², fxfy, p] on the fly — the only
    HBM inputs are the label map and the prob map (2 channels, not 8);
  * projections pu = fx·ux[k] + fy·uy[k] as a (KT,1)×(1,BAND) outer
    product against the per-tile axes — no per-pixel axis gather.

Band skipping: ids are ascending raster seeds, and a band's labels are
bounded by its per-band [lo, hi] label range (cheap XLA reduce), so a
(tile, band) block is skipped when [ids[k0], ids[k0+KT-1]] does not
intersect it — same sparsity argument as v1, keyed on seeds instead of
ranks.

Sums ride the MXU (HIGHEST precision, exact 0/1 mask); mins are masked
VPU mins. Outputs accumulate across bands in the revisited output block.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BAND = 8192
KT = 128
BIG = 3.4e38


def _coords(b_ref, W: int, sy: int, sx: int):
    """Full-map-coordinate fx, fy of this band's cells, (1, BAND) f32.
    b_ref: SMEM scalar holding the band index."""
    flat0 = b_ref * BAND
    flat = flat0 + jax.lax.broadcasted_iota(jnp.int32, (1, BAND), 1)
    gy = flat // W
    gx = flat - gy * W
    fx = gx.astype(jnp.float32) * sx + (sx - 1) * 0.5
    fy = gy.astype(jnp.float32) * sy + (sy - 1) * 0.5
    return fx, fy


def _band_label_ranges(lab2d):
    """Per-band [lo, hi] over POSITIVE labels (0 = background)."""
    pos = lab2d > 0
    big = jnp.int32(2147483647)
    lo = jnp.min(jnp.where(pos, lab2d, big), axis=1)
    hi = jnp.max(jnp.where(pos, lab2d, 0), axis=1)
    return lo, hi


def _tile_ranges(ids, K: int):
    """Per-tile [lo, hi] over kept ids (maxint sentinel = empty)."""
    maxint = jnp.int32(2147483647)
    t = ids.reshape(K // KT, KT)
    real = t < maxint
    tlo = jnp.min(jnp.where(real, t, maxint), axis=1)
    thi = jnp.max(jnp.where(real, t, 0), axis=1)
    # empty tiles: lo=maxint > hi=0 → intersect test always false
    return tlo, thi


@functools.partial(jax.jit, static_argnames=("W", "sy", "sx", "interpret"))
def label_moment_sums(lab, prob, ids, W: int, sy: int = 1, sx: int = 1,
                      interpret: bool = False):
    """lab (H, Wg) int32 labels (0 = background), prob (H, Wg) f32,
    ids (K,) int32 ascending kept rep seeds (maxint = empty slot) →
    (K, 7) moment sums [n, Σx, Σy, Σx², Σy², Σxy, Σp] in FULL map
    coords (grid cell centers under (sy, sx) downsampling).

    Wg is the working-grid width; W must equal Wg (the in-kernel
    coordinate reconstruction assumes raster-flattened bands)."""
    K = ids.shape[0]
    n = lab.size
    pad = (-n) % BAND
    labf = lab.reshape(-1).astype(jnp.float32)
    probf = prob.reshape(-1).astype(jnp.float32)
    if pad:
        labf = jnp.concatenate([labf, jnp.zeros((pad,), jnp.float32)])
        probf = jnp.concatenate([probf, jnp.zeros((pad,), jnp.float32)])
    nb = labf.shape[0] // BAND
    lab_b = labf.reshape(nb, 1, BAND)
    prob_b = probf.reshape(nb, 1, BAND)
    blo, bhi = _band_label_ranges(
        labf.reshape(nb, BAND).astype(jnp.int32))
    tlo, thi = _tile_ranges(ids, K)
    ids_row = ids.reshape(1, K)  # lane-major for (1, KT) column slices

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(K // KT, nb),
        in_specs=[
            pl.BlockSpec((None, 1, BAND),
                         lambda k, b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 1, BAND),
                         lambda k, b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K), lambda k, b, *_: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((KT, 8), lambda k, b, *_: (k, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(_sum_kernel_wrap, W=W, sy=sy, sx=sx),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((K, 8), jnp.float32),
        interpret=interpret,
    )(tlo, thi, blo, bhi, lab_b, prob_b, ids_row)
    return out[:, :7]


def _sum_kernel_wrap(tlo_ref, thi_ref, blo_ref, bhi_ref, lab_ref,
                     prob_ref, ids_ref, out_ref, *, W, sy, sx):
    k = pl.program_id(0)
    b = pl.program_id(1)

    @pl.when(b == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    inter = (thi_ref[k] >= blo_ref[b]) & (tlo_ref[k] <= bhi_ref[b])

    @pl.when(inter)
    def _body():
        lab = lab_ref[0:1, :]                             # (1, BAND)
        ids = ids_ref[0:1, pl.ds(pl.multiple_of(k * KT, KT), KT)]
        idc = ids.reshape(KT, 1).astype(jnp.float32)         # (KT, 1)
        m = (lab == idc).astype(jnp.float32)                 # (KT, BAND)
        fx, fy = _coords(b, W, sy, sx)
        p = prob_ref[0:1, :]
        one = jnp.ones_like(fx)
        stats = jnp.concatenate(
            [one, fx, fy, fx * fx, fy * fy, fx * fy, p, one], axis=0)
        part = jax.lax.dot_general(
            m, stats, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        out_ref[:] = out_ref[:] + part


def _min_kernel_wrap(tlo_ref, thi_ref, blo_ref, bhi_ref, lab_ref,
                     axes_ref, ids_ref, out_ref, *, W, sy, sx):
    k = pl.program_id(0)
    b = pl.program_id(1)

    @pl.when(b == 0)
    def _init():
        out_ref[:] = jnp.full_like(out_ref, BIG)

    inter = (thi_ref[k] >= blo_ref[b]) & (tlo_ref[k] <= bhi_ref[b])

    @pl.when(inter)
    def _body():
        lab = lab_ref[0:1, :]                             # (1, BAND)
        ids = ids_ref[0:1, pl.ds(pl.multiple_of(k * KT, KT), KT)]
        idc = ids.reshape(KT, 1).astype(jnp.float32)
        m = lab == idc                                       # (KT, BAND)
        fx, fy = _coords(b, W, sy, sx)
        ux = axes_ref[pl.ds(pl.multiple_of(k * KT, KT), KT), 0:1]
        uy = axes_ref[pl.ds(pl.multiple_of(k * KT, KT), KT), 1:2]
        pu = ux * fx + uy * fy                               # (KT, BAND)
        pv = ux * fy - uy * fx                               # v = (-uy, ux)
        out_ref[:, 0:1] = jnp.minimum(
            out_ref[:, 0:1], jnp.min(jnp.where(m, pu, BIG), axis=1,
                                     keepdims=True))
        out_ref[:, 1:2] = jnp.minimum(
            out_ref[:, 1:2], jnp.min(jnp.where(m, pv, BIG), axis=1,
                                     keepdims=True))
        out_ref[:, 2:3] = jnp.minimum(
            out_ref[:, 2:3], jnp.min(jnp.where(m, -pu, BIG), axis=1,
                                     keepdims=True))
        out_ref[:, 3:4] = jnp.minimum(
            out_ref[:, 3:4], jnp.min(jnp.where(m, -pv, BIG), axis=1,
                                     keepdims=True))


@functools.partial(jax.jit, static_argnames=("W", "sy", "sx", "interpret"))
def label_proj_extents(lab, axes, ids, W: int, sy: int = 1, sx: int = 1,
                       interpret: bool = False):
    """lab (H, Wg) int32, axes (K, 2) per-slot major axis [ux, uy],
    ids (K,) ascending kept rep seeds → (K, 4) mins of
    [pu, pv, -pu, -pv] over each component (BIG for empty slots), with
    pu = fx·ux + fy·uy, pv = -fx·uy + fy·ux in full map coords."""
    K = ids.shape[0]
    n = lab.size
    pad = (-n) % BAND
    labf = lab.reshape(-1).astype(jnp.float32)
    if pad:
        labf = jnp.concatenate([labf, jnp.zeros((pad,), jnp.float32)])
    nb = labf.shape[0] // BAND
    lab_b = labf.reshape(nb, 1, BAND)
    blo, bhi = _band_label_ranges(
        labf.reshape(nb, BAND).astype(jnp.int32))
    tlo, thi = _tile_ranges(ids, K)
    ids_row = ids.reshape(1, K)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(K // KT, nb),
        in_specs=[
            pl.BlockSpec((None, 1, BAND),
                         lambda k, b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, 2), lambda k, b, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K), lambda k, b, *_: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((KT, 8), lambda k, b, *_: (k, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(_min_kernel_wrap, W=W, sy=sy, sx=sx),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((K, 8), jnp.float32),
        interpret=interpret,
    )(tlo, thi, blo, bhi, lab_b, axes, ids_row)
    return out[:, :4]
