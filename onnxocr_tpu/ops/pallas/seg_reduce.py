"""Band-sparse segmented reductions for device DB extraction.

The extraction's two hot reductions fold every grid cell's stats into its
component slot: (K, 7) moment sums and (K, 4) projection mins
(ops/db_device._device_boxes_impl). The generic XLA lowerings are
O(N·K) VPU work — every cell is compared against all K slots
(`_seg_sum_scan`/`_seg_min_scan`, ~40 of the onecall program's 146 device
ms at 960², VERDICT r4) — because XLA cannot know that slots are
raster-local.

These kernels can. Slots are raster-ranked (rank = component rep's
raster order, db_device.py), so the cells of one horizontal band of the
map only ever reference a narrow contiguous range of slots. The host
wrapper computes each band's [lo, hi] slot range with a cheap O(N)
reduce; the kernel runs on a (K/128 slot-tile × band) grid and SKIPS
every block whose slot tile does not intersect the band's range — on a
real page that leaves ~1-2 active slot tiles per band instead of K/128.

Within an active block the one-hot membership mask m (128, BAND) is
built once; sums ride the MXU (dot_general at HIGHEST precision — exact
0/1 mask, f32 accumulation like the scan it replaces), mins are a
masked VPU min. Outputs accumulate across bands in the revisited output
block (bands are the minor, consecutive grid dimension).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BAND = 8192      # cells per band (~17 rows of a 480-wide working grid)
KT = 128         # slots per tile (one lane register)
BIG = 3.4e38


def _kernel(lo_ref, hi_ref, data_ref, out_ref, *, op: str, nc: int):
    k = pl.program_id(0)
    b = pl.program_id(1)
    k0 = k * KT

    @pl.when(b == 0)
    def _init():
        out_ref[:] = jnp.full_like(out_ref, BIG if op == "min" else 0.0)

    inter = (hi_ref[b] >= k0) & (lo_ref[b] < k0 + KT)

    @pl.when(inter)
    def _body():
        sl = data_ref[0:1, :]                               # (1, BAND)
        ks = (k0 + jax.lax.broadcasted_iota(
            jnp.int32, (KT, 1), 0)).astype(jnp.float32)      # (KT, 1)
        m = sl == ks                                         # (KT, BAND)
        if op == "sum":
            mf = m.astype(jnp.float32)
            # (KT, BAND) · (8, BAND)^T → (KT, 8) on the MXU; HIGHEST keeps
            # f32 accumulation exact-equivalent to the scan it replaces
            part = jax.lax.dot_general(
                mf, data_ref[:, :], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)         # (KT, 8)
            out_ref[:] = out_ref[:] + part
        else:
            for c in range(1, nc + 1):
                vc = data_ref[c:c + 1, :]                    # (1, BAND)
                part = jnp.min(jnp.where(m, vc, BIG), axis=1,
                               keepdims=True)                # (KT, 1)
                out_ref[:, c:c + 1] = jnp.minimum(out_ref[:, c:c + 1],
                                                  part)


@functools.partial(jax.jit, static_argnames=("K", "op", "nc", "interpret"))
def _run(data, lo, hi, K: int, op: str, nc: int, interpret: bool = False):
    nb = data.shape[0]
    kernel = functools.partial(_kernel, op=op, nc=nc)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(K // KT, nb),
        in_specs=[
            pl.BlockSpec((None, 8, BAND), lambda k, b, lo, hi: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((KT, 8), lambda k, b, lo, hi: (k, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((K, 8), jnp.float32),
        interpret=interpret,
    )(lo, hi, data)


def _prep(slot, vals, K: int):
    """slot (N,) int32 (K = no-op), vals (N, C≤7) f32 →
    (data (nb, 8, BAND), lo (nb,), hi (nb,)). Channel 0 carries the slot
    as f32 (exact for K ≤ 2^24); padding cells get slot=K."""
    n, C = vals.shape
    pad = (-n) % BAND
    if pad:
        slot = jnp.concatenate([slot, jnp.full((pad,), K, jnp.int32)])
        vals = jnp.concatenate([vals, jnp.zeros((pad, C), vals.dtype)])
    nb = (n + pad) // BAND
    rows = [slot.astype(jnp.float32)[None, :], vals.T.astype(jnp.float32)]
    if C < 7:
        rows.append(jnp.zeros((7 - C, n + pad), jnp.float32))
    data = jnp.concatenate(rows, axis=0)                     # (8, Npad)
    data = data.reshape(8, nb, BAND).transpose(1, 0, 2)      # (nb, 8, BAND)
    slot2d = slot.reshape(nb, BAND)
    m = slot2d < K
    lo = jnp.min(jnp.where(m, slot2d, K), axis=1)
    hi = jnp.max(jnp.where(m, slot2d, -1), axis=1)
    return data, lo, hi


def seg_sum_bands(slot, vals, K: int, interpret: bool = False):
    """Band-sparse segment-sum: (N,) slots × (N, C) vals → (K, C) f32.
    Drop-in for db_device._seg_sum_scan."""
    C = vals.shape[1]
    data, lo, hi = _prep(slot, vals, K)
    out = _run(data, lo, hi, K, "sum", C, interpret)
    return out[:, 1:C + 1]                                   # (K, C)


def seg_min_bands(slot, vals, K: int, big: float = BIG,
                  interpret: bool = False):
    """Band-sparse segment-min: (N,) slots × (N, C) vals → (K, C) f32.
    Cells whose value column was pre-masked to `big` never win (matches
    _seg_min_scan semantics); empty slots return `big`. `big` must be a
    STATIC Python float — under jit every jnp constant is a tracer
    (JAX 0.9), so the sentinel swap resolves at trace time."""
    C = vals.shape[1]
    big = float(big)
    data, lo, hi = _prep(slot, vals, K)
    out = _run(data, lo, hi, K, "min", C, interpret)
    res = out[:, 1:C + 1]
    if big != BIG:
        res = jnp.where(res >= BIG, big, res)
    return res
