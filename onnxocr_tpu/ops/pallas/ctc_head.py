"""Fused CTC head: (M, D) @ (D, V) → per-row argmax + softmax max-prob,
as a Pallas TPU kernel with online reduction over vocab tiles.

Why: the recognizer head projects to the dictionary (V = 18385 for the v5
dict). Materializing the (N*T, V) logits in HBM costs ~47 MB per batch and
a full write+read of HBM bandwidth, only to be reduced to 2 scalars per row
(ops/ctc.ctc_reduce_logits). This kernel keeps each logits tile in VMEM and
maintains running (max, argmax, sum-exp) across vocab tiles — the MXU does
the matmul, the VPU the online-softmax bookkeeping, and HBM only ever sees
M rows of output.

Grid: (M/BM, V/BV), vocab minor (sequential on TPU) so scratch accumulates
across the vocab sweep and flushes at the last tile.
"""
from __future__ import annotations

import functools
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BM = 256   # rows per tile
BV = 2048  # vocab columns per tile


def _kernel(x_ref, w_ref, b_ref, idx_ref, prob_ref,
            max_sc, arg_sc, sum_sc):
    vi = pl.program_id(1)
    n_v = pl.num_programs(1)

    logits = jnp.dot(x_ref[:], w_ref[:],
                     preferred_element_type=jnp.float32) + b_ref[:]

    tile_max = jnp.max(logits, axis=1, keepdims=True)          # (BM, 1)
    tile_arg = jnp.argmax(logits, axis=1).astype(jnp.int32)    # (BM,)
    tile_arg = (tile_arg + vi * BV).reshape(-1, 1)

    @pl.when(vi == 0)
    def _init():
        max_sc[:] = tile_max
        arg_sc[:] = tile_arg
        sum_sc[:] = jnp.sum(jnp.exp(logits - tile_max), axis=1,
                            keepdims=True)

    @pl.when(vi > 0)
    def _update():
        old_max = max_sc[:]
        new_max = jnp.maximum(old_max, tile_max)
        # rescale the running sum to the new max, add this tile's mass
        sum_sc[:] = sum_sc[:] * jnp.exp(old_max - new_max) + \
            jnp.sum(jnp.exp(logits - new_max), axis=1, keepdims=True)
        arg_sc[:] = jnp.where(tile_max > old_max, tile_arg, arg_sc[:])
        max_sc[:] = new_max

    @pl.when(vi == n_v - 1)
    def _flush():
        idx_ref[:] = arg_sc[:]
        # softmax max-prob = exp(max - logsumexp) = 1 / sum(exp(l - max))
        prob_ref[:] = 1.0 / sum_sc[:]


@functools.partial(jax.jit, static_argnames=("interpret",))
def ctc_head_reduce(x: jax.Array, w: jax.Array, b: jax.Array,
                    interpret: bool = False
                    ) -> Tuple[jax.Array, jax.Array]:
    """x: (M, D); w: (D, V); b: (V,) → ((M,) argmax int32, (M,) max-prob).

    M is padded to BM and V to BV internally (pad columns get bias -1e30 so
    they never win the argmax and add nothing to the softmax mass).
    """
    M, D = x.shape
    V = w.shape[1]
    Mp = ((M + BM - 1) // BM) * BM
    Vp = ((V + BV - 1) // BV) * BV
    if Mp != M:
        x = jnp.pad(x, ((0, Mp - M), (0, 0)))
    if Vp != V:
        w = jnp.pad(w, ((0, 0), (0, Vp - V)))
        b = jnp.pad(b, (0, Vp - V), constant_values=-1e30)
    x = x.astype(jnp.float32)
    w = w.astype(jnp.float32)
    b = b.astype(jnp.float32).reshape(1, Vp)

    grid = (Mp // BM, Vp // BV)
    idx, prob = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((BM, D), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, BV), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BV), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((BM, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BM, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Mp, 1), jnp.int32),
            jax.ShapeDtypeStruct((Mp, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((BM, 1), jnp.float32),
            pltpu.VMEM((BM, 1), jnp.int32),
            pltpu.VMEM((BM, 1), jnp.float32),
        ],
        interpret=interpret,
    )(x, w, b)
    return idx[:M, 0], prob[:M, 0]


def ctc_head_reduce_batched(feats: jax.Array, w: jax.Array, b: jax.Array,
                            interpret: bool = False
                            ) -> Tuple[jax.Array, jax.Array]:
    """(N, T, D) → ((N, T) idx, (N, T) prob) via the fused kernel."""
    N, T, D = feats.shape
    idx, prob = ctc_head_reduce(feats.reshape(N * T, D), w, b,
                                interpret=interpret)
    return idx.reshape(N, T), prob.reshape(N, T)
