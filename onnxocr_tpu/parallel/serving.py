"""Multi-chip batched inference: data-parallel page/crop sharding over a
device mesh.

The reference scales serving with gunicorn worker processes on one host
(SURVEY.md §2.5); the TPU-native equivalent shards the *batch* axis of each
stage's jit program over the `data` axis of a jax.sharding.Mesh — weights
replicate once, XLA partitions the compute, and ICI carries no collectives
at all for inference (embarrassingly parallel over batch).

Usage:
    mesh = mesh_lib.make_mesh()                  # all local chips
    det = ShardedDetBatch(params, mesh)          # or sharded rec/cls alike
    prob_maps = det(batch_u8)                    # (B, H, W) across chips
"""
from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models import dbnet, cls as cls_model, svtr
from ..ops import det_pre
from ..ops import ctc as ctc_ops
from . import mesh as mesh_lib


class ShardedDetBatch:
    """(B, H, W, 3) uint8 page batch → (B, H, W) prob maps, B sharded over
    the mesh's `data` axis."""

    def __init__(self, params, mesh: Mesh, arch: str = "mbv3"):
        self.mesh = mesh
        self.params = jax.device_put(params, mesh_lib.replicated(mesh))
        self.arch = arch

        def fn(params, batch_u8, rhw):
            x = det_pre.normalize_det(batch_u8)
            return dbnet.apply(params, x, backbone_arch=arch,
                               valid_hw=(rhw[:, 0], rhw[:, 1]))

        self._fn = jax.jit(
            fn,
            in_shardings=(mesh_lib.replicated(mesh),
                          NamedSharding(mesh, P("data", None, None, None)),
                          NamedSharding(mesh, P("data", None))),
            out_shardings=NamedSharding(mesh, P("data", None, None)))

    def __call__(self, batch_u8: np.ndarray,
                 rhw: Optional[np.ndarray] = None) -> jax.Array:
        """rhw (B, 2) int32 valid (rh, rw) extents per page masks the
        backbone's SE pools to the un-padded region; defaults to the full
        canvas (nothing padded)."""
        b = batch_u8.shape[0]
        if rhw is None:
            rhw = np.tile(np.int32(batch_u8.shape[1:3]), (b, 1))
        n_data = self.mesh.shape["data"]
        pad = (-b) % n_data
        if pad:
            batch_u8 = np.concatenate(
                [batch_u8, np.zeros((pad,) + batch_u8.shape[1:],
                                    batch_u8.dtype)], axis=0)
            rhw = np.concatenate(
                [rhw, np.tile(np.int32(batch_u8.shape[1:3]), (pad, 1))],
                axis=0)
        out = self._fn(self.params, batch_u8, np.asarray(rhw, np.int32))
        return out[:b]


class ShardedRecBatch:
    """(B, 48, W, 3) crop batch → ((B, T) idx, (B, T) prob), B sharded."""

    def __init__(self, params, mesh: Mesh):
        self.mesh = mesh
        self.params = jax.device_put(params, mesh_lib.replicated(mesh))

        def fn(params, crops):
            logits = svtr.apply(params, crops)
            return ctc_ops.ctc_reduce_logits(logits.astype(jnp.float32))

        self._fn = jax.jit(
            fn,
            in_shardings=(mesh_lib.replicated(mesh),
                          NamedSharding(mesh, P("data", None, None, None))),
            out_shardings=(NamedSharding(mesh, P("data", None)),
                           NamedSharding(mesh, P("data", None))))

    def __call__(self, crops: np.ndarray):
        b = crops.shape[0]
        n_data = self.mesh.shape["data"]
        pad = (-b) % n_data
        if pad:
            crops = np.concatenate(
                [crops, np.zeros((pad,) + crops.shape[1:], crops.dtype)],
                axis=0)
        idx, prob = self._fn(self.params, crops)
        return idx[:b], prob[:b]
