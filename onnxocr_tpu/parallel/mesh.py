"""Device-mesh sharding for multi-chip serving and training.

The reference is strictly single-device (SURVEY.md §2.5: no DP/TP/PP, no
collective backend — concurrency is gunicorn processes + thread pools). The
TPU-native scale-out story is JAX SPMD: one jit program over a
`jax.sharding.Mesh`, with XLA inserting ICI collectives from sharding
annotations — never hand-written NCCL/MPI.

Axes:
  data  — batch sharding (serving fan-out and gradient data-parallelism)
  model — tensor parallelism for the big CTC-head matmul (vocab ≈ 18.4k for
          the v5 dict splits cleanly across chips; psum-free forward since
          the argmax/logsumexp reduce over a sharded vocab axis lowers to an
          all-gather of (N, T) scalars, not logits)
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, model_parallel: int = 1,
              devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = np.asarray(devices[:n_devices])
    assert n_devices % model_parallel == 0
    grid = devices.reshape(n_devices // model_parallel, model_parallel)
    return Mesh(grid, ("data", "model"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharding(mesh: Mesh, ndim: int = 4) -> NamedSharding:
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def shard_rec_params(params, mesh: Mesh):
    """Place recognizer params: replicate everything except the CTC head,
    whose vocab axis shards over the `model` mesh axis."""
    repl = replicated(mesh)
    placed = jax.tree_util.tree_map(
        lambda a: jax.device_put(a, repl), params)
    placed["head"] = {
        "w": jax.device_put(params["head"]["w"],
                            NamedSharding(mesh, P(None, "model"))),
        "b": jax.device_put(params["head"]["b"],
                            NamedSharding(mesh, P("model"))),
    }
    return placed


def shard_batch(batch, mesh: Mesh):
    """Shard leading (batch) axis of every array in the pytree over `data`."""
    def place(a):
        return jax.device_put(a, NamedSharding(mesh,
                                               P("data",
                                                 *([None] * (a.ndim - 1)))))
    return jax.tree_util.tree_map(place, batch)
