"""CTC training for the native SVTR recognizer.

The reference ships no training code at all (SURVEY.md: inference-only); this
module exists because the TPU build's det/rec weights may need to be
(re)trained — the reference snapshot's .onnx blobs are absent — and because
the multi-chip story (dp × tp sharded train step over a Mesh) lives here.

Loss: optax.ctc_loss (blank_id 0, matching the decoder's blank-first dict).
"""
from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models import svtr
from ..parallel import mesh as mesh_lib


def ctc_loss_fn(params, images, labels, label_paddings, dtype=jnp.float32,
                model_mod=svtr, valid_t=None):
    """images: (B, 48, W, 3) in [-1,1]; labels: (B, L) int32 (0 = blank /
    pad); label_paddings: (B, L) 1.0 where padded. valid_t (B,) enables
    the SVTR attention width mask so training matches the inference-time
    bucket-invariant forward."""
    if model_mod is svtr:
        logits = model_mod.apply(params, images.astype(dtype),
                                 valid_t).astype(jnp.float32)
    else:
        logits = model_mod.apply(params,
                                 images.astype(dtype)).astype(jnp.float32)
    B, T, V = logits.shape
    logit_paddings = jnp.zeros((B, T), jnp.float32)
    per_seq = optax.ctc_loss(logits, logit_paddings, labels, label_paddings,
                             blank_id=0)
    return jnp.mean(per_seq)


def make_train_step(optimizer: optax.GradientTransformation,
                    dtype=jnp.float32, model_mod=svtr):
    @jax.jit
    def step(params, opt_state, images, labels, label_paddings,
             valid_t=None):
        loss, grads = jax.value_and_grad(ctc_loss_fn)(
            params, images, labels, label_paddings, dtype,
            model_mod=model_mod, valid_t=valid_t)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss
    return step


def make_sharded_train_step(mesh: Mesh,
                            optimizer: optax.GradientTransformation,
                            dtype=jnp.float32):
    """dp × tp train step: batch shards over `data`, the CTC head shards
    over `model`; XLA derives the gradient collectives (psum over data for
    replicated params, none for the sharded head) from the output shardings.
    """
    data = P("data")

    def step(params, opt_state, images, labels, label_paddings):
        loss, grads = jax.value_and_grad(ctc_loss_fn)(
            params, images, labels, label_paddings, dtype)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return jax.jit(
        step,
        in_shardings=(None, None,  # params/opt_state keep their placement
                      NamedSharding(mesh, P("data", None, None, None)),
                      NamedSharding(mesh, data),
                      NamedSharding(mesh, data)),
    )


def init_training(rng, vocab_size: int, lr: float = 1e-3
                  ) -> Tuple[dict, optax.GradientTransformation, tuple]:
    params = svtr.init(rng, vocab_size)
    optimizer = optax.adamw(lr, weight_decay=1e-5)
    opt_state = optimizer.init(params)
    return params, optimizer, opt_state
