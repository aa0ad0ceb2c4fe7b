"""DBNet detector training: shrink-map BCE + dice loss.

Simplified DB objective (arXiv:1911.08947 §3.4, binarize branch only — the
inference pipeline consumes only the shrink-prob map): balanced BCE with
3:1 negative-hard mining approximated by top-k weighting, plus dice loss.
Targets are shrunk text-region masks (train/synth.py renders them).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import optax

from ..models import dbnet


def db_loss_fn(params, images, shrink_maps, shrink_masks, dtype=jnp.float32,
               backbone_arch="mbv3"):
    """images (B,H,W,3) ImageNet-normalized; shrink_maps (B,H,W) ∈ {0,1};
    shrink_masks (B,H,W) valid-pixel mask."""
    probs = dbnet.apply(params, images.astype(dtype),
                        backbone_arch=backbone_arch).astype(jnp.float32)
    eps = 1e-6
    probs = jnp.clip(probs, eps, 1 - eps)
    bce = -(shrink_maps * jnp.log(probs) +
            (1 - shrink_maps) * jnp.log(1 - probs))
    pos = shrink_maps * shrink_masks
    neg = (1 - shrink_maps) * shrink_masks
    n_pos = jnp.maximum(pos.sum(), 1.0)
    # negative weighting: keep loss balance ~3:1 without dynamic top-k
    # (data-dependent shapes don't jit); weight negatives by their loss.
    neg_w = neg * bce
    neg_w = neg_w / jnp.maximum(neg_w.sum(), eps) * (3.0 * n_pos)
    bce_loss = (bce * pos).sum() / n_pos + \
        (bce * neg_w).sum() / jnp.maximum(3.0 * n_pos, 1.0) * 3.0
    inter = (probs * pos).sum()
    union = (probs * shrink_masks).sum() + pos.sum() + eps
    dice = 1.0 - 2.0 * inter / union
    return bce_loss + dice


def make_train_step(optimizer: optax.GradientTransformation,
                    dtype=jnp.float32, backbone_arch="mbv3"):
    @jax.jit
    def step(params, opt_state, images, shrink_maps, shrink_masks):
        loss, grads = jax.value_and_grad(db_loss_fn)(
            params, images, shrink_maps, shrink_masks, dtype,
            backbone_arch=backbone_arch)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss
    return step


def distill_loss_fn(params, images, shrink_maps, shrink_masks,
                    teacher_probs, w: float, dtype=jnp.float32,
                    backbone_arch="resnet18"):
    """GT loss blended with soft-target BCE against a teacher's prob map
    (VERDICT r4 #8: three from-scratch server-det attempts lost to the
    mbv3 fallback; distilling the working mbv3 det's maps transfers what
    the synthetic GT alone did not). w = weight on the distill term."""
    gt = db_loss_fn(params, images, shrink_maps, shrink_masks, dtype,
                    backbone_arch=backbone_arch)
    probs = dbnet.apply(params, images.astype(dtype),
                        backbone_arch=backbone_arch).astype(jnp.float32)
    eps = 1e-6
    probs = jnp.clip(probs, eps, 1 - eps)
    t = jnp.clip(teacher_probs, 0.0, 1.0)
    soft = -(t * jnp.log(probs) + (1 - t) * jnp.log(1 - probs))
    soft = (soft * shrink_masks).sum() / jnp.maximum(
        shrink_masks.sum(), 1.0)
    return (1.0 - w) * gt + w * soft


def make_distill_step(optimizer: optax.GradientTransformation,
                      teacher_arch: str = "mbv3", w: float = 0.7,
                      dtype=jnp.float32, backbone_arch="resnet18"):
    """Teacher forward (stop-gradient, its own params argument) + student
    update in ONE jit — the rendered batch is uploaded once."""
    @jax.jit
    def step(params, teacher_params, opt_state, images, shrink_maps,
             shrink_masks):
        t_probs = jax.lax.stop_gradient(dbnet.apply(
            teacher_params, images.astype(dtype),
            backbone_arch=teacher_arch)).astype(jnp.float32)
        loss, grads = jax.value_and_grad(distill_loss_fn)(
            params, images, shrink_maps, shrink_masks, t_probs, w, dtype,
            backbone_arch=backbone_arch)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss
    return step


def init_training(rng, lr: float = 1e-3, backbone_arch: str = "mbv3"):
    params = dbnet.init(rng, backbone_arch=backbone_arch)
    optimizer = optax.adamw(lr, weight_decay=1e-5)
    opt_state = optimizer.init(params)
    return params, optimizer, opt_state
