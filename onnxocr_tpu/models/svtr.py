"""SVTR-LCNet-style CTC recognizer (NHWC, functional).

The reference runs an exported SVTR_LCNet graph through onnxruntime
(onnxocr/predict_rec.py:280-326; rec_algorithm default SVTR_LCNet,
utils.py:307). This native version follows the same recipe from the
PP-OCRv3 report (arXiv:2206.03001): a light depthwise-separable conv
backbone that collapses height 48 → 1 and width W → W/8, followed by
global-mixing transformer blocks and a CTC head over the dictionary.

Input: (N, 48, W, 3) in [-1, 1], W a bucket multiple of 8.
Output: (N, W//8, vocab) CTC logits — argmax/prob reduction happens inside
the same jit (ops/ctc.ctc_reduce_logits) so the vocab axis never leaves the
device.

When a real rec.onnx is supplied the pipeline uses GraphExecutor; this
native net is the trainable path (train/rec_trainer.py).
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from . import common as cm

# (out_ch, stride) depthwise-separable stages after the stem.
_STAGES: Tuple[Tuple[int, Tuple[int, int]], ...] = (
    (64, (2, 1)),   # H 24→12
    (64, (1, 1)),
    (128, (2, 2)),  # H 12→6, W/2→W/4
    (128, (1, 1)),
    (256, (2, 1)),  # H 6→3
    (256, (1, 1)),
)
_MIXER_DIM = 192
_MIXER_HEADS = 6
_MIXER_DEPTH = 2
_MLP_RATIO = 2


def init(rng, vocab_size: int, dtype=jnp.float32, dim: int = _MIXER_DIM,
         depth: int = _MIXER_DEPTH, width_mult: float = 1.0,
         mlp_ratio: int = _MLP_RATIO) -> Dict[str, Any]:
    """dim/depth/width_mult scale the net (apply() reads every size from
    the param shapes, so scaled checkpoints load through the same forward;
    attention heads derive as dim//32 — 6 at the 192 default). The TPU has
    enormous capacity headroom here (rec forward 3.9 ms at batch 64, MFU
    ~0.1% — tools/profile_onecall.py), so larger nets are ~free to serve;
    the training budget, not inference cost, bounds the size."""
    keys = cm.split_rng(rng, 8 + 2 * len(_STAGES) + 6 * depth)
    ki = iter(range(len(keys)))

    def ch(c):
        return int(round(c * width_mult / 8) * 8) or 8

    p: Dict[str, Any] = {
        "stem": cm.convbn_init(keys[next(ki)], 3, 3, ch(32), dtype=dtype),
        "stages": [],
    }
    cin = ch(32)
    for cout, s in _STAGES:
        cout = ch(cout)
        p["stages"].append({
            "dw": cm.convbn_init(keys[next(ki)], 3, cin, cin, groups=cin,
                                 dtype=dtype),
            "pw": cm.convbn_init(keys[next(ki)], 1, cin, cout, dtype=dtype),
        })
        cin = cout
    # project (3, W/4, C) → pooled (1, W/8) sequence at mixer dim
    p["neck"] = cm.convbn_init(keys[next(ki)], 1, cin, dim, dtype=dtype)
    p["mixer"] = []
    for _ in range(depth):
        blk = {
            "ln1": {"scale": np.ones((dim,), dtype),
                    "bias": np.zeros((dim,), dtype)},
            "qkv": cm.linear_init(keys[next(ki)], dim,
                                  3 * dim, dtype=dtype),
            "proj": cm.linear_init(keys[next(ki)], dim, dim,
                                   dtype=dtype),
            "ln2": {"scale": np.ones((dim,), dtype),
                    "bias": np.zeros((dim,), dtype)},
            "fc1": cm.linear_init(keys[next(ki)], dim,
                                  mlp_ratio * dim, dtype=dtype),
            "fc2": cm.linear_init(keys[next(ki)], mlp_ratio * dim,
                                  dim, dtype=dtype),
        }
        p["mixer"].append(blk)
    p["head"] = cm.linear_init(keys[next(ki)], dim, vocab_size,
                               dtype=dtype)
    return p


def _layer_norm(x, p, eps=1e-6):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def _attn(x, blk, valid_t=None):
    n, t, d = x.shape
    h = max(1, d // 32)  # 6 at the 192 default (= legacy _MIXER_HEADS)
    qkv = cm.linear(x, blk["qkv"]).reshape(n, t, 3, h, d // h)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    q = jnp.swapaxes(q, 1, 2)  # (n, h, t, dh)
    k = jnp.swapaxes(k, 1, 2)
    v = jnp.swapaxes(v, 1, 2)
    scores = jnp.einsum("nhtd,nhsd->nhts", q, k,
                        preferred_element_type=jnp.float32)
    scores = scores / jnp.sqrt(d // h).astype(scores.dtype)
    if valid_t is not None:
        # mask padded key positions so outputs over the valid width are
        # invariant to the bucket width (static-shape discipline: any
        # bucket ≥ the crop's resized width produces identical tokens)
        kmask = (jnp.arange(t)[None, :] <
                 valid_t[:, None])[:, None, None, :]
        scores = jnp.where(kmask, scores, jnp.float32(-1e9))
    w = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("nhts,nhsd->nhtd", w, v,
                     preferred_element_type=jnp.float32)
    out = jnp.swapaxes(out, 1, 2).reshape(n, t, d)
    return cm.linear(out, blk["proj"])


def _mask_w(x, vw):
    """Zero x (N, H, W, C) beyond each sample's valid width vw (N,).

    BN turns the zero bucket padding into a nonzero per-channel constant;
    each 3x3 conv then leaks a halo of it back across the valid boundary,
    so without re-zeroing the features near the edge depend on the bucket
    width (ADVICE r2: ~0.1 logit divergence within ~8px of the boundary).
    Masking at token granularity (vw = valid_t * stride units) is exact:
    the columns inside the minimal token-aligned bucket are computed from
    identically-zero inputs in every bucket, so re-zeroing the rest makes
    the forward bit-invariant to bucket choice. XLA fuses the where into
    the producing conv's epilogue."""
    cmask = (jnp.arange(x.shape[2], dtype=jnp.int32)[None, :]
             < vw[:, None])[:, None, :, None]
    return jnp.where(cmask, x, jnp.zeros((), x.dtype))


def apply_features(params, x, valid_t=None) -> jnp.ndarray:
    """x: (N, 48, W, 3) → (N, W//8, D) pre-head sequence features.

    valid_t (N,) optionally masks each row beyond its valid token count
    (= ceil(resized_w / 8)) — attention keys AND every conv stage's width
    axis (_mask_w) — so the valid-region features are exactly independent
    of how much bucket padding follows: one wide bucket can serve crops of
    any narrower width with bit-identical results."""
    x = cm.conv_bn_act(x, params["stem"], stride=(2, 2), act="hswish")
    if valid_t is not None:
        x = _mask_w(x, valid_t * 4)          # width W/2: 4 cols per token
    w_div = 2
    for (cout, s), st in zip(_STAGES, params["stages"]):
        x = cm.conv_bn_act(x, st["dw"], stride=s, groups=x.shape[-1],
                           act="hswish")
        w_div *= s[1]
        if valid_t is not None:
            x = _mask_w(x, valid_t * (8 // w_div))
        x = cm.conv_bn_act(x, st["pw"], act="hswish")
        if valid_t is not None:
            x = _mask_w(x, valid_t * (8 // w_div))
    x = cm.conv_bn_act(x, params["neck"], act="hswish")
    if valid_t is not None:
        x = _mask_w(x, valid_t * (8 // w_div))
    # (N, 3, W/4, D) → avg over height, pool width /2 → (N, W/8, D)
    x = cm.avg_pool(x, (x.shape[1], 2), (x.shape[1], 2))
    x = x[:, 0]  # (N, T, D)
    for blk in params["mixer"]:
        x = x + _attn(_layer_norm(x, blk["ln1"]), blk, valid_t)
        y = _layer_norm(x, blk["ln2"])
        y = cm.linear(y, blk["fc1"])
        y = jax.nn.gelu(y)
        y = cm.linear(y, blk["fc2"])
        x = x + y
    return x


def apply(params, x, valid_t=None) -> jnp.ndarray:
    """x: (N, 48, W, 3) → (N, W//8, vocab) logits."""
    return cm.linear(apply_features(params, x, valid_t), params["head"])
