"""Functional NHWC building blocks for the native TPU models.

All native models (models/cls.py, dbnet.py, svtr.py) are plain functions over
explicit param pytrees (nested dicts) in NHWC layout with HWIO conv kernels —
the layout XLA's TPU conv emitter wants, with channels on the 128-lane axis.
Params are ordinary pytrees: optax can train them, jax.device_put shards
them, and models/lift.py fills them from ONNX weights (OIHW → HWIO transpose
happens at lift time, once).
"""
from __future__ import annotations

import math
from typing import Any, Dict, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

Params = Dict[str, Any]


def make_divisible(v: float, divisor: int = 8,
                   min_value: Optional[int] = None) -> int:
    """Channel rounding used by the MobileNetV3 family (PaddleOCR scheme)."""
    if min_value is None:
        min_value = divisor
    new_v = max(min_value, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


# ------------------------------------------------------------------ activations
def hardswish(x):
    return x * jnp.clip(x / 6.0 + 0.5, 0.0, 1.0)


def hardsigmoid(x, alpha: float = 0.2, beta: float = 0.5):
    # ONNX HardSigmoid default (alpha=0.2), as exported by paddle2onnx for
    # the SE gates in the cls graph.
    return jnp.clip(alpha * x + beta, 0.0, 1.0)


ACTS = {
    "relu": lambda x: jnp.maximum(x, 0),
    "hswish": hardswish,
    "none": lambda x: x,
}


# ------------------------------------------------------------------ init
# Initialization runs entirely on HOST numpy: no per-layer jit compiles or
# device round-trips (a MobileNetV3 init would otherwise dispatch ~100 tiny
# XLA programs). Leaves are numpy arrays; they move to HBM on first jitted
# use (or via jax.device_put placement in parallel/mesh.py).
def as_rng(rng) -> np.random.Generator:
    """Accept an int seed, numpy Generator, or jax PRNGKey."""
    if isinstance(rng, np.random.Generator):
        return rng
    if isinstance(rng, (int, np.integer)):
        return np.random.default_rng(int(rng))
    # jax PRNGKey (old-style uint32 array or new-style key array)
    try:
        data = np.asarray(jax.random.key_data(rng))
    except Exception:
        data = np.asarray(rng)
    return np.random.default_rng(int(data.reshape(-1)[-1]))


def split_rng(rng, n: int):
    return as_rng(rng).spawn(n)


def conv_init(rng, k: int, cin: int, cout: int, groups: int = 1,
              bias: bool = False, dtype=jnp.float32) -> Params:
    fan_in = k * k * cin // groups
    std = math.sqrt(2.0 / fan_in)
    w = (as_rng(rng).normal(0.0, std, (k, k, cin // groups, cout))
         .astype(dtype))
    p: Params = {"w": w}
    if bias:
        p["b"] = np.zeros((cout,), dtype)
    return p


def bn_init(c: int, dtype=jnp.float32) -> Params:
    return {
        "scale": np.ones((c,), dtype),
        "bias": np.zeros((c,), dtype),
        "mean": np.zeros((c,), dtype),
        "var": np.ones((c,), dtype),
    }


def convbn_init(rng, k: int, cin: int, cout: int, groups: int = 1,
                dtype=jnp.float32) -> Params:
    return {"conv": conv_init(rng, k, cin, cout, groups, dtype=dtype),
            "bn": bn_init(cout, dtype)}


# ------------------------------------------------------------------ apply
def conv2d(x, p: Params, stride=(1, 1), groups: int = 1,
           dilation=(1, 1), padding=None):
    k = p["w"].shape[0]
    if padding is None:
        pad = ((k // 2) * dilation[0], (k // 2) * dilation[0])
        padding = (pad, ((p["w"].shape[1] // 2) * dilation[1],) * 2)
    out = lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), window_strides=stride, padding=padding,
        rhs_dilation=dilation,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        preferred_element_type=jnp.float32)
    if "b" in p:
        out = out + p["b"]
    return out


def batch_norm(x, p: Params, eps: float = 1e-5):
    inv = p["scale"] * lax.rsqrt(p["var"] + eps)
    return x * inv + (p["bias"] - p["mean"] * inv)


def conv_bn_act(x, p: Params, stride=(1, 1), groups: int = 1,
                act: str = "none", eps: float = 1e-5):
    x = conv2d(x, p["conv"], stride=stride, groups=groups)
    x = batch_norm(x, p["bn"], eps=eps)
    return ACTS[act](x)


def conv_transpose2x(x, p: Params):
    """2x nearest-equivalent transposed conv (k=2, s=2, no padding) used by
    the DB head upsampling. Kernel layout HWIO (I=cin, O=cout)."""
    out = lax.conv_transpose(
        x, p["w"].astype(x.dtype), strides=(2, 2), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if "b" in p:
        out = out + p["b"]
    return out


def mask_valid(x, vh, vw):
    """Zero x (N, H, W, C) beyond each sample's (vh, vw) valid region.

    BN shifts the zero padding of a bucketed canvas to a nonzero constant,
    so each conv leaks a halo of it back into the valid region; re-zeroing
    after every spatial stage makes each conv see exactly the SAME-zero-pad
    neighborhood an exact-size canvas would — the padded-canvas forward
    then reproduces the exact-canvas computation bit-for-bit (valid extents
    divide evenly at every stride because det sizes are /32 multiples).
    XLA fuses the where into the producing op's epilogue."""
    n, h, w = x.shape[:3]
    rmask = jnp.arange(h, dtype=jnp.int32)[None, :] < vh[:, None]
    cmask = jnp.arange(w, dtype=jnp.int32)[None, :] < vw[:, None]
    m = (rmask[:, :, None] & cmask[:, None, :])[..., None]
    return jnp.where(m, x, jnp.zeros((), x.dtype))


def se_module(x, p: Params, alpha: float = 0.2, valid_hw=None):
    """Squeeze-and-excitation: GAP → 1x1 reduce + relu + 1x1 expand +
    hardsigmoid → scale.

    valid_hw = (vh (N,), vw (N,)) int32 restricts the global pool to each
    sample's valid region. Det canvases are padded to compile buckets
    (pipeline/detector.py); an unmasked GAP lets that padding shift the
    channel gates of EVERY pixel, so the same page scores differently in
    different buckets/batches. With the mask, the pool — the one place
    padding contaminates the whole map — sees only real pixels. Equals the
    plain mean when nothing is padded."""
    if valid_hw is not None:
        vh, vw = valid_hw
        n, h, w, _ = x.shape
        rmask = jnp.arange(h, dtype=jnp.int32)[None, :] < vh[:, None]
        cmask = jnp.arange(w, dtype=jnp.int32)[None, :] < vw[:, None]
        m = (rmask[:, :, None] & cmask[:, None, :]).astype(x.dtype)
        area = jnp.maximum(vh * vw, 1).astype(x.dtype)
        s = jnp.sum(x * m[..., None], axis=(1, 2), keepdims=True) \
            / area[:, None, None, None]
    else:
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
    s = conv2d(s, p["reduce"])
    s = jnp.maximum(s, 0)
    s = conv2d(s, p["expand"])
    s = hardsigmoid(s, alpha=alpha)
    return x * s


def se_init(rng, c: int, mid: Optional[int] = None, dtype=jnp.float32) -> Params:
    if mid is None:
        mid = c // 4
    r1, r2 = split_rng(rng, 2)
    return {"reduce": conv_init(r1, 1, c, mid, bias=True, dtype=dtype),
            "expand": conv_init(r2, 1, mid, c, bias=True, dtype=dtype)}


def max_pool(x, k=(2, 2), stride=(2, 2)):
    return lax.reduce_window(
        x, -jnp.inf, lax.max, (1, k[0], k[1], 1), (1, stride[0], stride[1], 1),
        "VALID")


def avg_pool(x, k=(2, 2), stride=(2, 2)):
    s = lax.reduce_window(
        x, 0.0, lax.add, (1, k[0], k[1], 1), (1, stride[0], stride[1], 1),
        "VALID")
    return s / (k[0] * k[1])


def linear_init(rng, cin: int, cout: int, dtype=jnp.float32) -> Params:
    std = math.sqrt(1.0 / cin)
    return {"w": as_rng(rng).normal(0.0, std, (cin, cout)).astype(dtype),
            "b": np.zeros((cout,), dtype)}


def linear(x, p: Params):
    return jnp.matmul(x, p["w"].astype(x.dtype),
                      preferred_element_type=jnp.float32) + p["b"]


def resize_nearest_2x(x):
    n, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, 2, w, 2, c))
    return x.reshape(n, h * 2, w * 2, c)


def tree_cast(params, dtype):
    return jax.tree_util.tree_map(
        lambda a: a.astype(dtype) if jnp.issubdtype(a.dtype, jnp.floating)
        else a, params)


def param_count(params) -> int:
    return sum(int(np.prod(a.shape))
               for a in jax.tree_util.tree_leaves(params))
