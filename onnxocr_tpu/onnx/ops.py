"""JAX implementations of the ONNX opset-11/13 subset used by the PaddleOCR
model family (DBNet det, MobileNetV3 cls, SVTR/CRNN rec) plus general glue.

Design notes
------------
* Values flowing through the executor are either **static** host values
  (numpy arrays / python scalars — used for shape arithmetic so that
  `Reshape`/`Slice`/`Resize` sizes stay concrete under `jit`) or **traced**
  JAX values. Ops that can run fully static do so with numpy; anything
  touching a traced value uses jnp/lax.
* Tensors keep ONNX's NCHW layout here; XLA handles the TPU-internal layout.
  The hand-written native models (onnxocr_tpu/models/) use NHWC instead —
  this module is the *compatibility* backend that can run any user-provided
  ONNX graph jit-compiled on TPU.
"""
from __future__ import annotations

import functools
from typing import Any, Dict, List, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

_REGISTRY: Dict[str, Any] = {}


def register(name):
    def deco(fn):
        _REGISTRY[name] = fn
        return fn
    return deco


def get_op(name):
    fn = _REGISTRY.get(name)
    if fn is None:
        raise NotImplementedError(f"ONNX op not implemented: {name}")
    return fn


def is_static(*vals) -> bool:
    return all(
        v is None or isinstance(v, (np.ndarray, np.generic, int, float, bool,
                                    list, tuple))
        for v in vals)


def _np_int_list(v) -> List[int]:
    if v is None:
        return []
    return [int(x) for x in np.asarray(v).reshape(-1)]


def _elemwise(np_fn, jnp_fn):
    def impl(node, vals, ctx):
        if is_static(*vals):
            return [np_fn(*[np.asarray(v) for v in vals])]
        return [jnp_fn(*vals)]
    return impl


# ---------------------------------------------------------------- arithmetic
register("Add")(_elemwise(np.add, jnp.add))
register("Sub")(_elemwise(np.subtract, jnp.subtract))
register("Mul")(_elemwise(np.multiply, jnp.multiply))
register("Div")(_elemwise(np.divide, jnp.divide))
register("Pow")(_elemwise(np.power, jnp.power))
register("Min")(_elemwise(np.minimum, jnp.minimum))
register("Max")(_elemwise(np.maximum, jnp.maximum))
register("Mod")(_elemwise(np.mod, jnp.mod))
register("Sqrt")(_elemwise(np.sqrt, jnp.sqrt))
register("Exp")(_elemwise(np.exp, jnp.exp))
register("Log")(_elemwise(np.log, jnp.log))
register("Neg")(_elemwise(np.negative, jnp.negative))
register("Abs")(_elemwise(np.abs, jnp.abs))
register("Floor")(_elemwise(np.floor, jnp.floor))
register("Ceil")(_elemwise(np.ceil, jnp.ceil))
register("Tanh")(_elemwise(np.tanh, jnp.tanh))
register("Sin")(_elemwise(np.sin, jnp.sin))
register("Cos")(_elemwise(np.cos, jnp.cos))
register("Reciprocal")(_elemwise(np.reciprocal, lambda x: 1.0 / x))
register("Equal")(_elemwise(np.equal, jnp.equal))
register("Greater")(_elemwise(np.greater, jnp.greater))
register("GreaterOrEqual")(_elemwise(np.greater_equal, jnp.greater_equal))
register("Less")(_elemwise(np.less, jnp.less))
register("LessOrEqual")(_elemwise(np.less_equal, jnp.less_equal))
register("Not")(_elemwise(np.logical_not, jnp.logical_not))
register("And")(_elemwise(np.logical_and, jnp.logical_and))
register("Or")(_elemwise(np.logical_or, jnp.logical_or))


@register("Round")
def op_round(node, vals, ctx):
    # ONNX Round is round-half-to-even, matching numpy/jnp `round`.
    (x,) = vals
    return [np.round(x) if is_static(x) else jnp.round(x)]


@register("Erf")
def op_erf(node, vals, ctx):
    (x,) = vals
    return [jax.scipy.special.erf(jnp.asarray(x))]


@register("Sum")
def op_sum(node, vals, ctx):
    out = vals[0]
    for v in vals[1:]:
        out = out + v
    return [out]


@register("Where")
def op_where(node, vals, ctx):
    c, a, b = vals
    if is_static(c, a, b):
        return [np.where(c, a, b)]
    return [jnp.where(c, a, b)]


# ---------------------------------------------------------------- activations
@register("Relu")
def op_relu(node, vals, ctx):
    (x,) = vals
    return [jnp.maximum(x, 0)]


@register("LeakyRelu")
def op_leaky_relu(node, vals, ctx):
    (x,) = vals
    alpha = node.attrs.get("alpha", 0.01)
    return [jnp.where(x >= 0, x, alpha * x)]


@register("PRelu")
def op_prelu(node, vals, ctx):
    x, slope = vals
    x = jnp.asarray(x)
    slope = jnp.asarray(slope)
    # ONNX PRelu broadcasts slope (often shape (C,) or (C,1,1)) against NCHW x.
    if slope.ndim == 1 and x.ndim == 4 and slope.shape[0] == x.shape[1]:
        slope = slope.reshape(1, -1, 1, 1)
    return [jnp.where(x >= 0, x, slope * x)]


@register("Sigmoid")
def op_sigmoid(node, vals, ctx):
    (x,) = vals
    return [jax.nn.sigmoid(jnp.asarray(x))]


@register("HardSigmoid")
def op_hard_sigmoid(node, vals, ctx):
    (x,) = vals
    alpha = node.attrs.get("alpha", 0.2)
    beta = node.attrs.get("beta", 0.5)
    return [jnp.clip(alpha * jnp.asarray(x) + beta, 0.0, 1.0)]


@register("HardSwish")
def op_hard_swish(node, vals, ctx):
    (x,) = vals
    x = jnp.asarray(x)
    return [x * jnp.clip(x / 6.0 + 0.5, 0.0, 1.0)]


@register("Softplus")
def op_softplus(node, vals, ctx):
    (x,) = vals
    return [jax.nn.softplus(jnp.asarray(x))]


@register("Clip")
def op_clip(node, vals, ctx):
    x = vals[0]
    if ctx.opset < 11:
        lo = node.attrs.get("min", -np.inf)
        hi = node.attrs.get("max", np.inf)
    else:
        lo = vals[1] if len(vals) > 1 and vals[1] is not None else -np.inf
        hi = vals[2] if len(vals) > 2 and vals[2] is not None else np.inf
    return [jnp.clip(jnp.asarray(x), lo, hi)]


@register("Softmax")
def op_softmax(node, vals, ctx):
    (x,) = vals
    x = jnp.asarray(x)
    axis = node.attrs.get("axis", 1 if ctx.opset < 13 else -1)
    if ctx.opset < 13:
        # Legacy semantics: flatten to 2D at `axis`, softmax over dim 1.
        shape = x.shape
        ax = axis % x.ndim
        x2 = x.reshape(int(np.prod(shape[:ax]) or 1), -1)
        out = jax.nn.softmax(x2, axis=1)
        return [out.reshape(shape)]
    return [jax.nn.softmax(x, axis=axis)]


@register("LogSoftmax")
def op_log_softmax(node, vals, ctx):
    (x,) = vals
    axis = node.attrs.get("axis", -1)
    return [jax.nn.log_softmax(jnp.asarray(x), axis=axis)]


@register("Gelu")
def op_gelu(node, vals, ctx):
    (x,) = vals
    approx = node.attrs.get("approximate", "none") == "tanh"
    return [jax.nn.gelu(jnp.asarray(x), approximate=approx)]


# ---------------------------------------------------------------- shape glue
@register("Identity")
def op_identity(node, vals, ctx):
    return [vals[0]]


@register("Dropout")
def op_dropout(node, vals, ctx):
    return [vals[0]]


@register("Cast")
def op_cast(node, vals, ctx):
    from . import ir
    (x,) = vals
    dt = ir.DTYPE_MAP[node.attrs["to"]]
    if is_static(x):
        return [np.asarray(x).astype(dt)]
    # Keep 64-bit casts at 32-bit on device (jax default x64-disabled).
    if dt == np.int64:
        dt = np.int32
    elif dt == np.float64:
        dt = np.float32
    return [jnp.asarray(x).astype(dt)]


@register("Shape")
def op_shape(node, vals, ctx):
    (x,) = vals
    # Static under jit: traced arrays still expose a concrete .shape.
    shape = np.asarray(np.shape(x) if is_static(x) else x.shape,
                       dtype=np.int64)
    start = node.attrs.get("start", 0)
    end = node.attrs.get("end")
    return [shape[start:end]]


@register("Reshape")
def op_reshape(node, vals, ctx):
    x = vals[0]
    if len(vals) > 1:
        target = _np_int_list(vals[1])
    else:
        target = _np_int_list(node.attrs["shape"])
    in_shape = list(np.shape(x) if is_static(x) else x.shape)
    out = []
    for i, d in enumerate(target):
        if d == 0 and node.attrs.get("allowzero", 0) == 0:
            out.append(in_shape[i])
        else:
            out.append(d)
    if is_static(x):
        return [np.reshape(np.asarray(x), out)]
    return [jnp.reshape(x, out)]


@register("Flatten")
def op_flatten(node, vals, ctx):
    (x,) = vals
    axis = node.attrs.get("axis", 1) % (jnp.ndim(x) + 1)
    shape = np.shape(x) if is_static(x) else x.shape
    lead = int(np.prod(shape[:axis]) or 1)
    if is_static(x):
        return [np.reshape(np.asarray(x), (lead, -1))]
    return [jnp.reshape(x, (lead, -1))]


@register("Transpose")
def op_transpose(node, vals, ctx):
    (x,) = vals
    perm = node.attrs.get("perm")
    if is_static(x):
        return [np.transpose(np.asarray(x), perm)]
    return [jnp.transpose(x, perm)]


@register("Squeeze")
def op_squeeze(node, vals, ctx):
    x = vals[0]
    axes = (_np_int_list(vals[1]) if len(vals) > 1 and vals[1] is not None
            else _np_int_list(node.attrs.get("axes")))
    mod = np if is_static(x) else jnp
    if not axes:
        return [mod.squeeze(mod.asarray(x))]
    return [mod.squeeze(mod.asarray(x), axis=tuple(a % np.ndim(x) if is_static(x)
                                                   else a % x.ndim
                                                   for a in axes))]


@register("Unsqueeze")
def op_unsqueeze(node, vals, ctx):
    x = vals[0]
    axes = (_np_int_list(vals[1]) if len(vals) > 1 and vals[1] is not None
            else _np_int_list(node.attrs.get("axes")))
    mod = np if is_static(x) else jnp
    out = mod.asarray(x)
    ndim_out = (np.ndim(x) if is_static(x) else x.ndim) + len(axes)
    for ax in sorted(a % ndim_out for a in axes):
        out = mod.expand_dims(out, ax)
    return [out]


@register("Concat")
def op_concat(node, vals, ctx):
    axis = node.attrs["axis"]
    if is_static(*vals):
        return [np.concatenate([np.asarray(v) for v in vals], axis=axis)]
    return [jnp.concatenate([jnp.asarray(v) for v in vals], axis=axis)]


@register("Split")
def op_split(node, vals, ctx):
    x = vals[0]
    axis = node.attrs.get("axis", 0)
    if len(vals) > 1 and vals[1] is not None:
        sizes = _np_int_list(vals[1])
    else:
        sizes = _np_int_list(node.attrs.get("split"))
    n_out = len(node.outputs)
    dim = (np.shape(x) if is_static(x) else x.shape)[axis]
    if not sizes:
        sizes = [dim // n_out] * n_out
    offsets = np.cumsum([0] + sizes)
    mod = np if is_static(x) else jnp
    arr = mod.asarray(x)
    return [lax.slice_in_dim(arr, int(offsets[i]), int(offsets[i + 1]),
                             axis=axis) if mod is jnp else
            np.take(arr, range(int(offsets[i]), int(offsets[i + 1])),
                    axis=axis)
            for i in range(n_out)]


@register("Gather")
def op_gather(node, vals, ctx):
    x, idx = vals
    axis = node.attrs.get("axis", 0)
    if is_static(x, idx):
        return [np.take(np.asarray(x), np.asarray(idx).astype(np.int64),
                        axis=axis)]
    return [jnp.take(jnp.asarray(x), jnp.asarray(idx).astype(jnp.int32),
                     axis=axis)]


@register("GatherND")
def op_gather_nd(node, vals, ctx):
    x, idx = vals
    x = jnp.asarray(x)
    idx = jnp.asarray(idx).astype(jnp.int32)
    batch_dims = node.attrs.get("batch_dims", 0)
    if batch_dims:
        raise NotImplementedError("GatherND batch_dims > 0")
    return [x[tuple(jnp.moveaxis(idx, -1, 0))]]


@register("Slice")
def op_slice(node, vals, ctx):
    x = vals[0]
    if ctx.opset < 10:
        starts = _np_int_list(node.attrs["starts"])
        ends = _np_int_list(node.attrs["ends"])
        axes = _np_int_list(node.attrs.get("axes")) or list(range(len(starts)))
        steps = [1] * len(starts)
    else:
        starts = _np_int_list(vals[1])
        ends = _np_int_list(vals[2])
        axes = (_np_int_list(vals[3]) if len(vals) > 3 and vals[3] is not None
                else list(range(len(starts))))
        steps = (_np_int_list(vals[4]) if len(vals) > 4 and vals[4] is not None
                 else [1] * len(starts))
    ndim = np.ndim(x) if is_static(x) else x.ndim
    slicers = [slice(None)] * ndim
    for st, en, ax, sp in zip(starts, ends, axes, steps):
        INT64_MAX = 2 ** 63 - 1
        en = None if en >= INT64_MAX else en
        st = None if (sp < 0 and st >= INT64_MAX - 1) else st
        slicers[ax % ndim] = slice(st, en, sp)
    arr = np.asarray(x) if is_static(x) else x
    return [arr[tuple(slicers)]]


@register("Expand")
def op_expand(node, vals, ctx):
    x, shape = vals
    target = _np_int_list(shape)
    in_shape = list(np.shape(x) if is_static(x) else x.shape)
    # ONNX Expand uses numpy broadcasting with dim=1 expansion; target dims
    # may be 1 where input is larger (keep input dim).
    ndim = max(len(target), len(in_shape))
    in_shape = [1] * (ndim - len(in_shape)) + in_shape
    target = [1] * (ndim - len(target)) + target
    out = [max(a, b) for a, b in zip(in_shape, target)]
    if is_static(x):
        return [np.broadcast_to(np.asarray(x).reshape(in_shape), out)]
    return [jnp.broadcast_to(jnp.asarray(x).reshape(in_shape), out)]


@register("Tile")
def op_tile(node, vals, ctx):
    x, reps = vals
    reps = _np_int_list(reps)
    if is_static(x):
        return [np.tile(np.asarray(x), reps)]
    return [jnp.tile(jnp.asarray(x), reps)]


@register("ConstantOfShape")
def op_constant_of_shape(node, vals, ctx):
    shape = _np_int_list(vals[0])
    value = node.attrs.get("value")
    if value is None:
        value = np.zeros(1, np.float32)
    value = np.asarray(value).reshape(-1)[0]
    return [np.full(shape, value)]


@register("Range")
def op_range(node, vals, ctx):
    start, limit, delta = [np.asarray(v).reshape(()) for v in vals]
    return [np.arange(start, limit, delta)]


@register("Pad")
def op_pad(node, vals, ctx):
    x = vals[0]
    if ctx.opset < 11:
        pads = _np_int_list(node.attrs["pads"])
        cval = node.attrs.get("value", 0.0)
    else:
        pads = _np_int_list(vals[1])
        cval = (np.asarray(vals[2]).reshape(-1)[0]
                if len(vals) > 2 and vals[2] is not None else 0.0)
    mode = node.attrs.get("mode", "constant")
    ndim = np.ndim(x) if is_static(x) else x.ndim
    pad_width = [(int(pads[i]), int(pads[i + ndim])) for i in range(ndim)]
    mod = np if is_static(x) else jnp
    if mode == "constant":
        return [mod.pad(mod.asarray(x), pad_width, constant_values=cval)]
    jmode = {"reflect": "reflect", "edge": "edge", "wrap": "wrap"}[mode]
    return [mod.pad(mod.asarray(x), pad_width, mode=jmode)]


# ---------------------------------------------------------------- reductions
def _reduce(np_fn, jnp_fn):
    def impl(node, vals, ctx):
        x = vals[0]
        if len(vals) > 1 and vals[1] is not None:  # opset 18 axes input
            axes = _np_int_list(vals[1])
        else:
            axes = _np_int_list(node.attrs.get("axes"))
        keepdims = bool(node.attrs.get("keepdims", 1))
        axes_t = tuple(axes) if axes else None
        if is_static(x):
            return [np_fn(np.asarray(x), axis=axes_t, keepdims=keepdims)]
        return [jnp_fn(jnp.asarray(x), axis=axes_t, keepdims=keepdims)]
    return impl


register("ReduceMean")(_reduce(np.mean, jnp.mean))
register("ReduceSum")(_reduce(np.sum, jnp.sum))
register("ReduceMax")(_reduce(np.max, jnp.max))
register("ReduceMin")(_reduce(np.min, jnp.min))
register("ReduceProd")(_reduce(np.prod, jnp.prod))


@register("ReduceL2")
def op_reduce_l2(node, vals, ctx):
    x = jnp.asarray(vals[0])
    axes = tuple(_np_int_list(node.attrs.get("axes"))) or None
    keepdims = bool(node.attrs.get("keepdims", 1))
    return [jnp.sqrt(jnp.sum(x * x, axis=axes, keepdims=keepdims))]


@register("ArgMax")
def op_argmax(node, vals, ctx):
    (x,) = vals
    axis = node.attrs.get("axis", 0)
    keepdims = bool(node.attrs.get("keepdims", 1))
    out = jnp.argmax(jnp.asarray(x), axis=axis).astype(jnp.int32)
    if keepdims:
        out = jnp.expand_dims(out, axis)
    return [out]


@register("ArgMin")
def op_argmin(node, vals, ctx):
    (x,) = vals
    axis = node.attrs.get("axis", 0)
    keepdims = bool(node.attrs.get("keepdims", 1))
    out = jnp.argmin(jnp.asarray(x), axis=axis).astype(jnp.int32)
    if keepdims:
        out = jnp.expand_dims(out, axis)
    return [out]


@register("TopK")
def op_topk(node, vals, ctx):
    x = jnp.asarray(vals[0])
    k = int(np.asarray(vals[1]).reshape(-1)[0])
    axis = node.attrs.get("axis", -1)
    largest = node.attrs.get("largest", 1)
    x_m = jnp.moveaxis(x, axis, -1)
    if largest:
        v, i = lax.top_k(x_m, k)
    else:
        v, i = lax.top_k(-x_m, k)
        v = -v
    return [jnp.moveaxis(v, -1, axis), jnp.moveaxis(i, -1, axis)]


# ---------------------------------------------------------------- matmul
@register("MatMul")
def op_matmul(node, vals, ctx):
    a, b = vals
    return [jnp.matmul(jnp.asarray(a), jnp.asarray(b),
                       preferred_element_type=jnp.float32)]


@register("Gemm")
def op_gemm(node, vals, ctx):
    a = jnp.asarray(vals[0])
    b = jnp.asarray(vals[1])
    alpha = node.attrs.get("alpha", 1.0)
    beta = node.attrs.get("beta", 1.0)
    if node.attrs.get("transA", 0):
        a = a.T
    if node.attrs.get("transB", 0):
        b = b.T
    out = alpha * jnp.matmul(a, b, preferred_element_type=jnp.float32)
    if len(vals) > 2 and vals[2] is not None:
        out = out + beta * jnp.asarray(vals[2])
    return [out]


@register("Einsum")
def op_einsum(node, vals, ctx):
    eq = node.attrs["equation"]
    return [jnp.einsum(eq, *[jnp.asarray(v) for v in vals],
                       preferred_element_type=jnp.float32)]


# ---------------------------------------------------------------- conv/pool
def _conv_padding(node, spatial: int, in_shape, k_shape, strides, dilations):
    auto_pad = node.attrs.get("auto_pad", "NOTSET")
    if isinstance(auto_pad, bytes):
        auto_pad = auto_pad.decode()
    pads = _np_int_list(node.attrs.get("pads")) or [0] * (2 * spatial)
    if auto_pad in ("NOTSET", "", "VALID"):
        if auto_pad == "VALID":
            return [(0, 0)] * spatial
        return [(pads[i], pads[i + spatial]) for i in range(spatial)]
    # SAME_UPPER / SAME_LOWER
    out = []
    for i in range(spatial):
        eff_k = (k_shape[i] - 1) * dilations[i] + 1
        out_dim = -(-in_shape[i] // strides[i])
        total = max(0, (out_dim - 1) * strides[i] + eff_k - in_shape[i])
        lo = total // 2
        hi = total - lo
        if auto_pad == "SAME_LOWER":
            lo, hi = hi, lo
        out.append((lo, hi))
    return out


@register("Conv")
def op_conv(node, vals, ctx):
    x = jnp.asarray(vals[0])
    w = jnp.asarray(vals[1])
    spatial = x.ndim - 2
    strides = _np_int_list(node.attrs.get("strides")) or [1] * spatial
    dilations = _np_int_list(node.attrs.get("dilations")) or [1] * spatial
    groups = node.attrs.get("group", 1)
    k_shape = w.shape[2:]
    padding = _conv_padding(node, spatial, x.shape[2:], k_shape, strides,
                            dilations)
    if spatial == 1:
        dn = ("NCH", "OIH", "NCH")
    elif spatial == 2:
        dn = ("NCHW", "OIHW", "NCHW")
    else:
        dn = ("NCDHW", "OIDHW", "NCDHW")
    out = lax.conv_general_dilated(
        x, w, window_strides=strides, padding=padding,
        rhs_dilation=dilations, dimension_numbers=dn,
        feature_group_count=groups,
        preferred_element_type=jnp.float32)
    if len(vals) > 2 and vals[2] is not None:
        b = jnp.asarray(vals[2]).reshape((1, -1) + (1,) * spatial)
        out = out + b
    return [out]


@register("ConvTranspose")
def op_conv_transpose(node, vals, ctx):
    x = jnp.asarray(vals[0])
    w = jnp.asarray(vals[1])  # ONNX: (C_in, C_out/groups, kH, kW)
    spatial = x.ndim - 2
    strides = _np_int_list(node.attrs.get("strides")) or [1] * spatial
    dilations = _np_int_list(node.attrs.get("dilations")) or [1] * spatial
    groups = node.attrs.get("group", 1)
    pads = _np_int_list(node.attrs.get("pads")) or [0] * (2 * spatial)
    out_pads = _np_int_list(node.attrs.get("output_padding")) or [0] * spatial
    if groups != 1:
        raise NotImplementedError("grouped ConvTranspose")
    k = w.shape[2:]
    # ConvTranspose == lhs-dilated conv with flipped kernel.
    w_flip = jnp.flip(w, axis=tuple(range(2, 2 + spatial)))
    w_t = jnp.swapaxes(w_flip, 0, 1)  # → (C_out, C_in, kH, kW)
    padding = [
        (dilations[i] * (k[i] - 1) - pads[i],
         dilations[i] * (k[i] - 1) - pads[i + spatial] + out_pads[i])
        for i in range(spatial)
    ]
    dn = ("NCHW", "OIHW", "NCHW") if spatial == 2 else ("NCH", "OIH", "NCH")
    out = lax.conv_general_dilated(
        x, w_t, window_strides=[1] * spatial, padding=padding,
        lhs_dilation=strides, rhs_dilation=dilations,
        dimension_numbers=dn, preferred_element_type=jnp.float32)
    if len(vals) > 2 and vals[2] is not None:
        b = jnp.asarray(vals[2]).reshape((1, -1) + (1,) * spatial)
        out = out + b
    return [out]


def _pool(node, x, reduce_fn, init, spatial):
    kernel = _np_int_list(node.attrs["kernel_shape"])
    strides = _np_int_list(node.attrs.get("strides")) or [1] * spatial
    dilations = _np_int_list(node.attrs.get("dilations")) or [1] * spatial
    padding = _conv_padding(node, spatial, x.shape[2:], kernel, strides,
                            dilations)
    if node.attrs.get("ceil_mode", 0):
        # Extend hi-padding so the last (partial) window is included.
        padding = list(padding)
        for i in range(spatial):
            eff_k = (kernel[i] - 1) * dilations[i] + 1
            size = x.shape[2 + i] + padding[i][0] + padding[i][1]
            rem = (size - eff_k) % strides[i]
            if rem:
                padding[i] = (padding[i][0],
                              padding[i][1] + strides[i] - rem)
    window = (1, 1) + tuple(kernel)
    w_strides = (1, 1) + tuple(strides)
    w_dil = (1, 1) + tuple(dilations)
    pad = ((0, 0), (0, 0)) + tuple(padding)
    return lax.reduce_window(x, init, reduce_fn, window, w_strides, pad,
                             window_dilation=w_dil)


@register("MaxPool")
def op_max_pool(node, vals, ctx):
    x = jnp.asarray(vals[0])
    spatial = x.ndim - 2
    return [_pool(node, x, lax.max, -jnp.inf, spatial)]


@register("AveragePool")
def op_average_pool(node, vals, ctx):
    x = jnp.asarray(vals[0])
    spatial = x.ndim - 2
    summed = _pool(node, x, lax.add, 0.0, spatial)
    if node.attrs.get("count_include_pad", 0):
        denom = float(np.prod(_np_int_list(node.attrs["kernel_shape"])))
        return [summed / denom]
    ones = jnp.ones(x.shape, x.dtype)
    counts = _pool(node, ones, lax.add, 0.0, spatial)
    return [summed / counts]


@register("GlobalAveragePool")
def op_global_average_pool(node, vals, ctx):
    x = jnp.asarray(vals[0])
    axes = tuple(range(2, x.ndim))
    return [jnp.mean(x, axis=axes, keepdims=True)]


@register("GlobalMaxPool")
def op_global_max_pool(node, vals, ctx):
    x = jnp.asarray(vals[0])
    axes = tuple(range(2, x.ndim))
    return [jnp.max(x, axis=axes, keepdims=True)]


# ---------------------------------------------------------------- normalization
@register("BatchNormalization")
def op_batch_norm(node, vals, ctx):
    x, scale, bias, mean, var = vals[:5]
    x = jnp.asarray(x)
    eps = node.attrs.get("epsilon", 1e-5)
    shape = (1, -1) + (1,) * (x.ndim - 2)
    scale = jnp.asarray(scale).reshape(shape)
    bias = jnp.asarray(bias).reshape(shape)
    mean = jnp.asarray(mean).reshape(shape)
    var = jnp.asarray(var).reshape(shape)
    inv = scale * lax.rsqrt(var + eps)
    return [x * inv + (bias - mean * inv)]


@register("LayerNormalization")
def op_layer_norm(node, vals, ctx):
    x = jnp.asarray(vals[0])
    scale = jnp.asarray(vals[1])
    axis = node.attrs.get("axis", -1)
    eps = node.attrs.get("epsilon", 1e-5)
    mean = jnp.mean(x, axis=axis, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=axis, keepdims=True)
    out = (x - mean) * lax.rsqrt(var + eps) * scale
    if len(vals) > 2 and vals[2] is not None:
        out = out + jnp.asarray(vals[2])
    return [out]


@register("InstanceNormalization")
def op_instance_norm(node, vals, ctx):
    x = jnp.asarray(vals[0])
    eps = node.attrs.get("epsilon", 1e-5)
    shape = (1, -1) + (1,) * (x.ndim - 2)
    scale = jnp.asarray(vals[1]).reshape(shape)
    bias = jnp.asarray(vals[2]).reshape(shape)
    axes = tuple(range(2, x.ndim))
    mean = jnp.mean(x, axis=axes, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=axes, keepdims=True)
    return [(x - mean) * lax.rsqrt(var + eps) * scale + bias]


# ---------------------------------------------------------------- resize
@register("Resize")
def op_resize(node, vals, ctx):
    x = jnp.asarray(vals[0])
    mode = node.attrs.get("mode", "nearest")
    if isinstance(mode, bytes):
        mode = mode.decode()
    coord_mode = node.attrs.get("coordinate_transformation_mode", "half_pixel")
    if isinstance(coord_mode, bytes):
        coord_mode = coord_mode.decode()
    nearest_mode = node.attrs.get("nearest_mode", "round_prefer_floor")
    if isinstance(nearest_mode, bytes):
        nearest_mode = nearest_mode.decode()

    sizes = None
    if len(vals) > 3 and vals[3] is not None and np.size(vals[3]):
        sizes = _np_int_list(vals[3])
    elif len(vals) > 2 and vals[2] is not None and np.size(vals[2]):
        scales = np.asarray(vals[2]).reshape(-1).astype(np.float64)
        sizes = [int(np.floor(d * s)) for d, s in zip(x.shape, scales)]
    elif len(vals) > 1 and vals[1] is not None and np.size(vals[1]) == x.ndim:
        # opset-10 style: second input is scales
        scales = np.asarray(vals[1]).reshape(-1).astype(np.float64)
        sizes = [int(np.floor(d * s)) for d, s in zip(x.shape, scales)]
    if sizes is None:
        raise ValueError("Resize without scales or sizes")

    in_sp = x.shape[2:]
    out_sp = sizes[2:]
    if tuple(out_sp) == tuple(in_sp):
        return [x]

    # Build per-axis source coordinates.
    def src_coords(d_out, d_in):
        i = jnp.arange(d_out, dtype=jnp.float32)
        scale = d_out / d_in
        if coord_mode == "half_pixel":
            return (i + 0.5) / scale - 0.5
        if coord_mode == "pytorch_half_pixel":
            return (i + 0.5) / scale - 0.5 if d_out > 1 else jnp.zeros_like(i)
        if coord_mode == "align_corners":
            if d_out == 1:
                return jnp.zeros_like(i)
            return i * (d_in - 1) / (d_out - 1)
        if coord_mode == "asymmetric":
            return i / scale
        raise NotImplementedError(f"coord mode {coord_mode}")

    out = x
    for ax_off, (d_in, d_out) in enumerate(zip(in_sp, out_sp)):
        axis = 2 + ax_off
        if d_in == d_out:
            continue
        coords = src_coords(d_out, d_in)
        if mode == "nearest":
            if nearest_mode == "floor":
                idx = jnp.floor(coords)
            elif nearest_mode == "ceil":
                idx = jnp.ceil(coords)
            elif nearest_mode == "round_prefer_ceil":
                idx = jnp.floor(coords + 0.5)
            else:  # round_prefer_floor
                idx = jnp.ceil(coords - 0.5)
            idx = jnp.clip(idx, 0, d_in - 1).astype(jnp.int32)
            out = jnp.take(out, idx, axis=axis)
        elif mode in ("linear", "cubic"):
            # cubic approximated as linear (close enough for prob maps;
            # exact bicubic lives in onnxocr_tpu/ops/warp.py)
            c = jnp.clip(coords, 0, d_in - 1)
            lo = jnp.floor(c).astype(jnp.int32)
            hi = jnp.minimum(lo + 1, d_in - 1)
            frac = (c - lo).reshape((1,) * axis + (-1,) +
                                    (1,) * (x.ndim - axis - 1))
            out = (jnp.take(out, lo, axis=axis) * (1 - frac) +
                   jnp.take(out, hi, axis=axis) * frac)
        else:
            raise NotImplementedError(f"Resize mode {mode}")
    return [out]


@register("Upsample")
def op_upsample(node, vals, ctx):
    return op_resize(node, vals, ctx)


@register("DepthToSpace")
def op_depth_to_space(node, vals, ctx):
    x = jnp.asarray(vals[0])
    bs = node.attrs["blocksize"]
    mode = node.attrs.get("mode", "DCR")
    n, c, h, w = x.shape
    if mode == "DCR":
        x = x.reshape(n, bs, bs, c // (bs * bs), h, w)
        x = x.transpose(0, 3, 4, 1, 5, 2)
    else:
        x = x.reshape(n, c // (bs * bs), bs, bs, h, w)
        x = x.transpose(0, 1, 4, 2, 5, 3)
    return [x.reshape(n, c // (bs * bs), h * bs, w * bs)]


# ---------------------------------------------------------------- recurrent
@register("LSTM")
def op_lstm(node, vals, ctx):
    """Opset-11 LSTM, used by the server-v2.0 CRNN recognizer head.

    Inputs: X(T,N,I), W(D,4H,I), R(D,4H,H), B(D,8H), seq_lens, init_h, init_c.
    ONNX gate order is iofc. Returns (Y(T,D,N,H), Y_h, Y_c).
    """
    X = jnp.asarray(vals[0])
    W = jnp.asarray(vals[1])
    R = jnp.asarray(vals[2])
    B = (jnp.asarray(vals[3]) if len(vals) > 3 and vals[3] is not None
         else None)
    init_h = vals[5] if len(vals) > 5 and vals[5] is not None else None
    init_c = vals[6] if len(vals) > 6 and vals[6] is not None else None
    direction = node.attrs.get("direction", "forward")
    if isinstance(direction, bytes):
        direction = direction.decode()
    hidden = node.attrs.get("hidden_size", R.shape[-1])
    T, N, _ = X.shape
    num_dir = W.shape[0]

    def run_dir(d, reverse):
        Wd, Rd = W[d], R[d]
        if B is not None:
            bd = B[d][:4 * hidden] + B[d][4 * hidden:]
        else:
            bd = jnp.zeros((4 * hidden,), X.dtype)
        h0 = (jnp.asarray(init_h)[d] if init_h is not None
              else jnp.zeros((N, hidden), X.dtype))
        c0 = (jnp.asarray(init_c)[d] if init_c is not None
              else jnp.zeros((N, hidden), X.dtype))
        xs = jnp.flip(X, 0) if reverse else X
        # Precompute input projections for the whole sequence (one big matmul
        # on the MXU instead of T small ones).
        x_proj = jnp.einsum("tni,gi->tng", xs, Wd,
                            preferred_element_type=jnp.float32) + bd

        def step(carry, xp):
            h, c = carry
            gates = xp + jnp.matmul(h, Rd.T,
                                    preferred_element_type=jnp.float32)
            i, o, f, g = jnp.split(gates, 4, axis=-1)
            i = jax.nn.sigmoid(i)
            o = jax.nn.sigmoid(o)
            f = jax.nn.sigmoid(f)
            g = jnp.tanh(g)
            c_new = f * c + i * g
            h_new = o * jnp.tanh(c_new)
            return (h_new, c_new), h_new

        (h_T, c_T), ys = lax.scan(step, (h0, c0), x_proj)
        if reverse:
            ys = jnp.flip(ys, 0)
        return ys, h_T, c_T

    if direction == "bidirectional":
        y_f, h_f, c_f = run_dir(0, False)
        y_b, h_b, c_b = run_dir(1, True)
        Y = jnp.stack([y_f, y_b], axis=1)
        Yh = jnp.stack([h_f, h_b], axis=0)
        Yc = jnp.stack([c_f, c_b], axis=0)
    else:
        reverse = direction == "reverse"
        y, h, c = run_dir(0, reverse)
        Y = y[:, None]
        Yh = h[None]
        Yc = c[None]
    return [Y, Yh, Yc]
