"""JAX graph executor: runs an ONNX inference graph as one jit-compiled XLA
program on TPU.

This is the compatibility backend replacing the reference's onnxruntime
`InferenceSession` (reference: onnxocr/predict_base.py:7-17). Instead of an
op-by-op C++ interpreter, the whole graph is traced once per input-shape
bucket into a single XLA computation — XLA then fuses elementwise chains into
the convs/matmuls and lays tensors out for the MXU. Subsequent calls with the
same shapes hit the compile cache.

Shape-arithmetic subgraphs (Shape → Slice → Concat → Reshape, Resize scales,
etc.) are evaluated *statically* with numpy during tracing, so graphs exported
with "dynamic" dims compile to static-shape XLA programs.
"""
from __future__ import annotations

import threading
from typing import Any, Dict, List, Optional, Sequence, Union

import numpy as np
import jax
import jax.numpy as jnp

from . import ir, ops


class _Ctx:
    def __init__(self, opset: int):
        self.opset = opset


# Weights at or below this element count stay as static numpy constants so
# that shape arithmetic (Reshape targets, Slice bounds, Resize scales) remains
# concrete at trace time. Bigger tensors are passed as traced jit arguments so
# they are uploaded to HBM once and shared across shape buckets.
_STATIC_SIZE_LIMIT = 64


class GraphExecutor:
    def __init__(self, model: Union[str, ir.Model], name: str = "",
                 optimize: bool = True):
        if isinstance(model, str):
            model = ir.load_model(model)
        self.model = model
        self.name = name or model.graph.name
        self.opset = model.opset or 11
        g = model.graph

        # Fold weights: initializers plus paddle2onnx-style Constant nodes.
        weights: Dict[str, np.ndarray] = dict(g.initializers)
        self.nodes: List[ir.Node] = []
        for node in g.nodes:
            if node.op_type == "Constant":
                val = node.attrs.get("value")
                if val is None:  # value_float / value_int variants
                    for k in ("value_float", "value_int"):
                        if k in node.attrs:
                            val = np.asarray(node.attrs[k])
                if val is None:
                    raise ValueError(f"Constant {node.name} without value")
                weights[node.outputs[0]] = np.asarray(val)
            else:
                self.nodes.append(node)

        self.folded_bn = 0
        if optimize:
            from . import passes
            out_names = [vi.name for vi in g.outputs]
            self.nodes, self.folded_bn = passes.fold_batchnorm(
                self.nodes, weights, out_names)
            self.nodes = passes.eliminate_dead_nodes(self.nodes, out_names)

        self.static_weights: Dict[str, np.ndarray] = {}
        self.traced_weights: Dict[str, np.ndarray] = {}
        for k, v in weights.items():
            if v.size <= _STATIC_SIZE_LIMIT or np.issubdtype(v.dtype,
                                                             np.integer):
                self.static_weights[k] = v
            else:
                self.traced_weights[k] = np.ascontiguousarray(v)

        self.input_names = [vi.name for vi in g.inputs]
        self.output_names = [vi.name for vi in g.outputs]
        self._device_weights = None
        self._jitted: Dict[tuple, Any] = {}
        self._lock = threading.Lock()

    # -- graph interpretation (runs at trace time) -------------------------
    def _interpret(self, weights: Dict[str, Any], feeds: Dict[str, Any]):
        env: Dict[str, Any] = {}
        env.update(self.static_weights)
        env.update(weights)
        env.update(feeds)
        ctx = _Ctx(self.opset)
        for node in self.nodes:
            vals = [env[n] if n else None for n in node.inputs]
            try:
                outs = ops.get_op(node.op_type)(node, vals, ctx)
            except Exception as e:
                raise RuntimeError(
                    f"while executing {node.op_type} node {node.name!r} "
                    f"in graph {self.name!r}: {e}") from e
            for name, val in zip(node.outputs, outs):
                if name:
                    env[name] = val
        return tuple(jnp.asarray(env[n]) for n in self.output_names)

    # -- public API ---------------------------------------------------------
    def _get_device_weights(self):
        if self._device_weights is None:
            self._device_weights = {
                k: jnp.asarray(v) for k, v in self.traced_weights.items()
            }
        return self._device_weights

    def _normalize_feeds(self, feeds) -> Dict[str, np.ndarray]:
        if isinstance(feeds, dict):
            return feeds
        if isinstance(feeds, (list, tuple)):
            return dict(zip(self.input_names, feeds))
        return {self.input_names[0]: feeds}

    def __call__(self, feeds) -> List[jax.Array]:
        feeds = self._normalize_feeds(feeds)
        key = tuple(sorted(
            (k, tuple(np.shape(v)), str(np.asarray(v).dtype))
            for k, v in feeds.items()))
        fn = self._jitted.get(key)
        if fn is None:
            with self._lock:
                fn = self._jitted.get(key)
                if fn is None:
                    fn = jax.jit(self._interpret)
                    self._jitted[key] = fn
        return list(fn(self._get_device_weights(), feeds))

    # onnxruntime-session-compatible surface, so pipeline predictors can
    # treat GraphExecutor and native models uniformly.
    def run(self, output_names=None, input_feed=None) -> List[np.ndarray]:
        outs = self.__call__(input_feed)
        arrs = [np.asarray(o) for o in outs]
        if output_names is None:
            return arrs
        idx = {n: i for i, n in enumerate(self.output_names)}
        return [arrs[idx[n]] for n in output_names]

    def get_inputs(self):
        return [_IoInfo(vi) for vi in self.model.graph.inputs]

    def get_outputs(self):
        return [_IoInfo(vi) for vi in self.model.graph.outputs]


class _IoInfo:
    def __init__(self, vi: ir.ValueInfo):
        self.name = vi.name
        self.shape = vi.shape
