"""Text-angle classifier: MobileNetV3-small(0.35) → maxpool → GAP → fc →
softmax over ["0", "180"].

Structure mirrors models/ppocrv5/cls/cls.onnx node-for-node (verified by the
lift parity test, tests/test_native_models.py); the reference consumes it via
onnxruntime in onnxocr/predict_cls.py:44-89. Input here is NHWC (N, 48, 192,
3), normalized to [-1, 1].
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from . import common as cm
from . import mobilenetv3 as mbv3


def init(rng, num_classes: int = 2, dtype=jnp.float32) -> Dict[str, Any]:
    r1, r2 = cm.split_rng(rng, 2)
    backbone = mbv3.init(r1, "small", 0.35, dtype=dtype)
    last_ch = backbone["last"]["conv"]["w"].shape[-1]
    return {"backbone": backbone,
            "fc": cm.linear_init(r2, last_ch, num_classes, dtype=dtype)}


def apply(params, x) -> jnp.ndarray:
    """x: (N, 48, 192, 3) in [-1, 1] → (N, 2) softmax probs."""
    f = mbv3.apply(params["backbone"], x, "small", 0.35)
    f = cm.max_pool(f, (2, 2), (2, 2))
    f = jnp.mean(f, axis=(1, 2))  # GAP → (N, C)
    logits = cm.linear(f, params["fc"])
    return jax.nn.softmax(logits, axis=-1)
