"""ResNet-vd backbone (NHWC, functional) for the server-grade detector.

The reference's ch_ppocr_server_v2.0 det is a ResNet-vd DBNet export run via
onnxruntime (conversion recipe: reference onnxocr/readme.md:8-46; engine
registry app/engine.py:75-81). The -vd variant: 3x 3x3 stem convs and
avg-pool downsampling on the residual shortcut.
"""
from __future__ import annotations

from typing import Any, Dict, List, Sequence

import numpy as np
import jax.numpy as jnp

from . import common as cm

# blocks per stage and channels for resnet18-vd / resnet34-vd
DEPTHS = {18: (2, 2, 2, 2), 34: (3, 4, 6, 3)}
STAGE_CH = (64, 128, 256, 512)


def init(rng, depth: int = 18, in_ch: int = 3, dtype=jnp.float32
         ) -> Dict[str, Any]:
    depths = DEPTHS[depth]
    keys = iter(cm.split_rng(rng, 3 + 2 * sum(depths) * 2 + 8))
    p: Dict[str, Any] = {
        "stem": [
            cm.convbn_init(next(keys), 3, in_ch, 32, dtype=dtype),
            cm.convbn_init(next(keys), 3, 32, 32, dtype=dtype),
            cm.convbn_init(next(keys), 3, 32, 64, dtype=dtype),
        ],
        "stages": [],
    }
    cin = 64
    for si, (n_blocks, cout) in enumerate(zip(depths, STAGE_CH)):
        stage: List[Dict[str, Any]] = []
        for bi in range(n_blocks):
            blk: Dict[str, Any] = {
                "conv1": cm.convbn_init(next(keys), 3, cin, cout,
                                        dtype=dtype),
                "conv2": cm.convbn_init(next(keys), 3, cout, cout,
                                        dtype=dtype),
            }
            # SkipInit: zero the residual branch's final scale so every
            # block starts as identity. The BN here is an inference-style
            # learned affine (no batch statistics), and an 18-layer
            # residual stack without real normalization doesn't train from
            # scratch otherwise (round-1/2 runs plateaued).
            blk["conv2"]["bn"]["scale"] = np.zeros((cout,), dtype)
            if cin != cout:
                blk["short"] = cm.convbn_init(next(keys), 1, cin, cout,
                                              dtype=dtype)
            stage.append(blk)
            cin = cout
        p["stages"].append(stage)
    return p


def apply(params, x, depth: int = 18) -> List[jnp.ndarray]:
    """x: (N, H, W, C) → feature maps at 1/4, 1/8, 1/16, 1/32."""
    for i, s in enumerate(params["stem"]):
        x = cm.conv_bn_act(x, s, stride=(2, 2) if i == 0 else (1, 1),
                           act="relu")
    x = cm.max_pool(x, (2, 2), (2, 2))  # → 1/4 (vd stem uses 3x3 s2 pool)
    feats: List[jnp.ndarray] = []
    for si, stage in enumerate(params["stages"]):
        for bi, blk in enumerate(stage):
            stride = (2, 2) if (si > 0 and bi == 0) else (1, 1)
            short = x
            if stride != (1, 1):
                short = cm.avg_pool(short, (2, 2), (2, 2))  # vd shortcut
            if "short" in blk:
                short = cm.conv_bn_act(short, blk["short"], act="none")
            y = cm.conv_bn_act(x, blk["conv1"], stride=stride, act="relu")
            y = cm.conv_bn_act(y, blk["conv2"], act="none")
            x = jnp.maximum(y + short, 0)
        feats.append(x)
    return feats
