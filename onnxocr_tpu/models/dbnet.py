"""DBNet text detector (NHWC, functional): MobileNetV3-large backbone +
DB FPN + differentiable-binarization head.

Reference consumes an equivalent exported graph through onnxruntime
(onnxocr/predict_det.py:94-120, output `maps`: N×1×H×W shrink-prob). Here the
forward runs as one jit program; the final sigmoid map stays NHW (no dummy
channel axis) and thresholding/scoring fuse into the same program (see
pipeline/detector.py).

The architecture follows the DB paper (arXiv:1911.08947) with PaddleOCR's
mobile config: backbone taps at 1/4, 1/8, 1/16, 1/32; FPN inner dim 96,
out dim 24 per level; head upsamples 4x back to input resolution via two
stride-2 transposed convs. When a real det.onnx is supplied, the pipeline
runs it via GraphExecutor instead (weights for this native net can be trained
with train/det_trainer.py).
"""
from __future__ import annotations

from typing import Any, Dict, List

import numpy as np
import jax
import jax.numpy as jnp

from . import common as cm
from . import mobilenetv3 as mbv3

# Blocks immediately after which spatial scale changes in LARGE_CFG
# (see mobilenetv3.LARGE_CFG strides): taps before blocks 1(1/4→), 3, 6, 12
# give features at 1/4, 1/8, 1/16; the post-`last` map is 1/32.
_TAPS = (3, 6, 12)


def init(rng, scale: float = 0.5, inner: int = 96, out: int = 24,
         backbone_arch: str = "mbv3", dtype=jnp.float32) -> Dict[str, Any]:
    keys = cm.split_rng(rng, 16)
    if backbone_arch == "resnet18":
        from . import resnet
        backbone = resnet.init(keys[0], 18, dtype=dtype)
        in_chs = list(resnet.STAGE_CH)
    else:
        backbone = mbv3.init(keys[0], "large", scale, dtype=dtype)
        cfg = mbv3.scaled_cfg(mbv3.LARGE_CFG, scale)
        tap_chs = [cfg[i - 1][2] for i in _TAPS]  # channels entering taps
        last_ch = backbone["last"]["conv"]["w"].shape[-1]
        in_chs = tap_chs + [last_ch]

    p: Dict[str, Any] = {"backbone": backbone}
    p["lateral"] = [cm.conv_init(keys[1 + i], 1, c, inner, dtype=dtype)
                    for i, c in enumerate(in_chs)]
    p["smooth"] = [cm.conv_init(keys[6 + i], 3, inner, out, dtype=dtype)
                   for i in range(4)]
    # binarize head: conv3x3 → BN+relu → convT(2x) → BN+relu → convT(2x) → σ
    p["head"] = {
        "conv": cm.convbn_init(keys[11], 3, out * 4, out, dtype=dtype),
        "up1": {"w": cm.as_rng(keys[12]).normal(0, 0.1, (2, 2, out, out)).astype(dtype),
                "b": np.zeros((out,), dtype)},
        "bn1": cm.bn_init(out, dtype),
        "up2": {"w": cm.as_rng(keys[13]).normal(0, 0.1, (2, 2, out, 1)).astype(dtype),
                "b": np.zeros((1,), dtype)},
    }
    return p


def _upsample_to(x, target):
    """Nearest-neighbor upsample to the spatial dims of `target` (powers of
    2 apart in this FPN)."""
    while x.shape[1] < target.shape[1]:
        x = cm.resize_nearest_2x(x)
    return x


def apply(params, x, scale: float = 0.5,
          backbone_arch: str = "mbv3", valid_hw=None) -> jnp.ndarray:
    """x: (N, H, W, 3) ImageNet-normalized. Returns (N, H, W) prob map.

    valid_hw = (vh (N,), vw (N,)) int32 valid extents makes the prob map
    over each page's valid region canvas-invariant: the input and every
    backbone/FPN stage are re-zeroed beyond the valid region and SE global
    pools are masked (cm.mask_valid / mobilenetv3.apply), so a padded
    bucket computes what an exact-size canvas would, up to XLA's
    per-shape reduction-order float noise (~1e-4 on the sigmoid map).
    ResNet path: not yet masked (no SE, halo-only divergence)."""
    if valid_hw is not None and backbone_arch != "resnet18":
        x = cm.mask_valid(x, valid_hw[0], valid_hw[1])
    if backbone_arch == "resnet18":
        from . import resnet
        feats = resnet.apply(params["backbone"], x, 18)
    else:
        feats = mbv3.apply(params["backbone"], x, "large", scale,
                           feature_taps=_TAPS, valid_hw=valid_hw)
    # feats: [1/4, 1/8, 1/16, 1/32] (last is post-`last` conv)
    laterals = [cm.conv2d(f, w) for f, w in zip(feats, params["lateral"])]
    # top-down pathway
    for i in range(len(laterals) - 1, 0, -1):
        laterals[i - 1] = laterals[i - 1] + _upsample_to(laterals[i],
                                                         laterals[i - 1])
    outs = [cm.conv2d(f, w) for f, w in zip(laterals, params["smooth"])]
    # bring all to 1/4 scale and concat
    base = outs[0]
    fused = jnp.concatenate([_upsample_to(o, base) for o in outs], axis=-1)
    if valid_hw is not None and backbone_arch != "resnet18":
        # smooth convs leak a 1px halo past the valid region; re-zero so
        # the head's 3x3 conv sees the exact-canvas neighborhood
        fused = cm.mask_valid(fused, (valid_hw[0] + 3) // 4,
                              (valid_hw[1] + 3) // 4)

    h = params["head"]
    y = cm.conv_bn_act(fused, h["conv"], act="relu")
    y = cm.conv_transpose2x(y, h["up1"])
    y = cm.batch_norm(y, h["bn1"])
    y = jnp.maximum(y, 0)
    y = cm.conv_transpose2x(y, h["up2"])
    return jax.nn.sigmoid(y[..., 0])
