"""MobileNetV3 backbone (NHWC, functional), PaddleOCR channel scheme.

Covers both uses in the model zoo:
* cls: MobileNetV3-small, scale 0.35, H-only strides — structure verified
  node-for-node against models/ppocrv5/cls/cls.onnx (53 convs, 9 SE gates,
  see SURVEY.md §2.2).
* det backbone: MobileNetV3-large, scale 0.5, square strides, feature taps
  at 1/4, 1/8, 1/16, 1/32 for the DB FPN.
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from . import common as cm

# (kernel, expand, out, use_se, act, stride)
# PaddleOCR ppocr/modeling/backbones/det_mobilenet_v3.py configs; strides for
# cls/rec variants use (2, 1) to downsample height only.
SMALL_CFG = [
    (3, 16, 16, True, "relu", (2, 1)),
    (3, 72, 24, False, "relu", (2, 1)),
    (3, 88, 24, False, "relu", (1, 1)),
    (5, 96, 40, True, "hswish", (2, 1)),
    (5, 240, 40, True, "hswish", (1, 1)),
    (5, 240, 40, True, "hswish", (1, 1)),
    (5, 120, 48, True, "hswish", (1, 1)),
    (5, 144, 48, True, "hswish", (1, 1)),
    (5, 288, 96, True, "hswish", (2, 1)),
    (5, 576, 96, True, "hswish", (1, 1)),
    (5, 576, 96, True, "hswish", (1, 1)),
]

LARGE_CFG = [
    (3, 16, 16, False, "relu", (1, 1)),
    (3, 64, 24, False, "relu", (2, 2)),
    (3, 72, 24, False, "relu", (1, 1)),
    (5, 72, 40, True, "relu", (2, 2)),
    (5, 120, 40, True, "relu", (1, 1)),
    (5, 120, 40, True, "relu", (1, 1)),
    (3, 240, 80, False, "hswish", (2, 2)),
    (3, 200, 80, False, "hswish", (1, 1)),
    (3, 184, 80, False, "hswish", (1, 1)),
    (3, 184, 80, False, "hswish", (1, 1)),
    (3, 480, 112, True, "hswish", (1, 1)),
    (3, 672, 112, True, "hswish", (1, 1)),
    (5, 672, 160, True, "hswish", (2, 2)),
    (5, 960, 160, True, "hswish", (1, 1)),
    (5, 960, 160, True, "hswish", (1, 1)),
]


def scaled_cfg(cfg, scale: float):
    out = []
    for k, exp, c, se, act, s in cfg:
        out.append((k, cm.make_divisible(exp * scale),
                    cm.make_divisible(c * scale), se, act, s))
    return out


def init(rng, cfg_name: str = "small", scale: float = 0.35,
         in_ch: int = 3, dtype=jnp.float32) -> Dict[str, Any]:
    cfg = scaled_cfg(SMALL_CFG if cfg_name == "small" else LARGE_CFG, scale)
    stem_ch = cm.make_divisible(16 * scale)
    keys = cm.split_rng(rng, 4 * len(cfg) + 2)
    ki = iter(range(len(keys)))
    params: Dict[str, Any] = {
        "stem": cm.convbn_init(keys[next(ki)], 3, in_ch, stem_ch, dtype=dtype),
        "blocks": [],
    }
    cin = stem_ch
    for k, exp, cout, se, act, s in cfg:
        blk: Dict[str, Any] = {
            "expand": cm.convbn_init(keys[next(ki)], 1, cin, exp, dtype=dtype),
            "dw": cm.convbn_init(keys[next(ki)], k, exp, exp, groups=exp,
                                 dtype=dtype),
            "project": cm.convbn_init(keys[next(ki)], 1, exp, cout,
                                      dtype=dtype),
        }
        if se:
            blk["se"] = cm.se_init(keys[next(ki)], exp, dtype=dtype)
        params["blocks"].append(blk)
        cin = cout
    last_ch = cm.make_divisible((576 if cfg_name == "small" else 960) * scale)
    params["last"] = cm.convbn_init(keys[-1], 1, cin, last_ch, dtype=dtype)
    return params


def apply(params, x, cfg_name: str = "small", scale: float = 0.35,
          feature_taps: Optional[Sequence[int]] = None, valid_hw=None):
    """Forward. x: (N, H, W, C) normalized float.

    valid_hw = (vh (N,), vw (N,)) int32 valid extents at INPUT resolution;
    when given, every SE global pool is restricted to the valid region
    (cm.se_module) so bucket padding cannot shift channel gates. The valid
    extent at a stride-s stage is ceil(v/s) (SAME convs; ceil-div composes
    across stages so one cumulative stride per SE site is exact).

    Returns the final feature map, or — when feature_taps is given — the list
    of block outputs at those indices plus the post-`last` feature (for FPN).
    """
    cfg = scaled_cfg(SMALL_CFG if cfg_name == "small" else LARGE_CFG, scale)

    def strided(sh, sw):
        if valid_hw is None:
            return None
        vh, vw = valid_hw
        return (vh + sh - 1) // sh, (vw + sw - 1) // sw

    def mask(x, sh, sw):
        # re-zero padding after every block so each spatial conv sees the
        # exact-canvas SAME-zero-pad neighborhood (cm.mask_valid docstring)
        if valid_hw is None:
            return x
        vh, vw = strided(sh, sw)
        return cm.mask_valid(x, vh, vw)

    x = cm.conv_bn_act(x, params["stem"], stride=(2, 2), act="hswish")
    sh, sw = 2, 2  # cumulative stride after the stem
    x = mask(x, sh, sw)
    feats: List[jnp.ndarray] = []
    for i, ((k, exp, cout, se, act, s), blk) in enumerate(
            zip(cfg, params["blocks"])):
        if feature_taps is not None and i in feature_taps:
            feats.append(x)
        inp = x
        y = cm.conv_bn_act(x, blk["expand"], act=act)
        y = cm.conv_bn_act(y, blk["dw"], stride=s, groups=y.shape[-1],
                           act=act)
        sh, sw = sh * s[0], sw * s[1]
        if se:
            y = cm.se_module(y, blk["se"], valid_hw=strided(sh, sw))
        y = cm.conv_bn_act(y, blk["project"], act="none")
        if s == (1, 1) and inp.shape[-1] == y.shape[-1]:
            y = y + inp
        x = mask(y, sh, sw)
    x = cm.conv_bn_act(x, params["last"], act="hswish")
    x = mask(x, sh, sw)
    if feature_taps is not None:
        feats.append(x)
        return feats
    return x
