"""Crop routing: width buckets + batch-size buckets.

The reference recognizes width-sorted crops in Python-loop mini-batches of 6
with a per-batch dynamic width (onnxocr/predict_rec.py:284-306) — on TPU that
would recompile constantly and underfill the MXU. Here every crop routes to a
fixed width bucket, all crops of a bucket run in ONE device call, and batch
sizes are padded up a power-of-2-ish ladder so the number of distinct
compiled shapes is small and bounded.
"""
from __future__ import annotations

import math
from typing import Dict, List, Sequence, Tuple

import numpy as np


# Crops wider than the configured ladder (aspect ratio > ~26 at the 1280
# default top) extend onto a coarse 320-px grid up to a hard cap instead of
# being horizontally compressed (the reference grows imgW unboundedly,
# predict_rec.py:295-306). The grid keeps the compiled-shape set bounded:
# at most (WIDTH_HARD_CAP - ladder_top)/WIDTH_EXTEND_STEP extra shapes.
WIDTH_EXTEND_STEP = 320
WIDTH_HARD_CAP = 3200


def pick_width_bucket(desired_w: int, ladder: Sequence[int]) -> int:
    for w in ladder:
        if desired_w <= w:
            return w
    if desired_w >= WIDTH_HARD_CAP:
        return WIDTH_HARD_CAP
    return int(math.ceil(desired_w / WIDTH_EXTEND_STEP) * WIDTH_EXTEND_STEP)


def pick_batch_bucket(n: int, ladder: Sequence[int]) -> int:
    for b in ladder:
        if n <= b:
            return b
    return ladder[-1]


def group_by_bucket(desired_ws: Sequence[int], ladder: Sequence[int]
                    ) -> Dict[int, List[int]]:
    """→ {bucket_w: [original indices]}, preserving input order per bucket."""
    groups: Dict[int, List[int]] = {}
    for i, w in enumerate(desired_ws):
        b = pick_width_bucket(w, ladder)
        groups.setdefault(b, []).append(i)
    return groups


def chunks_of(indices: List[int], max_batch: int):
    for i in range(0, len(indices), max_batch):
        yield indices[i:i + max_batch]
