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


# Collapse threshold for width-masking forwards: crops at or below this
# desired width share ONE bucket (the page max) — each extra bucket is an
# extra device round trip (~25-30 ms on the tunneled link), which costs far
# more than the padding FLOPs. Wider crops keep per-bucket routing so one
# extreme line can't balloon the whole page's compute.
COLLAPSE_CAP = 960


def group_collapsed(desired_ws: Sequence[int], ladder: Sequence[int]
                    ) -> Dict[int, List[int]]:
    """Single-bucket routing for forwards whose valid-region outputs are
    bucket-invariant (RecForward.masks_width): all crops ≤ COLLAPSE_CAP run
    in one bucket sized for the widest of them; the rare wider crops fall
    back to group_by_bucket routing."""
    lo = [i for i, w in enumerate(desired_ws) if w <= COLLAPSE_CAP]
    hi = [i for i, w in enumerate(desired_ws) if w > COLLAPSE_CAP]
    groups: Dict[int, List[int]] = {}
    if lo:
        b = pick_width_bucket(max(desired_ws[i] for i in lo), ladder)
        groups[b] = lo
    for i in hi:
        b = pick_width_bucket(desired_ws[i], ladder)
        groups.setdefault(b, []).append(i)
    return groups
