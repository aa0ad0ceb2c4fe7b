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


def pick_width_bucket(desired_w: int, ladder: Sequence[int]) -> int:
    for w in ladder:
        if desired_w <= w:
            return w
    return ladder[-1]


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
