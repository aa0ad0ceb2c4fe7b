"""Param-pytree persistence: nested dict/list trees ↔ .npz files.

Checkpoint format for native model weights (the TPU analog of the
reference's .onnx files on disk, SURVEY.md §5 checkpoint/resume): keys are
'/'-joined tree paths, values numpy arrays. float32 leaves are stored as
float16 to halve the footprint (inference parity is unaffected at the
pipeline tolerance; training restarts from float32 casts).
"""
from __future__ import annotations

import io
import os
from typing import Any, Dict

import numpy as np
import jax


def _flatten(tree, prefix="") -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}#{i}/"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def _insert(tree, parts, value):
    head = parts[0]
    if head.startswith("#"):
        idx = int(head[1:])
        while len(tree) <= idx:
            tree.append(None)
        if len(parts) == 1:
            tree[idx] = value
        else:
            if tree[idx] is None:
                tree[idx] = [] if parts[1].startswith("#") else {}
            _insert(tree[idx], parts[1:], value)
    else:
        if len(parts) == 1:
            tree[head] = value
        else:
            if head not in tree:
                tree[head] = [] if parts[1].startswith("#") else {}
            _insert(tree[head], parts[1:], value)


def save_tree(path: str, tree, compress_fp16: bool = True) -> None:
    flat = _flatten(tree)
    store = {}
    for k, v in flat.items():
        if compress_fp16 and v.dtype == np.float32:
            store[k] = v.astype(np.float16)
        else:
            store[k] = v
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez_compressed(path, **store)


def load_tree(path: str, dtype=np.float32):
    data = np.load(path)
    root: Any = None
    for k in data.files:
        parts = k.split("/")
        if root is None:
            root = [] if parts[0].startswith("#") else {}
        v = data[k]
        if v.dtype == np.float16:
            v = v.astype(dtype)
        _insert(root, parts, v)
    return root
