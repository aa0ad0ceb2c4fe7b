"""CTC decoding: device argmax/max reduce + host string assembly.

Reference: onnxocr/rec_postprocess.py — CTCLabelDecode argmaxes the (N, T, V)
probability tensor on host with numpy (:103-104), then collapses repeats and
drops the blank (index 0) while averaging kept-char max-probs (:58-86).

TPU split: the (N, T, V) tensor (V = 18385 for the v5 dict) never leaves the
device — the model call returns only (N, T) int32 argmax indices and (N, T)
float32 max-probs. String assembly (dict lookup, dedup, arabic reversal) is
irreducibly host work on ~N*T ints.
"""
from __future__ import annotations

import re
from typing import List, Optional, Sequence, Tuple

import numpy as np
import jax.numpy as jnp


def ctc_reduce(probs: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(N, T, V) probs → ((N, T) argmax int32, (N, T) max float32).
    Runs inside the recognizer's jitted forward so the vocab axis is reduced
    on device."""
    idx = jnp.argmax(probs, axis=2).astype(jnp.int32)
    prob = jnp.max(probs, axis=2)
    return idx, prob


def ctc_reduce_logits(logits: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Same, but from pre-softmax logits: argmax is softmax-invariant and the
    max prob is exp(max - logsumexp) — avoids materializing softmax."""
    idx = jnp.argmax(logits, axis=2).astype(jnp.int32)
    mx = jnp.max(logits, axis=2)
    lse = jnp.log(jnp.sum(jnp.exp(logits - mx[..., None]), axis=2)) + mx
    return idx, jnp.exp(mx - lse)


class CTCLabelDecode:
    """Host decoder with the reference's exact contract
    (rec_postprocess.py:9-113): blank prepended at index 0, optional space
    char appended, arabic reversal, dedup-then-drop-blank, mean confidence
    with the empty→[0] quirk."""

    def __init__(self, character_dict_path: Optional[str] = None,
                 use_space_char: bool = False):
        self.reverse = False
        chars: List[str] = []
        if character_dict_path is None:
            chars = list("0123456789abcdefghijklmnopqrstuvwxyz")
        else:
            with open(character_dict_path, "rb") as f:
                for line in f.readlines():
                    chars.append(line.decode("utf-8").strip("\n").strip("\r\n"))
            if use_space_char:
                chars.append(" ")
            if "arabic" in character_dict_path:
                self.reverse = True
        self.character: List[str] = ["blank"] + chars
        self.dict = {c: i for i, c in enumerate(self.character)}

    def get_ignored_tokens(self) -> List[int]:
        return [0]

    def pred_reverse(self, pred: str) -> str:
        segments: List[str] = []
        current = ""
        for ch in pred:
            if not bool(re.search("[a-zA-Z0-9 :*./%+-]", ch)):
                if current != "":
                    segments.append(current)
                segments.append(ch)
                current = ""
            else:
                current += ch
        if current != "":
            segments.append(current)
        return "".join(segments[::-1])

    def decode_indices(self, text_index: np.ndarray,
                       text_prob: Optional[np.ndarray] = None,
                       is_remove_duplicate: bool = False,
                       valid_t: Optional[Sequence[int]] = None
                       ) -> List[Tuple[str, float]]:
        """text_index/text_prob: (N, T). valid_t optionally limits each row
        to its un-padded time steps (bucket-padding mask)."""
        results: List[Tuple[str, float]] = []
        for b in range(len(text_index)):
            t_end = len(text_index[b]) if valid_t is None else int(valid_t[b])
            idx = np.asarray(text_index[b][:t_end])
            keep = np.ones(len(idx), dtype=bool)
            if is_remove_duplicate:
                keep[1:] = idx[1:] != idx[:-1]
            for ignored in self.get_ignored_tokens():
                keep &= idx != ignored
            chars = [self.character[i] for i in idx[keep]]
            if text_prob is not None:
                confs = np.asarray(text_prob[b][:t_end])[keep]
            else:
                confs = np.ones(len(idx), dtype=np.float32)[: len(keep)]
            if len(confs) == 0:
                confs = np.array([0.0])
            text = "".join(chars)
            if self.reverse:
                text = self.pred_reverse(text)
            results.append((text, float(np.mean(confs))))
        return results

    def __call__(self, preds, label=None, valid_t=None):
        """Accepts either the full (N, T, V) prob tensor (reference contract)
        or a pre-reduced ((N, T) idx, (N, T) prob) pair from ctc_reduce."""
        if isinstance(preds, (tuple, list)) and len(preds) == 2 and (
                np.ndim(preds[0]) == 2):
            idx, prob = np.asarray(preds[0]), np.asarray(preds[1])
        else:
            if isinstance(preds, (tuple, list)):
                preds = preds[-1]
            preds = np.asarray(preds)
            idx = preds.argmax(axis=2)
            prob = preds.max(axis=2)
        text = self.decode_indices(idx, prob, is_remove_duplicate=True,
                                   valid_t=valid_t)
        if label is None:
            return text
        return text, self.decode_indices(np.asarray(label))


class ClsPostProcess:
    """Angle-classifier postprocess (reference: onnxocr/cls_postprocess.py)."""

    def __init__(self, label_list=None):
        self.label_list = label_list

    def __call__(self, preds, label=None):
        label_list = self.label_list
        if label_list is None:
            label_list = {i: i for i in range(np.asarray(preds).shape[-1])}
        preds = np.asarray(preds)
        pred_idxs = preds.argmax(axis=1)
        return [(label_list[i], float(preds[n, i]))
                for n, i in enumerate(pred_idxs)]


class DistillationCTCLabelDecode(CTCLabelDecode):
    """Multi-head CTC decode (reference rec_postprocess.py:116-150)."""

    def __init__(self, character_dict_path=None, use_space_char=False,
                 model_name=("student",), key=None, multi_head=False,
                 **kwargs):
        super().__init__(character_dict_path, use_space_char)
        if not isinstance(model_name, (list, tuple)):
            model_name = [model_name]
        self.model_name = list(model_name)
        self.key = key
        self.multi_head = multi_head

    def __call__(self, preds, label=None, *args, **kwargs):
        output = {}
        for name in self.model_name:
            pred = preds[name]
            if self.key is not None:
                pred = pred[self.key]
            if self.multi_head and isinstance(pred, dict):
                pred = pred["ctc"]
            output[name] = super().__call__(pred, label=label)
        return output
