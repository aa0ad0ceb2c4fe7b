"""Pallas kernels, validated in interpreter mode on CPU (compiled-mode
parity is exercised on TPU by bench/integration runs)."""
import numpy as np
import jax.numpy as jnp
import pytest

from onnxocr_tpu.ops.pallas.ctc_head import ctc_head_reduce, \
    ctc_head_reduce_batched


def _reference(x, w, b):
    logits = x @ w + b
    sm = np.exp(logits - logits.max(-1, keepdims=True))
    sm = sm / sm.sum(-1, keepdims=True)
    return logits.argmax(-1), sm.max(-1)


def test_ctc_head_reduce_matches_reference():
    rng = np.random.default_rng(0)
    M, D, V = 100, 192, 5000
    x = rng.normal(size=(M, D)).astype(np.float32)
    w = (rng.normal(size=(D, V)) * 0.1).astype(np.float32)
    b = rng.normal(size=(V,)).astype(np.float32)
    idx, prob = ctc_head_reduce(jnp.asarray(x), jnp.asarray(w),
                                jnp.asarray(b), interpret=True)
    ref_idx, ref_prob = _reference(x, w, b)
    np.testing.assert_array_equal(np.asarray(idx), ref_idx)
    np.testing.assert_allclose(np.asarray(prob), ref_prob, rtol=1e-5,
                               atol=1e-6)


def test_ctc_head_reduce_vocab_padding_never_wins():
    rng = np.random.default_rng(1)
    # V chosen so padding to the 2048 tile adds nearly a full tile
    M, D, V = 10, 64, 2049
    x = rng.normal(size=(M, D)).astype(np.float32)
    w = (rng.normal(size=(D, V)) * 0.1).astype(np.float32)
    b = rng.normal(size=(V,)).astype(np.float32)
    idx, prob = ctc_head_reduce(jnp.asarray(x), jnp.asarray(w),
                                jnp.asarray(b), interpret=True)
    assert np.asarray(idx).max() < V
    ref_idx, ref_prob = _reference(x, w, b)
    np.testing.assert_array_equal(np.asarray(idx), ref_idx)
    np.testing.assert_allclose(np.asarray(prob), ref_prob, rtol=1e-5,
                               atol=1e-6)


def test_ctc_head_batched_shape():
    rng = np.random.default_rng(2)
    N, T, D, V = 3, 40, 192, 300
    feats = rng.normal(size=(N, T, D)).astype(np.float32)
    w = (rng.normal(size=(D, V)) * 0.1).astype(np.float32)
    b = np.zeros(V, np.float32)
    idx, prob = ctc_head_reduce_batched(jnp.asarray(feats), jnp.asarray(w),
                                        jnp.asarray(b), interpret=True)
    assert idx.shape == (N, T) and prob.shape == (N, T)
    ref_idx, ref_prob = _reference(feats.reshape(-1, D), w, b)
    np.testing.assert_array_equal(np.asarray(idx).reshape(-1), ref_idx)
