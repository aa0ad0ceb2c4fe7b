"""CRNN recognizer (NHWC, functional): conv backbone → BiLSTM × 2 → CTC.

The server-v2.0 recognizer family (the reference ships its dict but not the
rec.onnx, app/engine.py:76-81; when a real graph is provided it runs through
the executor's LSTM op instead). Architecture per the CRNN recipe used by
ch_ppocr_server_v2.0: strided conv stages collapse H 32→1, W→W/4 (T = W/4
timesteps), two stacked bidirectional LSTMs (hidden 256), linear to vocab.
Input here is (N, 48, W, 3) like the rest of the pipeline; the extra height
is absorbed by one more stride.
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from . import common as cm

_STAGES = (
    (64, (2, 2)),
    (128, (2, 2)),  # W → W/4 after this stage (T = W/4 timesteps)
    (256, (2, 1)),
    (256, (3, 1)),  # H: 48 → 24 → 12 → 6 → 2; remaining 2 rows averaged
)
_HIDDEN = 256


def init(rng, vocab_size: int, dtype=jnp.float32) -> Dict[str, Any]:
    keys = iter(cm.split_rng(rng, 4 + len(_STAGES) + 4 * 2 + 2))
    p: Dict[str, Any] = {"stem": cm.convbn_init(next(keys), 3, 3, 32,
                                                dtype=dtype),
                         "stages": []}
    cin = 32
    for cout, s in _STAGES:
        p["stages"].append(cm.convbn_init(next(keys), 3, cin, cout,
                                          dtype=dtype))
        cin = cout
    rng_np = cm.as_rng(next(keys))

    def lstm_init(in_dim):
        std = 1.0 / np.sqrt(_HIDDEN)
        return {
            "wi": rng_np.normal(0, std, (2, 4 * _HIDDEN, in_dim))
            .astype(dtype),
            "wh": rng_np.normal(0, std, (2, 4 * _HIDDEN, _HIDDEN))
            .astype(dtype),
            "b": np.zeros((2, 4 * _HIDDEN), dtype),
        }

    p["lstm1"] = lstm_init(cin)
    p["lstm2"] = lstm_init(2 * _HIDDEN)
    p["head"] = cm.linear_init(next(keys), 2 * _HIDDEN, vocab_size,
                               dtype=dtype)
    return p


def _bilstm(x, p):
    """x: (N, T, D) → (N, T, 2H). Input projections batched on the MXU;
    recurrence via lax.scan."""
    N, T, D = x.shape

    def run_dir(d, reverse):
        wi = p["wi"][d]
        wh = p["wh"][d]
        b = p["b"][d]
        xs = jnp.flip(x, 1) if reverse else x
        x_proj = jnp.einsum("ntd,gd->ntg", xs, wi,
                            preferred_element_type=jnp.float32) + b
        x_proj = jnp.swapaxes(x_proj, 0, 1)  # (T, N, 4H)

        def step(carry, xp):
            h, c = carry
            gates = xp + jnp.matmul(h, wh.T,
                                    preferred_element_type=jnp.float32)
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            i = jax.nn.sigmoid(i)
            f = jax.nn.sigmoid(f)
            o = jax.nn.sigmoid(o)
            g = jnp.tanh(g)
            c_new = f * c + i * g
            h_new = o * jnp.tanh(c_new)
            return (h_new, c_new), h_new

        h0 = jnp.zeros((N, _HIDDEN), x.dtype)
        c0 = jnp.zeros((N, _HIDDEN), x.dtype)
        _, ys = lax.scan(step, (h0, c0), x_proj)
        ys = jnp.swapaxes(ys, 0, 1)  # (N, T, H)
        return jnp.flip(ys, 1) if reverse else ys

    return jnp.concatenate([run_dir(0, False), run_dir(1, True)], axis=-1)


def apply(params, x) -> jnp.ndarray:
    """x: (N, 48, W, 3) in [-1,1] → (N, W//4, vocab) logits."""
    x = cm.conv_bn_act(x, params["stem"], stride=(1, 1), act="relu")
    for (cout, s), st in zip(_STAGES, params["stages"]):
        x = cm.conv_bn_act(x, st, stride=s, act="relu")
    # x: (N, 48/(2*2*2*3)=2, W/4, 256) → average remaining height
    x = jnp.mean(x, axis=1)  # (N, T, D)
    x = _bilstm(x, params["lstm1"])
    x = _bilstm(x, params["lstm2"])
    return cm.linear(x, params["head"])
