"""Additive attention verified against an independent NumPy oracle built
from the documented semantics (split-sum halves, summed-hidden query,
tanh/softmax additive scores)."""

import numpy as np
import jax.numpy as jnp

from icassp2022_depression_tpu.ops import attention


def _oracle(w, b, lstm_out, lstm_hidden):
    half = lstm_out.shape[-1] // 2
    h = lstm_out[..., :half] + lstm_out[..., half:]
    q = lstm_hidden.sum(axis=1)
    aw = np.maximum(q @ w.T + b, 0.0)
    m = np.tanh(h)
    scores = np.einsum("bh,bth->bt", aw, m)
    e = np.exp(scores - scores.max(axis=1, keepdims=True))
    sm = e / e.sum(axis=1, keepdims=True)
    return np.einsum("bt,bth->bh", sm, h)


def test_attention_matches_oracle():
    rng = np.random.default_rng(0)
    b, t, hdim = 5, 3, 8
    lstm_out = rng.standard_normal((b, t, 2 * hdim)).astype(np.float32)
    lstm_hidden = rng.standard_normal((b, 4, hdim)).astype(np.float32)
    w = rng.standard_normal((hdim, hdim)).astype(np.float32)
    bias = rng.standard_normal((hdim,)).astype(np.float32)
    got = attention.attention_net_with_w(
        {"w": jnp.asarray(w), "b": jnp.asarray(bias)},
        jnp.asarray(lstm_out), jnp.asarray(lstm_hidden))
    np.testing.assert_allclose(
        np.asarray(got), _oracle(w, bias, lstm_out, lstm_hidden),
        atol=1e-5)
