"""NetVLAD pooling verified against an independent NumPy oracle."""

import numpy as np
import jax
import jax.numpy as jnp

from icassp2022_depression_tpu.ops import netvlad


def _oracle(p, x):
    cw = np.asarray(p["cluster_w"]); cb = np.asarray(p["cluster_b"])
    cw2 = np.asarray(p["cluster_w2"]); hw = np.asarray(p["hidden_w"])
    logits = x @ cw + cb
    e = np.exp(logits - logits.max(axis=1, keepdims=True))
    a = e / e.sum(axis=1, keepdims=True)              # [N, K]
    a_sum = a.sum(axis=0)                              # [K]
    vlad = x.T @ a                                     # [D, K]
    vlad = vlad - a_sum[None, :] * cw2[0]
    vlad = vlad / np.maximum(np.linalg.norm(vlad, axis=0, keepdims=True), 1e-12)
    flat = vlad.reshape(-1)
    flat = flat / np.maximum(np.linalg.norm(flat), 1e-12)
    return flat @ hw


def test_netvlad_matches_oracle():
    key = jax.random.PRNGKey(0)
    d, k, out = 80, 16, 256
    p = netvlad.init_params(key, d, k, out)
    x = np.random.default_rng(0).standard_normal((37, d)).astype(np.float32)
    got = np.asarray(netvlad.netvlad(p, jnp.asarray(x)))
    np.testing.assert_allclose(got, _oracle(p, x), atol=1e-4)
    assert got.shape == (out,)


def test_netvlad_mask_equals_truncation():
    key = jax.random.PRNGKey(1)
    p = netvlad.init_params(key, 8, 4, 16)
    x = np.random.default_rng(1).standard_normal((10, 8)).astype(np.float32)
    mask = np.zeros(10, dtype=np.float32)
    mask[:6] = 1.0
    full = netvlad.netvlad(p, jnp.asarray(x[:6]))
    masked = netvlad.netvlad(p, jnp.asarray(x), jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(masked), np.asarray(full), atol=1e-5)


def test_per_utterance_params_deterministic_and_distinct():
    a1 = netvlad.per_utterance_params(0, 7, 8, 4, 16)
    a2 = netvlad.per_utterance_params(0, 7, 8, 4, 16)
    b = netvlad.per_utterance_params(0, 8, 8, 4, 16)
    np.testing.assert_array_equal(np.asarray(a1["cluster_w"]),
                                  np.asarray(a2["cluster_w"]))
    assert not np.allclose(np.asarray(a1["cluster_w"]),
                           np.asarray(b["cluster_w"]))
