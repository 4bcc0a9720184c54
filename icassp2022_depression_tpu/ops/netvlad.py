"""NetVLAD pooling, pure JAX.

Replaces the reference's per-utterance throwaway ``loupe_keras.NetVLAD``
TF1 session (``Classification/audio_features_whole.py:57-72``) with a jitted
soft-assignment VLAD head: softmax cluster assignment (matmul), residual
aggregation (einsum), intra-normalisation, global L2, and a final projection
to ``output_dim`` — all MXU-friendly matmuls.

Parameter initialisation matches loupe's distributions
(normal, stddev 1/sqrt(feature_size) for the cluster tensors and
1/sqrt(cluster_size) for the output projection).

Reproducibility note: the reference re-initialises the cluster weights
*randomly for every utterance* and never trains them
(``audio_features_whole.py:65-71``) — its features are different on every
run.  We instead derive the PRNG key deterministically (from a config seed
and the utterance ordinal via :func:`per_utterance_params`), which preserves
the "random projection" character while making extraction reproducible.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def init_params(key, feature_size: int, cluster_size: int, output_dim: int,
                dtype=jnp.float32):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    s_in = 1.0 / jnp.sqrt(jnp.asarray(float(feature_size)))
    s_out = 1.0 / jnp.sqrt(jnp.asarray(float(cluster_size)))
    return {
        "cluster_w": jax.random.normal(k1, (feature_size, cluster_size), dtype) * s_in,
        "cluster_b": jax.random.normal(k2, (cluster_size,), dtype) * s_in,
        "cluster_w2": jax.random.normal(k3, (1, feature_size, cluster_size), dtype) * s_in,
        "hidden_w": jax.random.normal(k4, (feature_size * cluster_size, output_dim), dtype) * s_out,
    }


def netvlad(params, x: jnp.ndarray, mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """x: [N, D] frame features -> [output_dim] pooled descriptor.

    ``mask`` [N] (bool/float) excludes padded frames, enabling ragged
    batches of utterances padded to a common frame count (the DAIC frontend
    requirement — SURVEY.md §3.5).
    """
    d, k = params["cluster_w"].shape
    assign = jnp.dot(x, params["cluster_w"],
                     preferred_element_type=jnp.float32) + params["cluster_b"]
    assign = jax.nn.softmax(assign, axis=-1)                    # [N, K]
    if mask is not None:
        assign = assign * mask.astype(assign.dtype)[:, None]
    a_sum = jnp.sum(assign, axis=0, keepdims=True)              # [1, K]
    a = a_sum[None, :, :] * params["cluster_w2"]                # [1, D, K]
    # residual aggregation: [K, N] @ [N, D] -> [K, D] -> [D, K]
    vlad = jnp.einsum("nk,nd->dk", assign, x,
                      preferred_element_type=jnp.float32)
    vlad = vlad - a[0]
    # intra-normalisation over the feature axis
    vlad = vlad / jnp.maximum(jnp.linalg.norm(vlad, axis=0, keepdims=True), 1e-12)
    flat = vlad.reshape(d * k)
    flat = flat / jnp.maximum(jnp.linalg.norm(flat), 1e-12)
    return jnp.dot(flat, params["hidden_w"],
                   preferred_element_type=jnp.float32)


batched_netvlad = jax.vmap(netvlad, in_axes=(None, 0, 0))


def per_utterance_params(seed: int, ordinal: int, feature_size: int,
                         cluster_size: int, output_dim: int):
    """Deterministic replacement for the reference's fresh-random-init-per-
    utterance policy: the key is folded from (seed, ordinal)."""
    key = jax.random.fold_in(jax.random.PRNGKey(seed), ordinal)
    return init_params(key, feature_size, cluster_size, output_dim)


@functools.partial(jax.jit,
                   static_argnames=("feature_size", "cluster_size",
                                    "output_dim"))
def batched_per_utterance_params(seed, ordinals, feature_size: int,
                                 cluster_size: int, output_dim: int):
    """Stacked per-utterance params for a whole batch in one device program
    (row i == ``per_utterance_params(seed, ordinals[i], ...)``)."""
    keys = jax.vmap(lambda o: jax.random.fold_in(jax.random.PRNGKey(seed), o))(
        ordinals)
    return jax.vmap(lambda k: init_params(k, feature_size, cluster_size,
                                          output_dim))(keys)
