"""ELMo-style sentence embedding branch, TPU-native.

The reference embeds each (jieba-segmented) answer with ELMoForManyLangs'
pretrained zhs model and mean-pools the per-token 1024-d vectors
(``Classification/text_features_whole.py:16,40``), loading the model from a
hard-coded desktop path.

Here the encoder is a jitted JAX program: hashed token-id embedding ->
2-layer BiLSTM (512 per direction -> 1024-d per token, matching ELMo's
output width) -> masked mean pool.  Pretrained ELMo weights, when
available, can be converted to this parameter layout and loaded with
:func:`icassp2022_depression_tpu.train.checkpoints.load`; without them the
encoder runs with deterministic PRNG-initialised weights — a documented
stand-in (the reference's own audio embedder, NetVLAD, is genuinely
random-initialised, so downstream trainers are designed to work with
untrained embedders).

Padding correctness: the backward direction reverses each sequence by its
true length, so padded tails never contaminate valid positions.
"""

from __future__ import annotations

import dataclasses
import hashlib

import jax
import jax.numpy as jnp
import numpy as np

from icassp2022_depression_tpu.ops import rnn as rnn_ops


@dataclasses.dataclass(frozen=True)
class ElmoConfig:
    vocab_size: int = 32768      # hash buckets
    embed_dim: int = 256
    hidden: int = 512            # per direction; output = 2 * hidden = 1024
    layers: int = 2
    output_dim: int = 1024


def token_id(token: str, vocab_size: int = 32768) -> int:
    """Stable cross-run hash bucket for a token (md5, not Python hash)."""
    h = hashlib.md5(token.encode("utf-8")).digest()
    return int.from_bytes(h[:8], "little") % vocab_size


def init(key, cfg: ElmoConfig = ElmoConfig()):
    k_embed, k_rnn = jax.random.split(key)
    return {
        "embed": jax.random.normal(k_embed, (cfg.vocab_size, cfg.embed_dim))
        * (1.0 / np.sqrt(cfg.embed_dim)),
        "rnn": rnn_ops.init_params(k_rnn, "lstm", cfg.embed_dim, cfg.hidden,
                                   cfg.layers, bidirectional=True,
                                   init="torch"),
    }


def reverse_padded(x: jnp.ndarray, lengths: jnp.ndarray) -> jnp.ndarray:
    """Reverse each row's first ``lengths[b]`` positions; padding stays put."""
    b, t = x.shape[0], x.shape[1]
    pos = jnp.arange(t)[None, :]
    rev = jnp.where(pos < lengths[:, None], lengths[:, None] - 1 - pos, pos)
    return jnp.take_along_axis(
        x, rev.reshape(b, t, *([1] * (x.ndim - 2))).astype(jnp.int32), axis=1)


def encode(params, token_ids: jnp.ndarray, lengths: jnp.ndarray,
           cfg: ElmoConfig = ElmoConfig()):
    """[B, T] int token ids + [B] lengths -> per-token [B, T, 1024] and
    mean-pooled [B, 1024] sentence embeddings."""
    x = params["embed"][token_ids]                     # [B, T, E]
    y = x
    for layer in params["rnn"]:
        yf, _, _ = rnn_ops._run_direction(layer["fwd"], y, "lstm", False)
        y_rev = reverse_padded(y, lengths)
        yb, _, _ = rnn_ops._run_direction(layer["bwd"], y_rev, "lstm", False)
        yb = reverse_padded(yb, lengths)
        y = jnp.concatenate([yf, yb], axis=-1)
    mask = (jnp.arange(token_ids.shape[1])[None, :] <
            lengths[:, None]).astype(y.dtype)
    pooled = jnp.sum(y * mask[:, :, None], axis=1) / \
        jnp.maximum(jnp.sum(mask, axis=1, keepdims=True), 1.0)
    return y, pooled


encode_jit = jax.jit(encode, static_argnames=("cfg",))
