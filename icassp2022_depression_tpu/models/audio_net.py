"""Audio branch model ("AudioBiLSTM" in the reference — actually a GRU).

Classification variant (``Classification/audio_gru_whole.py:24-108``):
LayerNorm(256) -> 2-layer unidirectional GRU(256->256, dropout 0.5) ->
mean over time -> FC head [Dropout, Linear(256,256), ReLU, Dropout,
Linear(256,2), Softmax].

Regression variant (``Regression/audio_bilstm_perm.py:45-127``): no
LayerNorm, sum over time, head ends in Linear(256,1) + ReLU.

Both variants are the same functional model parameterised by
:class:`~icassp2022_depression_tpu.config.RNNConfig` (pooling,
input_layernorm, head_activation, num_classes).

The reference model also owns an ``attention_layer`` that its forward never
uses (``audio_gru_whole.py:48-50,75-101``); the parameter block is kept for
checkpoint-shape fidelity and fusion porting (it receives zero gradients).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from icassp2022_depression_tpu.config import RNNConfig
from icassp2022_depression_tpu.ops import initializers, rnn
from icassp2022_depression_tpu.ops.nn import dropout, layer_norm, linear


def init(key, cfg: RNNConfig):
    k_rnn, k_attn, k_fc1, k_fc2 = jax.random.split(key, 4)
    # pooled width doubles for a bidirectional recurrence; the reference's
    # `bidirectional` config flag is latently broken there (its Linear head
    # keeps hidden_dims inputs and would crash) — here the head follows the
    # actual pooled width so the documented capability works
    pooled = cfg.hidden_dims * (2 if cfg.bidirectional else 1)
    params = {
        "rnn": rnn.init_params(k_rnn, cfg.cell, cfg.embedding_size,
                               cfg.hidden_dims, cfg.rnn_layers,
                               cfg.bidirectional, cfg.init),
        "attn": initializers.linear(k_attn, cfg.hidden_dims, cfg.hidden_dims,
                                    cfg.init),
        "fc1": initializers.linear(k_fc1, cfg.hidden_dims, pooled, cfg.init),
        "fc2": initializers.linear(k_fc2, cfg.num_classes, cfg.hidden_dims,
                                   cfg.init),
    }
    if cfg.input_layernorm:
        params["ln"] = initializers.layer_norm_params(cfg.embedding_size)
    return params


def features(params, cfg: RNNConfig, x, train: bool = False, key=None,
             time_mask=None):
    """Input [B, T, D] -> pooled hidden [B, H] (pre-head).

    ``time_mask`` [B, T] restricts the temporal pooling to valid steps —
    the ragged-DAIC path (variable responses per participant padded to a
    common count; padding must sit at the sequence tail)."""
    if cfg.input_layernorm:
        x = layer_norm(params["ln"], x)
    if train and key is not None:
        key, k_rnn = jax.random.split(key)
    else:
        k_rnn = None
    y, _, _ = rnn.rnn(params["rnn"], x, cfg.cell, cfg.dropout, train, k_rnn,
                      backend=cfg.rnn_backend)
    if time_mask is not None:
        m = time_mask.astype(y.dtype)[:, :, None]
        if cfg.pooling == "mean":
            return jnp.sum(y * m, axis=1) / jnp.maximum(
                jnp.sum(m, axis=1), 1.0)
        if cfg.pooling == "sum":
            return jnp.sum(y * m, axis=1)
        raise ValueError(f"unsupported audio pooling {cfg.pooling!r}")
    if cfg.pooling == "mean":
        return jnp.mean(y, axis=1)
    if cfg.pooling == "sum":
        return jnp.sum(y, axis=1)
    raise ValueError(f"unsupported audio pooling {cfg.pooling!r}")


def head(params, cfg: RNNConfig, pooled, train: bool = False, key=None):
    """FC head: [Dropout, Linear, ReLU, Dropout, Linear, softmax/relu]."""
    if train and key is not None:
        k1, k2 = jax.random.split(key)
    else:
        k1 = k2 = None
    h = pooled
    if cfg.head_input_dropout and k1 is not None:
        h = dropout(k1, h, cfg.dropout, train)
    h = jax.nn.relu(linear(params["fc1"], h))
    if k2 is not None:
        h = dropout(k2, h, cfg.dropout, train)
    out = linear(params["fc2"], h)
    if cfg.head_activation == "softmax":
        return jax.nn.softmax(out, axis=-1)
    if cfg.head_activation == "relu":
        return jax.nn.relu(out)
    return out


def apply(params, cfg: RNNConfig, x, train: bool = False, key=None,
          time_mask=None):
    """Full forward: [B, T, D] -> [B, num_classes] probs (clf) or [B, 1]
    scores (reg)."""
    if train and key is not None:
        k_feat, k_head = jax.random.split(key)
    else:
        k_feat = k_head = None
    pooled = features(params, cfg, x, train, k_feat, time_mask)
    return head(params, cfg, pooled, train, k_head)
