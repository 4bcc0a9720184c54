"""Text branch model (TextBiLSTM).

Classification variant (``Classification/text_bilstm_whole.py:23-114``):
2-layer bidirectional LSTM(1024->128, dropout 0.5) -> additive attention
``attention_net_with_w`` over (outputs, final hidden states) -> FC head
[Linear(128,128), ReLU, Dropout, Linear(128,2), Softmax]; xavier init with
zero biases for all non-LayerNorm params (``:37-43``).

Regression variant (``Regression/text_bilstm_perm.py:58-97``): head is
[Dropout, Linear, ReLU, Dropout, Linear(128,1), ReLU].

The clf model declares ``ln1``/``ln2`` LayerNorms that its forward never
applies (commented at ``text_bilstm_whole.py:104,113``); kept for
checkpoint-shape fidelity.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from icassp2022_depression_tpu.config import RNNConfig
from icassp2022_depression_tpu.ops import initializers, rnn
from icassp2022_depression_tpu.ops.attention import attention_net_with_w
from icassp2022_depression_tpu.ops.nn import dropout, linear


def init(key, cfg: RNNConfig):
    k_rnn, k_attn, k_fc1, k_fc2 = jax.random.split(key, 4)
    params = {
        "rnn": rnn.init_params(k_rnn, cfg.cell, cfg.embedding_size,
                               cfg.hidden_dims, cfg.rnn_layers,
                               cfg.bidirectional, cfg.init),
        "attn": initializers.linear(k_attn, cfg.hidden_dims, cfg.hidden_dims,
                                    cfg.init),
        "fc1": initializers.linear(k_fc1, cfg.hidden_dims, cfg.hidden_dims,
                                   cfg.init),
        "fc2": initializers.linear(k_fc2, cfg.num_classes, cfg.hidden_dims,
                                   cfg.init),
        # declared-but-unused LayerNorms (clf model only uses them in
        # commented-out code); excluded from weight decay by the 'ln' rule
        "ln1": initializers.layer_norm_params(cfg.embedding_size),
        "ln2": initializers.layer_norm_params(cfg.hidden_dims),
    }
    return params


def features(params, cfg: RNNConfig, x, train: bool = False, key=None):
    """[B, T, D] -> attention context [B, H]."""
    if train and key is not None:
        key, k_rnn = jax.random.split(key)
    else:
        k_rnn = None
    y, h_n, _ = rnn.rnn(params["rnn"], x, cfg.cell, cfg.dropout, train, k_rnn,
                       backend=cfg.rnn_backend)
    return attention_net_with_w(params["attn"], y, h_n)


def head(params, cfg: RNNConfig, context, train: bool = False, key=None):
    if train and key is not None:
        k1, k2 = jax.random.split(key)
    else:
        k1 = k2 = None
    h = context
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


def apply(params, cfg: RNNConfig, x, train: bool = False, key=None):
    if train and key is not None:
        k_feat, k_head = jax.random.split(key)
    else:
        k_feat = k_head = None
    context = features(params, cfg, x, train, k_feat)
    return head(params, cfg, context, train, k_head)
