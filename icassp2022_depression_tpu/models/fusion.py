"""Attention/late-fusion multimodal net (``fusion_net``).

Classification variant (``Classification/fuse_net_whole.py:245-374``), with
frozen branch feature extractors and a trainable ``fc_final``:

* text branch: BiLSTM + additive attention + fc [Dropout, Linear(128,128),
  ReLU, Dropout]  (``:336-355``);
* audio branch: LayerNorm + GRU + **sum** over time + fc [Dropout,
  Linear(256,256), ReLU, Dropout]  (``:360-363``);
* head: ``fc_final`` = Linear(384 -> C, no bias) + Softmax on
  concat(text, audio) (``:303-308,368-374``); a ``modal_attn`` Linear exists
  but is commented out of the clf forward (``:370-372``).

Regression variant (``Regression/fuse_net.py:224-351``): audio branch has
no LayerNorm; forward applies ``x * sigmoid(modal_attn(x))`` before
``fc_final`` + ReLU.

Gradient-flow note (faithfully reproduced): ``pretrained_feature`` runs
under ``torch.no_grad()`` in *both* tracks (``fuse_net_whole.py:337``,
``Regression/fuse_net.py:314``), and the training loss (``MyLoss``) is
computed from those detached features and ``fc_final.weight`` directly — so
even the regression track's ``requires_grad=True`` on every param
(``Regression/fuse_net.py:578-583``) results in gradients reaching **only**
``fc_final.weight``; ``modal_attn`` appears only in ``forward`` whose output
never enters the loss.  We mirror this with ``stop_gradient`` on the branch
features.

Dropout note (also faithful): ``no_grad`` does not disable dropout, so in
train mode the frozen branches still apply their dropout masks
(``model.train()`` + ``pretrained_feature``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from icassp2022_depression_tpu.config import FusionConfig
from icassp2022_depression_tpu.ops import initializers, rnn
from icassp2022_depression_tpu.ops.attention import attention_net_with_w
from icassp2022_depression_tpu.ops.nn import dropout, layer_norm, linear


def init(key, cfg: FusionConfig):
    keys = jax.random.split(key, 7)
    params = {
        "text": {
            "attn": initializers.torch_linear(keys[0], cfg.text_hidden_dims,
                                              cfg.text_hidden_dims),
            "rnn": rnn.init_params(keys[1], "lstm", cfg.text_embed_size,
                                   cfg.text_hidden_dims, cfg.rnn_layers,
                                   bidirectional=True, init="torch"),
            "fc": initializers.torch_linear(keys[2], cfg.text_hidden_dims,
                                            cfg.text_hidden_dims),
        },
        "audio": {
            "rnn": rnn.init_params(keys[3], "gru", cfg.audio_embed_size,
                                   cfg.audio_hidden_dims, cfg.rnn_layers,
                                   bidirectional=False, init="torch"),
            "fc": initializers.torch_linear(keys[4], cfg.audio_hidden_dims,
                                            cfg.audio_hidden_dims),
        },
        "modal_attn": {
            "w": initializers.torch_linear(
                keys[5], cfg.text_hidden_dims + cfg.audio_hidden_dims,
                cfg.text_hidden_dims + cfg.audio_hidden_dims)["w"],
        },
        "fc_final": {
            "w": initializers.torch_linear(
                keys[6], cfg.num_classes,
                cfg.text_hidden_dims + cfg.audio_hidden_dims)["w"],
        },
    }
    if cfg.audio_layernorm:
        params["audio"]["ln"] = initializers.layer_norm_params(cfg.audio_embed_size)
    return params


def pretrained_feature(params, cfg: FusionConfig, x_audio, x_text,
                       train: bool = False, key=None):
    """Frozen branch forwards -> (text_feature [B,128], audio_feature [B,256]).

    Gradients are stopped (the reference's ``no_grad``); dropout still fires
    in train mode.
    """
    if train and key is not None:
        k_trnn, k_t1, k_t2, k_arnn, k_a1, k_a2 = jax.random.split(key, 6)
    else:
        k_trnn = k_t1 = k_t2 = k_arnn = k_a1 = k_a2 = None

    # text branch
    y, h_n, _ = rnn.rnn(params["text"]["rnn"], x_text, "lstm",
                        cfg.dropout, train, k_trnn,
                        backend=cfg.rnn_backend)
    ctx = attention_net_with_w(params["text"]["attn"], y, h_n)
    if k_t1 is not None:
        ctx = dropout(k_t1, ctx, cfg.dropout, train)
    tf = jax.nn.relu(linear(params["text"]["fc"], ctx))
    if k_t2 is not None:
        tf = dropout(k_t2, tf, cfg.dropout, train)

    # audio branch
    xa = x_audio
    if cfg.audio_layernorm:
        xa = layer_norm(params["audio"]["ln"], xa)
    ya, _, _ = rnn.rnn(params["audio"]["rnn"], xa, "gru",
                       cfg.dropout, train, k_arnn,
                       backend=cfg.rnn_backend)
    pooled = jnp.sum(ya, axis=1)
    if k_a1 is not None:
        pooled = dropout(k_a1, pooled, cfg.dropout, train)
    af = jax.nn.relu(linear(params["audio"]["fc"], pooled))
    if k_a2 is not None:
        af = dropout(k_a2, af, cfg.dropout, train)

    return jax.lax.stop_gradient(tf), jax.lax.stop_gradient(af)


def forward(params, cfg: FusionConfig, concat_x):
    """Head on concat(text_feature, audio_feature) [B, 384]."""
    x = concat_x
    if cfg.modal_attention:
        weights = jax.nn.sigmoid(
            jnp.dot(x, params["modal_attn"]["w"].T,
                    preferred_element_type=None))
        x = weights * x
    out = jnp.dot(x, params["fc_final"]["w"].T,
                  preferred_element_type=None)
    if cfg.head_activation == "softmax":
        return jax.nn.softmax(out, axis=-1)
    if cfg.head_activation == "relu":
        return jax.nn.relu(out)
    return out


def apply(params, cfg: FusionConfig, x_audio, x_text,
          train: bool = False, key=None):
    tf, af = pretrained_feature(params, cfg, x_audio, x_text, train, key)
    concat_x = jnp.concatenate([tf, af], axis=-1)
    return forward(params, cfg, concat_x), (tf, af)


def init_from_branches(fusion_params, cfg: FusionConfig,
                       text_params=None, audio_params=None,
                       track: str = "classification"):
    """Principled replacement for the reference's manual state-dict surgery
    (``fuse_net_whole.py:568-588``, ``Regression/fuse_net.py:559-576``).

    What the reference's ``strict=False`` loads actually transfer:

    * text: ``attention_layer`` and ``lstm_net`` always; the text fc Linear
      transfers **only in the regression track** (clf text model names it
      ``fc_out.0`` but the fusion net's is ``fc_out.1`` — key mismatch, so
      the clf fusion keeps its fresh random Linear; the reg text model's
      ``fc_out.1`` matches).  Reproduced exactly.
    * audio: the 8 GRU tensors and ``fc_audio.1`` always (``fc_audio.4`` is
      copied into the dict but has no matching key in the fusion net);
      ``ln`` only in the clf track (the reg audio model/fusion have no ln).
    * ``modal_attn`` / ``fc_final`` are untouched by the loads — they keep
      whatever ``fusion_params`` carried in (a fresh init for fold 1 /
      the reg track; the previous fold's trained values in the clf track,
      whose reference keeps one module across folds — see
      ``train/trainers.py:_run_fusion_folds``).
    """
    import copy

    p = copy.deepcopy(jax.device_get(fusion_params))
    if text_params is not None:
        p["text"]["attn"] = text_params["attn"]
        p["text"]["rnn"] = text_params["rnn"]
        if track == "regression":
            p["text"]["fc"] = text_params["fc1"]
    if audio_params is not None:
        p["audio"]["rnn"] = audio_params["rnn"]
        p["audio"]["fc"] = audio_params["fc1"]
        if track == "classification" and "ln" in audio_params and "ln" in p["audio"]:
            p["audio"]["ln"] = audio_params["ln"]
    return jax.tree_util.tree_map(jnp.asarray, p)
