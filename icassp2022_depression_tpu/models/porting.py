"""Porting reference PyTorch checkpoints into this framework's params.

The reference pickles whole torch modules (``torch.save(model)``); a user
migrating from it holds ``.pt`` files whose ``state_dict()`` keys follow the
module layouts in ``Classification/audio_gru_whole.py:24-108``,
``text_bilstm_whole.py:23-114`` and ``fuse_net_whole.py:245-308``.  These
functions map such a state dict (as a ``{name: np.ndarray}`` mapping —
detach/convert on the torch side) tensor-for-tensor onto our param trees,
enabling bit-parity evaluation of reference-trained models on TPU.

Key-layout notes encoded here:

* the RNN tensors use torch's ``weight_ih_l{k}[_reverse]`` stacking, which
  is exactly our ``w_ih`` layout (gate order r,z,n / i,f,g,o);
* the FC-head Sequential indices differ per variant: heads with a leading
  Dropout expose Linears at ``.1``/``.4`` (audio both tracks, text reg),
  without it at ``.0``/``.3`` (text clf) — derived from
  ``RNNConfig.head_input_dropout``.
"""

from __future__ import annotations

from typing import Mapping

import numpy as np
import jax.numpy as jnp

from icassp2022_depression_tpu.config import FusionConfig, RNNConfig


def _np(sd: Mapping, key: str) -> jnp.ndarray:
    if key not in sd:
        raise KeyError(f"state dict missing {key!r}; have e.g. "
                       f"{sorted(sd)[:8]}")
    # Copy defensively: state-dict values are typically torch
    # ``.detach().numpy()`` VIEWS of live parameters, and jnp.asarray on CPU
    # can zero-copy alias them — later in-place torch updates would then
    # silently mutate the "ported" params.
    return jnp.asarray(np.array(sd[key], copy=True))


def rnn_from_state_dict(sd: Mapping, prefix: str, num_layers: int,
                        bidirectional: bool):
    """torch (Bi)RNN tensors ``{prefix}.weight_ih_l{k}[_reverse]`` etc.
    -> our layer-list params."""
    layers = []
    for layer in range(num_layers):
        entry = {"fwd": {
            "w_ih": _np(sd, f"{prefix}.weight_ih_l{layer}"),
            "w_hh": _np(sd, f"{prefix}.weight_hh_l{layer}"),
            "b_ih": _np(sd, f"{prefix}.bias_ih_l{layer}"),
            "b_hh": _np(sd, f"{prefix}.bias_hh_l{layer}"),
        }}
        if bidirectional:
            entry["bwd"] = {
                "w_ih": _np(sd, f"{prefix}.weight_ih_l{layer}_reverse"),
                "w_hh": _np(sd, f"{prefix}.weight_hh_l{layer}_reverse"),
                "b_ih": _np(sd, f"{prefix}.bias_ih_l{layer}_reverse"),
                "b_hh": _np(sd, f"{prefix}.bias_hh_l{layer}_reverse"),
            }
        layers.append(entry)
    return layers


def _linear(sd: Mapping, prefix: str):
    return {"w": _np(sd, f"{prefix}.weight"), "b": _np(sd, f"{prefix}.bias")}


def _head_indices(cfg: RNNConfig):
    return (1, 4) if cfg.head_input_dropout else (0, 3)


def audio_net_from_state_dict(sd: Mapping, cfg: RNNConfig):
    """AudioBiLSTM state dict -> :mod:`..models.audio_net` params.
    Keys: ``lstm_net_audio.*``, ``fc_audio.{1,4}.*``, ``attention_layer.0.*``,
    ``ln.*`` (clf only)."""
    i1, i2 = _head_indices(cfg)
    params = {
        "rnn": rnn_from_state_dict(sd, "lstm_net_audio", cfg.rnn_layers,
                                   cfg.bidirectional),
        "attn": _linear(sd, "attention_layer.0"),
        "fc1": _linear(sd, f"fc_audio.{i1}"),
        "fc2": _linear(sd, f"fc_audio.{i2}"),
    }
    if cfg.input_layernorm:
        params["ln"] = {"w": _np(sd, "ln.weight"), "b": _np(sd, "ln.bias")}
    return params


def text_net_from_state_dict(sd: Mapping, cfg: RNNConfig):
    """TextBiLSTM state dict -> :mod:`..models.text_net` params.
    Keys: ``lstm_net.*``, ``fc_out.{0,3}`` (clf) / ``fc_out.{1,4}`` (reg),
    ``attention_layer.0.*``, ``ln1/ln2`` when present."""
    i1, i2 = _head_indices(cfg)
    params = {
        "rnn": rnn_from_state_dict(sd, "lstm_net", cfg.rnn_layers,
                                   cfg.bidirectional),
        "attn": _linear(sd, "attention_layer.0"),
        "fc1": _linear(sd, f"fc_out.{i1}"),
        "fc2": _linear(sd, f"fc_out.{i2}"),
    }
    for ln in ("ln1", "ln2"):
        if f"{ln}.weight" in sd:
            params[ln] = {"w": _np(sd, f"{ln}.weight"),
                          "b": _np(sd, f"{ln}.bias")}
        else:
            dim = (cfg.embedding_size if ln == "ln1" else cfg.hidden_dims)
            params[ln] = {"w": jnp.ones((dim,)), "b": jnp.zeros((dim,))}
    return params


def fusion_from_state_dict(sd: Mapping, cfg: FusionConfig):
    """fusion_net state dict -> :mod:`..models.fusion` params.
    Keys per ``fuse_net_whole.py:245-308`` (clf; reg lacks ``ln``)."""
    params = {
        "text": {
            "attn": _linear(sd, "attention_layer.0"),
            "rnn": rnn_from_state_dict(sd, "lstm_net", cfg.rnn_layers, True),
            "fc": _linear(sd, "fc_out.1"),
        },
        "audio": {
            "rnn": rnn_from_state_dict(sd, "lstm_net_audio", cfg.rnn_layers,
                                       False),
            "fc": _linear(sd, "fc_audio.1"),
        },
        "modal_attn": {"w": _np(sd, "modal_attn.weight")},
        "fc_final": {"w": _np(sd, "fc_final.0.weight")},
    }
    if cfg.audio_layernorm:
        params["audio"]["ln"] = {"w": _np(sd, "ln.weight"),
                                 "b": _np(sd, "ln.bias")}
    return params
