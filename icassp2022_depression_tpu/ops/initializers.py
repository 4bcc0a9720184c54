"""Parameter initializers reproducing the reference's init distributions.

The reference mixes two schemes:

* PyTorch *module defaults* — the audio GRU model never calls its
  ``init_weight`` (commented out at ``Classification/audio_gru_whole.py:36``),
  so it keeps ``nn.GRU``/``nn.Linear`` defaults;
* ``xavier_uniform_`` for weights + zero biases in the text model
  (``Classification/text_bilstm_whole.py:37-43``).

Matching these distributions matters for training-dynamics parity on the
tiny EATD dataset, so both are implemented here for JAX PRNG keys.

Torch defaults implemented:

* ``nn.Linear``: weight ~ U(-1/sqrt(fan_in), 1/sqrt(fan_in)) (kaiming-uniform
  with a=sqrt(5)), bias ~ U(-1/sqrt(fan_in), 1/sqrt(fan_in));
* ``nn.GRU`` / ``nn.LSTM``: every weight and bias ~ U(-1/sqrt(H), 1/sqrt(H)).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def uniform(key, shape, bound, dtype=jnp.float32):
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def torch_linear(key, out_features: int, in_features: int, dtype=jnp.float32):
    """Weight [out, in] + bias [out] with nn.Linear defaults."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(in_features)
    return {
        "w": uniform(kw, (out_features, in_features), bound, dtype),
        "b": uniform(kb, (out_features,), bound, dtype),
    }


def xavier_linear(key, out_features: int, in_features: int, dtype=jnp.float32):
    """xavier_uniform_ weight + zero bias (text-model init)."""
    bound = math.sqrt(6.0 / (in_features + out_features))
    return {
        "w": uniform(key, (out_features, in_features), bound, dtype),
        "b": jnp.zeros((out_features,), dtype),
    }


def torch_rnn_layer(key, gates: int, hidden: int, input_size: int,
                    dtype=jnp.float32):
    """One (direction of a) recurrent layer with torch RNN defaults.

    ``gates`` is 3 for GRU (r,z,n) and 4 for LSTM (i,f,g,o), matching the
    row-stacking order of torch's ``weight_ih_l{k}``.
    """
    k1, k2, k3, k4 = jax.random.split(key, 4)
    bound = 1.0 / math.sqrt(hidden)
    g = gates * hidden
    return {
        "w_ih": uniform(k1, (g, input_size), bound, dtype),
        "w_hh": uniform(k2, (g, hidden), bound, dtype),
        "b_ih": uniform(k3, (g,), bound, dtype),
        "b_hh": uniform(k4, (g,), bound, dtype),
    }


def xavier_rnn_layer(key, gates: int, hidden: int, input_size: int,
                     dtype=jnp.float32):
    """xavier_uniform_ weights + zero biases (applies xavier to the stacked
    [G*H, D] matrices exactly as torch's named_parameters loop does)."""
    k1, k2 = jax.random.split(key)
    g = gates * hidden
    bw_ih = math.sqrt(6.0 / (g + input_size))
    bw_hh = math.sqrt(6.0 / (g + hidden))
    return {
        "w_ih": uniform(k1, (g, input_size), bw_ih, dtype),
        "w_hh": uniform(k2, (g, hidden), bw_hh, dtype),
        "b_ih": jnp.zeros((g,), dtype),
        "b_hh": jnp.zeros((g,), dtype),
    }


def layer_norm_params(dim: int, dtype=jnp.float32):
    return {"w": jnp.ones((dim,), dtype), "b": jnp.zeros((dim,), dtype)}


def linear(key, out_features: int, in_features: int, init: str = "torch",
           dtype=jnp.float32):
    if init == "torch":
        return torch_linear(key, out_features, in_features, dtype)
    if init == "xavier":
        return xavier_linear(key, out_features, in_features, dtype)
    raise ValueError(f"unknown init {init!r}")


def rnn_layer(key, gates: int, hidden: int, input_size: int,
              init: str = "torch", dtype=jnp.float32):
    if init == "torch":
        return torch_rnn_layer(key, gates, hidden, input_size, dtype)
    if init == "xavier":
        return xavier_rnn_layer(key, gates, hidden, input_size, dtype)
    raise ValueError(f"unknown init {init!r}")
