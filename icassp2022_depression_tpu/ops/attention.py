"""Additive attention with the reference's ``attention_net_with_w`` semantics.

The reference re-declares this function 13 times across files (e.g.
``Classification/text_bilstm_whole.py:74-99``); it is defined once here.

Given the (bi)RNN outputs ``lstm_out`` [B, T, 2H] and the final hidden states
``lstm_hidden`` [B, L*D, H]:

1. split ``lstm_out`` in two along features and *sum* the halves -> h [B,T,H]
   (bidirectional outputs only: a unidirectional H-sized input would halve
   to H/2 and shape-mismatch the [B, H] query in step 3 — exactly as the
   reference's code would; both in-repo callers are bidirectional);
2. query = Linear+ReLU of the summed final hidden states [B, H];
3. scores = query · tanh(h)^T, softmax over time;
4. context = scores · h  -> [B, H].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from icassp2022_depression_tpu.ops.nn import linear


def attention_net_with_w(attn_params, lstm_out, lstm_hidden):
    """attn_params: {'w': [H, H], 'b': [H]} — the attention_layer Linear."""
    half = lstm_out.shape[-1] // 2
    h = lstm_out[..., :half] + lstm_out[..., half:]          # [B, T, H]
    query = jnp.sum(lstm_hidden, axis=1)                      # [B, H]
    atten_w = jax.nn.relu(linear(attn_params, query))         # [B, H]
    m = jnp.tanh(h)
    # [B, 1, H] @ [B, H, T] -> scores [B, T]
    scores = jnp.einsum("bh,bth->bt", atten_w, m,
                        preferred_element_type=None)
    weights = jax.nn.softmax(scores, axis=-1)
    context = jnp.einsum("bt,bth->bh", weights, h,
                         preferred_element_type=None)
    return context
