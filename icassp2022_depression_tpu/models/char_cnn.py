"""Char-CNN token embedder (the ELMo ``ConvTokenEmbedder`` char branch).

ELMoForManyLangs builds each token representation from a character CNN
(char embeddings -> multi-width 1D convolutions -> max-over-positions ->
highway layers) optionally concatenated with a word embedding, projected to
the biLM input width (512 for the zhs model).  The reference consumes this
through ``sents2elmo`` (``Classification/text_features_whole.py:40``); this
module provides the TPU-native equivalent so converted checkpoints can run
the full pretrained pipeline (closing the hashed-table substitution noted
in NEXT.md).

Structure follows the allennlp encoder that ELMoForManyLangs vendors:

* conv_w: Conv1d over the character axis, kernel [out, char_dim, width];
* per filter: max over positions THEN activation;
* highway layer i: ``proj = W_i x + b_i`` (2D wide);
  ``out = sigmoid(proj[D:]) * x + (1 - sigmoid(proj[D:])) * act(proj[:D])``;
* final Linear projection to ``output_dim``.

State-dict mapping for :func:`from_elmoformanylangs_token_embedder` uses
the ``token_embedder.*`` names of ELMoForManyLangs checkpoints.
"""

from __future__ import annotations

import dataclasses
from typing import Mapping, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class CharCnnConfig:
    n_chars: int = 6784          # zhs char vocab size (model's char.dic)
    char_dim: int = 50
    #: (kernel width, out channels) pairs
    filters: Tuple[Tuple[int, int], ...] = (
        (1, 32), (2, 32), (3, 64), (4, 128), (5, 256), (6, 512), (7, 1024))
    n_highway: int = 2
    output_dim: int = 512
    activation: str = "relu"
    #: optional word-embedding branch concatenated before projection
    word_vocab: Optional[int] = None
    word_dim: int = 100
    max_chars: int = 50

    @property
    def n_filters(self) -> int:
        return sum(c for _, c in self.filters)


def init(key, cfg: CharCnnConfig = CharCnnConfig()):
    n_keys = 2 + len(cfg.filters) + cfg.n_highway + 1
    keys = jax.random.split(key, n_keys)
    params = {
        "char_emb": jax.random.normal(keys[0], (cfg.n_chars, cfg.char_dim))
        * (1.0 / np.sqrt(cfg.char_dim)),
        "convs": [],
        "highways": [],
    }
    k = 2
    for width, out in cfg.filters:
        bound = 1.0 / np.sqrt(cfg.char_dim * width)
        params["convs"].append({
            "w": jax.random.uniform(keys[k], (out, cfg.char_dim, width),
                                    minval=-bound, maxval=bound),
            "b": jnp.zeros((out,)),
        })
        k += 1
    proj_in = cfg.n_filters + (cfg.word_dim if cfg.word_vocab else 0)
    for _ in range(cfg.n_highway):
        bound = 1.0 / np.sqrt(cfg.n_filters)
        params["highways"].append({
            "w": jax.random.uniform(keys[k], (2 * cfg.n_filters,
                                              cfg.n_filters),
                                    minval=-bound, maxval=bound),
            "b": jnp.zeros((2 * cfg.n_filters,)),
        })
        k += 1
    bound = 1.0 / np.sqrt(proj_in)
    params["projection"] = {
        "w": jax.random.uniform(keys[k], (cfg.output_dim, proj_in),
                                minval=-bound, maxval=bound),
        "b": jnp.zeros((cfg.output_dim,)),
    }
    if cfg.word_vocab:
        params["word_emb"] = jax.random.normal(
            keys[1], (cfg.word_vocab, cfg.word_dim)) * (1.0 / np.sqrt(cfg.word_dim))
    return params


def _activation(name: str):
    return jax.nn.relu if name == "relu" else jnp.tanh


def embed_tokens(params, char_ids: jnp.ndarray, cfg: CharCnnConfig,
                 word_ids: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """char_ids: [B, T, C] int32 (padded char positions must use an id whose
    embedding contributes only to masked-out conv windows — conventionally a
    dedicated pad id) -> [B, T, output_dim] token representations."""
    b, t, c = char_ids.shape
    act = _activation(cfg.activation)
    x = params["char_emb"][char_ids.reshape(b * t, c)]      # [BT, C, D]
    x = jnp.swapaxes(x, 1, 2)                                # [BT, D, C]
    outs = []
    for conv in params["convs"]:
        y = jax.lax.conv_general_dilated(
            x, conv["w"], window_strides=(1,), padding="VALID",
            dimension_numbers=("NCH", "OIH", "NCH"))
        y = y + conv["b"][None, :, None]
        y = jnp.max(y, axis=-1)                              # max over pos
        outs.append(act(y))
    h = jnp.concatenate(outs, axis=-1)                       # [BT, F]
    f = cfg.n_filters
    for hw in params["highways"]:
        proj = jnp.dot(h, hw["w"].T,
                       preferred_element_type=jnp.float32) + hw["b"]
        # the highway nonlinearity is ReLU UNCONDITIONALLY (allennlp
        # Highway's default, as upstream constructs it) — only the conv
        # outputs follow cfg.activation; moot for zhs (relu) but load-
        # bearing for tanh-configured language models
        nonlinear = jax.nn.relu(proj[..., :f])
        gate = jax.nn.sigmoid(proj[..., f:])
        h = gate * h + (1.0 - gate) * nonlinear
    if word_ids is not None and "word_emb" in params:
        w = params["word_emb"][word_ids.reshape(b * t)]
        h = jnp.concatenate([h, w], axis=-1)
    out = jnp.dot(h, params["projection"]["w"].T,
                  preferred_element_type=jnp.float32) + params["projection"]["b"]
    return out.reshape(b, t, cfg.output_dim)


def from_elmoformanylangs_token_embedder(sd: Mapping,
                                         cfg: CharCnnConfig):
    """Map ELMoForManyLangs ``token_embedder.*`` tensors onto this param
    tree (best-effort name mapping; validate against the source checkpoint's
    shapes):

      token_embedder.char_emb_layer.embedding.weight   [n_chars, char_dim]
      token_embedder.word_emb_layer.embedding.weight   [V, word_dim] (opt.)
      token_embedder.convolutions.{i}.weight           [out, char_dim, w]
      token_embedder.convolutions.{i}.bias             [out]
      token_embedder.highways._layers.{i}.weight       [2F, F]
      token_embedder.highways._layers.{i}.bias         [2F]
      token_embedder.projection.weight                 [output_dim, in]
      token_embedder.projection.bias                   [output_dim]

    ELMoForManyLangs' ``ConvTokenEmbedder.forward`` concatenates the word
    embedding FIRST and the char-CNN output second before the projection;
    :func:`embed_tokens` concatenates char-first.  When the word branch is
    present the projection weight columns are reordered here so the mapped
    parameters compute the identical function.
    """
    def a(key):
        return jnp.asarray(np.array(sd[key], copy=True))

    params = {
        "char_emb": a("token_embedder.char_emb_layer.embedding.weight"),
        "convs": [
            {"w": a(f"token_embedder.convolutions.{i}.weight"),
             "b": a(f"token_embedder.convolutions.{i}.bias")}
            for i in range(len(cfg.filters))
        ],
        "highways": [
            {"w": a(f"token_embedder.highways._layers.{i}.weight"),
             "b": a(f"token_embedder.highways._layers.{i}.bias")}
            for i in range(cfg.n_highway)
        ],
        "projection": {"w": a("token_embedder.projection.weight"),
                       "b": a("token_embedder.projection.bias")},
    }
    wkey = "token_embedder.word_emb_layer.embedding.weight"
    if wkey in sd:
        params["word_emb"] = a(wkey)
        word_dim = params["word_emb"].shape[1]
        pw = params["projection"]["w"]
        if pw.shape[1] == word_dim + cfg.n_filters:
            # upstream column order [word | char] -> ours [char | word]
            params["projection"]["w"] = jnp.concatenate(
                [pw[:, word_dim:], pw[:, :word_dim]], axis=1)
    return params
