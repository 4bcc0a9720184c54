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


# ---------------------------------------------------------------------------
# ELMo-faithful encoder: stacked LSTM-with-projection biLM
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class ElmoLstmpConfig:
    """The zhs ELMoForManyLangs biLM geometry: 512-d token streams, 4096
    cells with 512 projections per direction, 2 layers, residual between
    layers, ±3 cell/projection clipping."""

    vocab_size: int = 32768
    input_dim: int = 512
    cell_size: int = 4096
    proj_size: int = 512
    layers: int = 2
    cell_clip: float = 3.0
    proj_clip: float = 3.0

    @property
    def output_dim(self) -> int:
        return 2 * self.proj_size


def init_lstmp_encoder(key, cfg: ElmoLstmpConfig = ElmoLstmpConfig()):
    keys = jax.random.split(key, 1 + 2 * cfg.layers)
    params = {
        "embed": jax.random.normal(keys[0], (cfg.vocab_size, cfg.input_dim))
        * (1.0 / np.sqrt(cfg.input_dim)),
        "layers": [],
    }
    for layer in range(cfg.layers):
        in_dim = cfg.input_dim if layer == 0 else cfg.proj_size
        params["layers"].append({
            "fwd": rnn_ops.init_lstmp(keys[1 + 2 * layer], in_dim,
                                      cfg.cell_size, cfg.proj_size),
            "bwd": rnn_ops.init_lstmp(keys[2 + 2 * layer], in_dim,
                                      cfg.cell_size, cfg.proj_size),
        })
    return params


def bilm_stack(layers, token_reps: jnp.ndarray, lengths: jnp.ndarray,
               direction_fn):
    """The ONE statement of the stacked-biLM composition (upstream
    ``ElmobiLm``/allennlp ``ElmoLstm`` structure): per layer, run
    ``direction_fn`` on the forward stream and on the length-reversed
    backward stream (padding stays put, so per-row validity masks carry
    over), undo the reversal, apply inter-layer residuals, average the
    ELMo layers ([emb; emb] + every LSTMP layer), masked-mean-pool.

    ``direction_fn(layer_params, name, x, layer_idx) -> (ys, aux)`` with
    ``name in ("fwd", "bwd")``; serial, stateful, and tensor-parallel
    encoders plug their per-direction recurrence in here so the
    composition is defined exactly once.

    Returns ``(rep [B, T, 2P], pooled [B, 2P], auxes)`` where ``auxes``
    collects each layer's ``(aux_fwd, aux_bwd)``.
    """
    e = token_reps
    f_in, b_in = e, e
    layer_reps = [jnp.concatenate([e, e], axis=-1)]
    auxes = []
    for idx, layer in enumerate(layers):
        f_out, aux_f = direction_fn(layer, "fwd", f_in, idx)
        b_out_rev, aux_b = direction_fn(layer, "bwd",
                                        reverse_padded(b_in, lengths), idx)
        b_out = reverse_padded(b_out_rev, lengths)
        if idx > 0:
            f_out = f_out + f_in
            b_out = b_out + b_in
        layer_reps.append(jnp.concatenate([f_out, b_out], axis=-1))
        auxes.append((aux_f, aux_b))
        f_in, b_in = f_out, b_out
    rep = sum(layer_reps) / len(layer_reps)
    mask = (jnp.arange(token_reps.shape[1])[None, :] <
            lengths[:, None]).astype(rep.dtype)
    pooled = jnp.sum(rep * mask[:, :, None], axis=1) / \
        jnp.maximum(jnp.sum(mask, axis=1, keepdims=True), 1.0)
    return rep, pooled, auxes


def encode_lstmp_from_reps(params, token_reps: jnp.ndarray,
                           lengths: jnp.ndarray,
                           cfg: ElmoLstmpConfig = ElmoLstmpConfig()):
    """Variant of :func:`encode_lstmp` that takes precomputed [B, T, 512]
    token representations (e.g. from the char-CNN token embedder,
    :mod:`.char_cnn`) instead of hashed token ids — the full
    ELMoForManyLangs pipeline with converted weights is
    ``char_cnn.embed_tokens -> encode_lstmp_from_reps``."""

    def direction(layer, name, x, idx):
        ys, _, _ = rnn_ops.lstmp_layer(layer[name], x, False,
                                       cfg.cell_clip, cfg.proj_clip)
        return ys, None

    rep, pooled, _ = bilm_stack(params["layers"], token_reps, lengths,
                                direction)
    return rep, pooled


def encode_lstmp_from_reps_stateful(params, token_reps: jnp.ndarray,
                                    lengths: jnp.ndarray,
                                    h0: jnp.ndarray, c0: jnp.ndarray,
                                    cfg: ElmoLstmpConfig = ElmoLstmpConfig()):
    """Stateful variant of :func:`encode_lstmp_from_reps` reproducing
    upstream ``ElmobiLm``'s allennlp ``_EncoderBase(stateful=True)`` state
    layout: ``h0`` [L, B, 2P] / ``c0`` [L, B, 2C] carry the per-layer
    initial states with the forward direction in the first half of the
    last axis and the backward direction in the second (allennlp
    ``ElmoLstm`` concatenates directions that way before stacking layers).

    Returns ``(rep, pooled, h_n, c_n)`` where ``h_n``/``c_n`` are each
    row's states at its last valid step (allennlp final-state semantics) in
    the same layout, ready to be carried into the next batch by
    :class:`..models.elmo_pretrained.PretrainedElmo`.
    """
    pdim, cdim = cfg.proj_size, cfg.cell_size
    valid = (jnp.arange(token_reps.shape[1])[None, :] < lengths[:, None])

    def direction(layer, name, x, idx):
        # reversed rows put each row's valid tokens at positions [0, len),
        # so the same validity mask applies to both directions; the
        # scan's init state is consumed at the row's original index
        # len-1, exactly where upstream's backward cell starts.
        off_h = 0 if name == "fwd" else pdim
        off_c = 0 if name == "fwd" else cdim
        ys, h, c = rnn_ops.lstmp_layer_stateful(
            layer[name], x, valid, h0[idx, :, off_h:off_h + pdim],
            c0[idx, :, off_c:off_c + cdim], cfg.cell_clip, cfg.proj_clip)
        return ys, (h, c)

    rep, pooled, auxes = bilm_stack(params["layers"], token_reps, lengths,
                                    direction)
    h_n = jnp.stack([jnp.concatenate([f[0], b[0]], axis=-1)
                     for f, b in auxes])
    c_n = jnp.stack([jnp.concatenate([f[1], b[1]], axis=-1)
                     for f, b in auxes])
    return rep, pooled, h_n, c_n


def zero_lstmp_states(batch: int, cfg: ElmoLstmpConfig = ElmoLstmpConfig(),
                      dtype=jnp.float32):
    """Fresh (h, c) carry for :func:`encode_lstmp_from_reps_stateful` —
    upstream's very-first-batch ``initial_states=None`` case."""
    return (jnp.zeros((cfg.layers, batch, 2 * cfg.proj_size), dtype),
            jnp.zeros((cfg.layers, batch, 2 * cfg.cell_size), dtype))


def encode_lstmp(params, token_ids: jnp.ndarray, lengths: jnp.ndarray,
                 cfg: ElmoLstmpConfig = ElmoLstmpConfig()):
    """ELMo-style encoding: forward/backward 512-d streams through stacked
    LSTMP layers with residual connections between layers (allennlp
    ``ElmoLstm`` / ELMoForManyLangs ``ElmobiLm`` structure); the returned
    per-token representation is the average of the 3 ELMo layers
    ([embedding; embedding], layer 1, layer 2) — the ``sents2elmo``
    default (``output_layer=-1``) the reference relies on
    (``Classification/text_features_whole.py:40``).

    Returns (per-token [B, T, 2P], masked mean-pooled [B, 2P]).
    """
    return encode_lstmp_from_reps(params, params["embed"][token_ids],
                                  lengths, cfg)


encode_lstmp_jit = jax.jit(encode_lstmp, static_argnames=("cfg",))


def from_elmoformanylangs(sd, cfg: ElmoLstmpConfig = ElmoLstmpConfig(),
                          word_embedding=None, embed_key=None):
    """Map an ELMoForManyLangs encoder state dict (``{name: ndarray}``)
    onto :func:`init_lstmp_encoder`'s param tree.

    Expected keys (allennlp ``LstmCellWithProjection`` naming, as vendored
    by ELMoForManyLangs' ``ElmobiLm``):

      encoder.{forward,backward}_layer_{k}.input_linearity.weight  [4C, In]
      encoder.{forward,backward}_layer_{k}.state_linearity.weight  [4C, P]
      encoder.{forward,backward}_layer_{k}.state_linearity.bias    [4C]
      encoder.{forward,backward}_layer_{k}.state_projection.weight [P, C]

    For the checkpoint's char-CNN token embedder, use
    :mod:`..models.char_cnn` (``from_elmoformanylangs_token_embedder``) and
    feed its output through :func:`encode_lstmp_from_reps`; alternatively
    pass ``word_embedding`` ([V, 512]) or ``embed_key`` to substitute an
    embedding matrix for the hashed-id path.
    """
    def cell(direction: str, k: int):
        p = f"encoder.{direction}_layer_{k}"
        return {
            "w_x": jnp.asarray(np.asarray(sd[f"{p}.input_linearity.weight"])),
            "w_h": jnp.asarray(np.asarray(sd[f"{p}.state_linearity.weight"])),
            "b": jnp.asarray(np.asarray(sd[f"{p}.state_linearity.bias"])),
            "w_p": jnp.asarray(np.asarray(sd[f"{p}.state_projection.weight"])),
        }

    if word_embedding is None and embed_key is not None:
        word_embedding = sd[embed_key]
    if word_embedding is None:
        word_embedding = (np.random.default_rng(0).standard_normal(
            (cfg.vocab_size, cfg.input_dim)) / np.sqrt(cfg.input_dim))
    return {
        "embed": jnp.asarray(np.asarray(word_embedding, np.float32)),
        "layers": [{"fwd": cell("forward", k), "bwd": cell("backward", k)}
                   for k in range(cfg.layers)],
    }
