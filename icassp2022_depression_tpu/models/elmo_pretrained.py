"""Pretrained ELMoForManyLangs (zhs) pipeline: convert, load, embed.

The reference embeds each jieba-segmented answer with the released
ELMoForManyLangs zhs model and mean-pools the per-token 1024-d vectors
(``Classification/text_features_whole.py:9,16,40`` — ``Embedder(...)``,
``sents2elmo(answers)[k].mean(axis=0)``).  This module closes that path
TPU-natively:

* :func:`convert_model_dir` reads a released model directory **without the
  upstream package** — ``token_embedder.pkl``/``encoder.pkl`` are plain
  ``torch.save``-d state dicts, the lexicons are tab-separated text, and
  ``config.json`` points at the architecture config — and maps everything
  onto this package's param layout (:mod:`.char_cnn` + :mod:`.elmo`).
* :func:`save_npz` / :func:`load_npz` bundle the converted params,
  lexicons, and configs into one ``.npz`` artifact that
  ``extract-text --elmo-weights`` (and the ``ICASSP_ELMO_WEIGHTS`` env
  var) auto-loads.
* :class:`PretrainedElmo` runs the full ``sents2elmo``-equivalent forward
  as one jitted XLA program per padded batch: char-CNN token embedder →
  stacked LSTMP biLM → average of the 3 ELMo layers (``output_layer=-1``)
  → mean over the sentence's real tokens (BOS/EOS stripped).

Faithfulness notes (each mirrors upstream ``elmoformanylangs/elmo.py``):

* every sentence is wrapped in ``<bos>``/``<eos>`` tokens before encoding
  and those positions are excluded from the mean pool (``read_list`` /
  the ``data[1:lens-1]`` strip in ``sents2elmo``);
* a token longer than ``max_chars - 2`` characters is truncated to
  ``max_chars - 2`` (``read_list``);
* each token's char sequence is ``[bow, chars..., eow]`` padded with
  ``<pad>``; the ``<bos>``/``<eos>`` tokens themselves are encoded as the
  single "char" ``<bos>``/``<eos>`` between the markers;
* upstream's ``create_one_batch`` fetches the markers **swapped** —
  ``bow_id, eow_id = char_lexicon['<eow>'], char_lexicon['<bow>']`` — and
  the released models were used that way, so :func:`build_batch`
  reproduces the swap (flip ``SWAP_BOW_EOW`` if validating against a
  variant without it);
* upstream's ``ElmobiLm`` is *stateful* across batches (allennlp
  ``_EncoderBase(stateful=True)``), so its embeddings depend on corpus
  processing order.  Like the NetVLAD per-call random init that the
  framework replaces with deterministic keys, this encoder is
  deterministically zero-state per sentence **by default** — the
  documented reproducibility fix, equal to upstream's very first batch
  behaviour.  Construct with ``stateful=True`` (or flip the attribute)
  to emulate upstream batch-for-batch: sentences are length-sorted
  descending (upstream ``create_batches(sort=True)``), batched without
  row padding, and the biLM states are carried across batches *and
  across* :meth:`PretrainedElmo.embed_sentences` *calls* (the reference
  keeps one ``Embedder`` alive for the whole corpus,
  ``text_features_whole.py:16``), with allennlp's slice/expand-on-batch-
  size-change and used-rows-mask update rules
  (``_get_initial_states``/``_update_states``).  ``reset_states()``
  restores the fresh-process state.  Verified batch-for-batch against an
  independent torch oracle in ``tests/test_elmo_pretrained.py``.
"""

from __future__ import annotations

import dataclasses
import json
import os
from pathlib import Path
from typing import Dict, List, Mapping, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from icassp2022_depression_tpu.models import char_cnn, elmo

#: upstream create_one_batch reads ('<eow>', '<bow>', ...) into
#: (bow_id, eow_id, ...) — markers swapped; reproduced for fidelity.
SWAP_BOW_EOW = True

BOS, EOS, OOV, PAD, BOW, EOW = ("<bos>", "<eos>", "<oov>", "<pad>",
                                "<bow>", "<eow>")


def load_lexicon(path) -> Dict[str, int]:
    """Tab-separated ``token\\tid`` lexicon (upstream ``char.dic`` /
    ``word.dic`` format, including its full-width-space special case)."""
    lex: Dict[str, int] = {}
    with open(path, encoding="utf-8") as f:
        for line in f:
            parts = line.rstrip("\n").split("\t")
            if len(parts) == 1:  # token was the ideographic space
                parts.insert(0, "　")
            token, idx = parts[0], parts[1]
            lex[token] = int(idx)
    return lex


def build_batch(sents: Sequence[Sequence[str]],
                char_lexicon: Mapping[str, int],
                word_lexicon: Optional[Mapping[str, int]],
                max_chars: int, pad_to: Optional[int] = None):
    """Tokenised sentences -> (char_ids [B,T,C], word_ids [B,T] or None,
    lengths [B]) with BOS/EOS wrapping, upstream's truncation rule and
    char-marker conventions.  ``T`` covers the wrapped length."""
    bow_key, eow_key = (EOW, BOW) if SWAP_BOW_EOW else (BOW, EOW)
    bow = char_lexicon[bow_key]
    eow = char_lexicon[eow_key]
    cpad = char_lexicon[PAD]
    coov = char_lexicon[OOV]

    wrapped: List[List[str]] = []
    for sent in sents:
        toks = [BOS]
        for tok in sent:
            if len(tok) + 2 > max_chars:
                tok = tok[:max_chars - 2]
            toks.append(tok)
        toks.append(EOS)
        wrapped.append(toks)

    lengths = np.asarray([len(t) for t in wrapped], np.int32)
    max_t = int(pad_to if pad_to is not None else lengths.max())
    b = len(wrapped)
    char_ids = np.full((b, max_t, max_chars), cpad, np.int32)
    word_ids = None
    if word_lexicon is not None:
        woov = word_lexicon[OOV]
        wpad = word_lexicon[PAD]
        word_ids = np.full((b, max_t), wpad, np.int32)
    for i, toks in enumerate(wrapped):
        for j, tok in enumerate(toks):
            char_ids[i, j, 0] = bow
            if tok in (BOS, EOS):
                char_ids[i, j, 1] = char_lexicon[tok]
                char_ids[i, j, 2] = eow
            else:
                for k, ch in enumerate(tok):
                    char_ids[i, j, k + 1] = char_lexicon.get(ch, coov)
                char_ids[i, j, len(tok) + 1] = eow
            if word_ids is not None:
                word_ids[i, j] = word_lexicon.get(tok, woov)
    return char_ids, word_ids, lengths


def _interior_mean(rep: jnp.ndarray, lengths: jnp.ndarray) -> jnp.ndarray:
    """Mean over each row's real tokens — BOS/EOS and padding excluded
    (the ``data[1:lens-1]`` strip in upstream ``sents2elmo``)."""
    pos = jnp.arange(rep.shape[1])[None, :]
    interior = ((pos >= 1) & (pos < (lengths[:, None] - 1))).astype(rep.dtype)
    return jnp.sum(rep * interior[:, :, None], axis=1) / \
        jnp.maximum(jnp.sum(interior, axis=1, keepdims=True), 1.0)


def encode_pooled(cc_params, enc_params, char_ids, word_ids, lengths,
                  char_cfg: char_cnn.CharCnnConfig,
                  lstmp_cfg: elmo.ElmoLstmpConfig):
    """Jittable: ids -> ([B, T, 2P] 3-layer-averaged reps,
    [B, 2P] mean over real tokens — BOS/EOS and padding excluded)."""
    reps = char_cnn.embed_tokens(cc_params, char_ids, char_cfg, word_ids)
    rep, _ = elmo.encode_lstmp_from_reps(enc_params, reps, lengths,
                                         lstmp_cfg)
    return rep, _interior_mean(rep, lengths)


_encode_pooled_jit = jax.jit(encode_pooled,
                             static_argnames=("char_cfg", "lstmp_cfg"))


def encode_pooled_stateful(cc_params, enc_params, char_ids, word_ids,
                           lengths, h0, c0,
                           char_cfg: char_cnn.CharCnnConfig,
                           lstmp_cfg: elmo.ElmoLstmpConfig):
    """Stateful twin of :func:`encode_pooled`: carries/returns the biLM
    states ([L, B, 2P] / [L, B, 2C], allennlp layout) so consecutive
    batches reproduce upstream ``ElmobiLm``'s cross-batch statefulness."""
    reps = char_cnn.embed_tokens(cc_params, char_ids, char_cfg, word_ids)
    rep, _, h_n, c_n = elmo.encode_lstmp_from_reps_stateful(
        enc_params, reps, lengths, h0, c0, lstmp_cfg)
    return _interior_mean(rep, lengths), h_n, c_n


_encode_pooled_stateful_jit = jax.jit(
    encode_pooled_stateful, static_argnames=("char_cfg", "lstmp_cfg"))


@dataclasses.dataclass
class PretrainedElmo:
    char_cfg: char_cnn.CharCnnConfig
    lstmp_cfg: elmo.ElmoLstmpConfig
    cc_params: dict
    enc_params: dict
    char_lexicon: Dict[str, int]
    word_lexicon: Optional[Dict[str, int]]
    #: emulate upstream ElmobiLm's cross-batch statefulness (see module
    #: docstring); default False = the documented zero-state fix.
    stateful: bool = False
    _states: Optional[tuple] = dataclasses.field(
        default=None, init=False, repr=False, compare=False)
    #: (mesh, axis, sharded encoder params) once :meth:`enable_tp` ran
    _tp: Optional[tuple] = dataclasses.field(
        default=None, init=False, repr=False, compare=False)

    @property
    def output_dim(self) -> int:
        return self.lstmp_cfg.output_dim

    def reset_states(self) -> None:
        """Forget carried biLM states (fresh-process behaviour)."""
        self._states = None

    def enable_tp(self, mesh, axis: str = "model") -> None:
        """Run the biLM tensor-parallel over ``mesh``'s ``axis``
        (``parallel/elmo_tp.py``): encoder weights are sharded once here;
        subsequent :meth:`embed_sentences` calls use the TP program
        (stateless mode only — the stateful emulation's cross-batch state
        carry is inherently serial)."""
        if self.stateful:
            raise ValueError("tensor-parallel biLM is stateless-only "
                             "(--elmo-stateful carries cross-batch state "
                             "serially); drop one of the two flags")
        from icassp2022_depression_tpu.parallel import elmo_tp

        self._tp = (mesh, axis,
                    elmo_tp.shard_encoder_params(mesh, self.enc_params,
                                                 axis))

    def embed_sentences(self, sentences: Sequence[Sequence[str]],
                        batch_size: Optional[int] = None,
                        device: bool = False):
        """sents2elmo(output_layer=-1) + per-sentence token mean ->
        [N, 1024]; batches padded to multiples of 16 tokens so the whole
        corpus reuses a handful of compiled programs.

        Default batch: 128 stateless, not upstream's 64 — the zero-state
        mode is row-order independent (identical results at any batch
        size — ``test_batch_padding_invariance``) and the wider batch
        amortises the biLM's per-step weight stream over more sentences
        (measured +11% corpus throughput at the zhs geometry).  The
        stateful mode defaults to upstream's 64 (batch composition IS the
        semantics there); pass ``batch_size`` to match a differently-
        configured upstream ``Embedder``."""
        from icassp2022_depression_tpu.utils import hostio

        if self.stateful:
            return self._embed_sentences_stateful(sentences,
                                                  batch_size or 64,
                                                  device=device)
        batch_size = batch_size or 128
        n = len(sentences)
        pooled_chunks = []
        for start in range(0, n, batch_size):
            chunk = list(sentences[start:start + batch_size])
            real = len(chunk)
            # pad batch rows to a multiple of 8 (empty sentences: BOS/EOS
            # only) so corpora of different sizes share compiled programs
            chunk += [[]] * ((-real) % 8)
            max_t = max(2, max(len(s) for s in chunk) + 2)
            pad_to = -(-max_t // 16) * 16
            char_ids, word_ids, lengths = build_batch(
                chunk, self.char_lexicon, self.word_lexicon,
                self.char_cfg.max_chars, pad_to=pad_to)
            if self._tp is not None:
                from icassp2022_depression_tpu.parallel import elmo_tp

                mesh, axis, enc_tp = self._tp
                pooled = elmo_tp.encode_pooled_tp(
                    mesh, self.cc_params, enc_tp, jnp.asarray(char_ids),
                    None if word_ids is None else jnp.asarray(word_ids),
                    jnp.asarray(lengths), self.char_cfg, self.lstmp_cfg,
                    axis)
            else:
                _, pooled = _encode_pooled_jit(
                    self.cc_params, self.enc_params, jnp.asarray(char_ids),
                    None if word_ids is None else jnp.asarray(word_ids),
                    jnp.asarray(lengths), self.char_cfg, self.lstmp_cfg)
            pooled_chunks.append(pooled[:real])
        if device:
            # DEVICE-resident result: callers that keep embedding (or
            # accumulate across calls — the stateful extraction loop)
            # defer the blocking relay readback to ONE final gather
            return hostio.concat_device(pooled_chunks, n, self.output_dim)
        # dispatch all chunks, read back once (relay-latency-bound)
        return hostio.gather_chunks(pooled_chunks, n, self.output_dim)

    # ---------------- upstream-faithful stateful pipeline ----------------

    def _prepare_states(self, batch: int):
        """allennlp ``_EncoderBase._get_initial_states``: zeros on first
        ever batch; expand the *stored* states with zero rows when the
        batch grew (upstream mutates ``self._states``), slice a view when
        it shrank.  Sorting indices are identity here because the corpus
        is pre-sorted descending (upstream re-sorts an already-sorted
        batch)."""
        if self._states is None:
            return elmo.zero_lstmp_states(batch, self.lstmp_cfg)
        h, c = self._states
        stored = h.shape[1]
        if batch > stored:
            grow = batch - stored
            h = jnp.concatenate(
                [h, jnp.zeros((h.shape[0], grow, h.shape[2]), h.dtype)], 1)
            c = jnp.concatenate(
                [c, jnp.zeros((c.shape[0], grow, c.shape[2]), c.dtype)], 1)
            self._states = (h, c)
        return h[:, :batch], c[:, :batch]

    def _update_states(self, h_n, c_n):
        """allennlp ``_EncoderBase._update_states``: rows whose returned
        first-layer state is exactly zero are treated as unused and keep
        their old state; when the stored batch is larger than the new one
        the tail rows persist untouched (the stored batch never shrinks)."""
        if self._states is None:
            self._states = (h_n, c_n)
            return
        old_h, old_c = self._states
        stored, batch = old_h.shape[1], h_n.shape[1]
        used_h = (jnp.sum(h_n[0], -1) != 0.0)[None, :, None]
        used_c = (jnp.sum(c_n[0], -1) != 0.0)[None, :, None]
        if stored > batch:
            self._states = (
                old_h.at[:, :batch].set(
                    jnp.where(used_h, h_n, old_h[:, :batch])),
                old_c.at[:, :batch].set(
                    jnp.where(used_c, c_n, old_c[:, :batch])))
        else:  # equal: _prepare_states already grew the store if needed
            self._states = (jnp.where(used_h, h_n, old_h),
                            jnp.where(used_c, c_n, old_c))

    def _embed_sentences_stateful(self, sentences: Sequence[Sequence[str]],
                                  batch_size: int = 64,
                                  device: bool = False):
        """Upstream ``sents2elmo`` batch-for-batch: stable length-sorted
        descending order (``create_batches(..., sort=True)`` — ties keep
        corpus order), no batch-row padding (phantom rows would perturb
        the carried states), states carried across batches and calls,
        outputs restored to input order.  Each batch is one jitted XLA
        program; time is padded to multiples of 16 (masked state updates
        make trailing padding a no-op) so compile counts stay low."""
        from icassp2022_depression_tpu.utils import hostio

        n = len(sentences)
        if n == 0:
            if device:
                return jnp.zeros((0, self.output_dim), jnp.float32)
            return np.zeros((0, self.output_dim), np.float32)
        order = sorted(range(n), key=lambda i: -len(sentences[i]))
        pooled_chunks = []
        for start in range(0, n, batch_size):
            idxs = order[start:start + batch_size]
            chunk = [sentences[i] for i in idxs]
            max_t = max(2, max(len(s) for s in chunk) + 2)
            pad_to = -(-max_t // 16) * 16
            char_ids, word_ids, lengths = build_batch(
                chunk, self.char_lexicon, self.word_lexicon,
                self.char_cfg.max_chars, pad_to=pad_to)
            h0, c0 = self._prepare_states(len(chunk))
            pooled, h_n, c_n = _encode_pooled_stateful_jit(
                self.cc_params, self.enc_params, jnp.asarray(char_ids),
                None if word_ids is None else jnp.asarray(word_ids),
                jnp.asarray(lengths), h0, c0, self.char_cfg,
                self.lstmp_cfg)
            self._update_states(h_n, c_n)
            pooled_chunks.append(pooled)
        # inv[i] = this call's output row for input sentence i
        inv = np.empty(n, np.int64)
        inv[np.asarray(order)] = np.arange(n)
        if device:
            flat_d = hostio.concat_device(pooled_chunks, n, self.output_dim)
            return flat_d[jnp.asarray(inv)]   # on-device reorder
        flat = hostio.gather_chunks(pooled_chunks, n, self.output_dim)
        return flat[inv]


# ---------------------------------------------------------------------------
# Conversion from a released ELMoForManyLangs model directory
# ---------------------------------------------------------------------------


def _load_arch_config(model_dir: Path) -> dict:
    """model_dir/config.json either IS the architecture config or carries a
    ``config_path`` naming it (released zips ship both; the recorded path
    is often stale, so fall back to its basename inside model_dir)."""
    top = json.loads((model_dir / "config.json").read_text())
    if "token_embedder" in top:
        return top
    cfg_path = Path(top["config_path"])
    for cand in (model_dir / cfg_path, model_dir / cfg_path.name):
        if cand.exists():
            return json.loads(cand.read_text())
    raise FileNotFoundError(
        f"architecture config {cfg_path} not found under {model_dir}")


def convert_model_dir(model_dir) -> PretrainedElmo:
    """Released model dir (config.json, char.dic[, word.dic],
    token_embedder.pkl, encoder.pkl) -> :class:`PretrainedElmo`.

    Needs only torch (to unpickle the state dicts), not the upstream
    package.  Reference load site:
    ``Classification/text_features_whole.py:16``.
    """
    import torch

    model_dir = Path(model_dir)
    arch = _load_arch_config(model_dir)
    te_cfg = arch["token_embedder"]
    enc_cfg = arch["encoder"]

    char_lexicon = load_lexicon(model_dir / "char.dic")
    word_lexicon = None
    use_word = te_cfg.get("word_dim") and (model_dir / "word.dic").exists()
    if use_word:
        word_lexicon = load_lexicon(model_dir / "word.dic")

    te_sd = {f"token_embedder.{k}": v.detach().cpu().numpy()
             for k, v in torch.load(model_dir / "token_embedder.pkl",
                                    map_location="cpu").items()}
    enc_sd = {f"encoder.{k}": v.detach().cpu().numpy()
              for k, v in torch.load(model_dir / "encoder.pkl",
                                     map_location="cpu").items()}

    char_cfg = char_cnn.CharCnnConfig(
        n_chars=len(char_lexicon),
        char_dim=te_cfg["char_dim"],
        filters=tuple((int(w), int(c)) for w, c in te_cfg["filters"]),
        n_highway=te_cfg["n_highway"],
        output_dim=enc_cfg["projection_dim"],
        activation=te_cfg.get("activation", "relu"),
        word_vocab=len(word_lexicon) if word_lexicon else None,
        word_dim=te_cfg.get("word_dim", 0) if word_lexicon else 0,
        max_chars=te_cfg["max_characters_per_token"])
    lstmp_cfg = elmo.ElmoLstmpConfig(
        vocab_size=1,  # unused: token reps come from the char-CNN
        input_dim=enc_cfg["projection_dim"],
        cell_size=enc_cfg["dim"],
        proj_size=enc_cfg["projection_dim"],
        layers=enc_cfg["n_layers"],
        cell_clip=float(enc_cfg.get("cell_clip", 3.0)),
        proj_clip=float(enc_cfg.get("proj_clip", 3.0)))

    cc_params = char_cnn.from_elmoformanylangs_token_embedder(te_sd,
                                                              char_cfg)
    enc_params = elmo.from_elmoformanylangs(
        enc_sd, lstmp_cfg,
        word_embedding=np.zeros((1, lstmp_cfg.input_dim), np.float32))
    enc_params = {"layers": enc_params["layers"]}
    return PretrainedElmo(char_cfg, lstmp_cfg, cc_params, enc_params,
                          char_lexicon, word_lexicon)


# ---------------------------------------------------------------------------
# Single-artifact bundle
# ---------------------------------------------------------------------------


def _flatten(tree, prefix, out):
    if isinstance(tree, dict):
        for k, v in tree.items():
            _flatten(v, f"{prefix}/{k}", out)
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            _flatten(v, f"{prefix}/{i}", out)
    else:
        out[prefix] = np.asarray(tree)


def _unflatten(flat: Mapping[str, np.ndarray]):
    root: dict = {}
    for key, val in flat.items():
        parts = key.split("/")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(val)

    def listify(node):
        if not isinstance(node, dict):
            return node
        keys = list(node.keys())
        if keys and all(k.isdigit() for k in keys):
            return [listify(node[str(i)]) for i in range(len(keys))]
        return {k: listify(v) for k, v in node.items()}

    return listify(root)


def save_npz(path, pe: PretrainedElmo) -> None:
    arrays: Dict[str, np.ndarray] = {}
    _flatten(pe.cc_params, "cc", arrays)
    _flatten(pe.enc_params, "enc", arrays)
    meta = {
        "char_cfg": dataclasses.asdict(pe.char_cfg),
        "lstmp_cfg": dataclasses.asdict(pe.lstmp_cfg),
        "char_lexicon": pe.char_lexicon,
        "word_lexicon": pe.word_lexicon,
    }
    np.savez_compressed(path, __meta__=np.asarray(json.dumps(meta)),
                        **arrays)


def load_npz(path) -> PretrainedElmo:
    with np.load(path, allow_pickle=False) as z:
        meta = json.loads(str(z["__meta__"]))
        flat = {k: z[k] for k in z.files if k != "__meta__"}
    cc = {k[3:]: v for k, v in flat.items() if k.startswith("cc/")}
    enc = {k[4:]: v for k, v in flat.items() if k.startswith("enc/")}
    ccfg = dict(meta["char_cfg"])
    ccfg["filters"] = tuple(tuple(f) for f in ccfg["filters"])
    return PretrainedElmo(
        char_cfg=char_cnn.CharCnnConfig(**ccfg),
        lstmp_cfg=elmo.ElmoLstmpConfig(**meta["lstmp_cfg"]),
        cc_params=_unflatten(cc),
        enc_params=_unflatten(enc),
        char_lexicon={k: int(v) for k, v in meta["char_lexicon"].items()},
        word_lexicon=None if meta["word_lexicon"] is None else
        {k: int(v) for k, v in meta["word_lexicon"].items()})


def default_weights_path() -> Optional[Path]:
    """Resolution order for auto-loading converted weights: the
    ``ICASSP_ELMO_WEIGHTS`` env var, then ``~/.cache/icassp2022_tpu/
    elmo_zhs.npz``.  Returns None when neither exists."""
    env = os.environ.get("ICASSP_ELMO_WEIGHTS")
    if env and Path(env).exists():
        return Path(env)
    cached = Path.home() / ".cache" / "icassp2022_tpu" / "elmo_zhs.npz"
    if cached.exists():
        return cached
    return None
