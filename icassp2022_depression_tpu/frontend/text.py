"""EATD text frontend: host tokenisation + device sentence embedding.

Reference (``Classification/text_features_whole.py:23-47``): per speaker,
per topic, read the transcript line, jieba-segment it, run
ELMoForManyLangs and mean over tokens -> 1024-d per answer; save
``whole_samples_{reg,clf}_avg.npz`` / labels.

Here tokenisation stays on host (string work), embedding runs as one
padded, jitted batch on device for the whole corpus instead of
sentence-at-a-time.  jieba is used when importable; otherwise a
CJK-aware fallback segmenter (per-character for CJK runs, whitespace for
the rest) keeps the pipeline self-contained.
"""

from __future__ import annotations

from pathlib import Path
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from icassp2022_depression_tpu.data import eatd
from icassp2022_depression_tpu.utils import hostio
from icassp2022_depression_tpu.models import elmo

try:
    import jieba  # type: ignore

    _HAS_JIEBA = True
except Exception:  # pragma: no cover
    _HAS_JIEBA = False


def _is_cjk(ch: str) -> bool:
    return "一" <= ch <= "鿿"


def fallback_segment(text: str) -> List[str]:
    """CJK chars become single tokens, latin/digit runs stay together."""
    tokens, buf = [], ""
    for ch in text.strip():
        if _is_cjk(ch):
            if buf:
                tokens.append(buf)
                buf = ""
            tokens.append(ch)
        elif ch.isspace():
            if buf:
                tokens.append(buf)
                buf = ""
        else:
            buf += ch
    if buf:
        tokens.append(buf)
    return tokens


# ---------------------------------------------------------------------------
# Pluggable segmenter registry
# ---------------------------------------------------------------------------
#
# The reference keeps its alternative Chinese segmenters as commented-out
# imports (``Classification/text_features_whole.py:30-32``: pkuseg, thulac,
# pyhanlp).  Here they are first-class: a named registry dispatched by
# ``tokenize(..., segmenter=...)`` / ``extract-text --segmenter``.  jieba and
# the CJK fallback are always available in-env; the others raise a clear
# ImportError unless their package is installed.  Third parties extend via
# :func:`register_segmenter`.


def _jieba_segment(text: str) -> List[str]:
    if not _HAS_JIEBA:
        raise ImportError("segmenter 'jieba' requested but jieba is not "
                          "installed (use --segmenter fallback)")
    return list(jieba.cut(text.strip(), cut_all=False))


def _pkuseg_segment(text: str) -> List[str]:  # pragma: no cover - optional dep
    import pkuseg  # type: ignore

    global _PKUSEG
    if "_PKUSEG" not in globals() or _PKUSEG is None:
        _PKUSEG = pkuseg.pkuseg()
    return _PKUSEG.cut(text.strip())


def _thulac_segment(text: str) -> List[str]:  # pragma: no cover - optional dep
    import thulac  # type: ignore

    global _THULAC
    if "_THULAC" not in globals() or _THULAC is None:
        _THULAC = thulac.thulac(seg_only=True)
    return [w for w, _tag in _THULAC.cut(text.strip())]


def _hanlp_segment(text: str) -> List[str]:  # pragma: no cover - optional dep
    from pyhanlp import HanLP  # type: ignore

    return [term.word for term in HanLP.segment(text.strip())]


SEGMENTERS = {
    "jieba": _jieba_segment,
    "fallback": fallback_segment,
    "pkuseg": _pkuseg_segment,
    "thulac": _thulac_segment,
    "hanlp": _hanlp_segment,
}


def register_segmenter(name: str, fn) -> None:
    """Extension point: register ``fn(text) -> list[str]`` under ``name`` so
    ``tokenize``/``extract-text --segmenter`` can dispatch to it."""
    SEGMENTERS[name] = fn


def get_segmenter(name: str):
    """Resolve a segmenter name ('auto' -> jieba when importable, else the
    CJK fallback)."""
    if name == "auto":
        return _jieba_segment if _HAS_JIEBA else fallback_segment
    try:
        return SEGMENTERS[name]
    except KeyError:
        raise ValueError(
            f"unknown segmenter {name!r}; available: "
            f"{', '.join(sorted(SEGMENTERS))} (register_segmenter to add)"
        ) from None


def tokenize(text: str, use_jieba: bool = True,
             segmenter: str = "auto") -> List[str]:
    """Segment one transcript line via the named segmenter.

    Documented parity deviation: the reference feeds the raw line —
    including its trailing newline and interior spaces — to ``jieba.cut``
    (``text_features_whole.py:29,33``), whose whitespace tokens are then
    embedded and included in the answer's mean pool.  We drop
    whitespace-only tokens for every segmenter: they carry no content, and
    their embeddings only dilute the mean (see README "Fidelity notes").

    ``use_jieba=False`` is back-compat shorthand for
    ``segmenter='fallback'`` (only honored with the default 'auto')."""
    if not use_jieba and segmenter == "auto":
        segmenter = "fallback"
    seg = get_segmenter(segmenter)
    return [t for t in seg(text) if t.strip()]


def embed_sentences(params, sentences: Sequence[List[str]],
                    cfg=elmo.ElmoConfig(),
                    batch_size: int = 512, encode=None,
                    device: bool = False):
    """Tokenised sentences -> [N, 1024] mean-pooled embeddings, batched and
    padded to a shared token length per batch.

    ``cfg`` selects the encoder: :class:`..models.elmo.ElmoConfig` (plain
    BiLSTM) or :class:`..models.elmo.ElmoLstmpConfig` (the ELMo-faithful
    stacked LSTMP biLM, required when loading ELMoForManyLangs weights).
    ``encode`` overrides the encoder callable (same signature as
    ``elmo.encode_jit``) — used by the tensor-parallel path
    (``parallel/elmo_tp.py::make_tp_encode``).
    ``device=True`` returns a DEVICE-resident array (no host readback) —
    the serving path feeds embeddings straight into the model forward.
    """
    if encode is None:
        encode = (elmo.encode_lstmp_jit
                  if isinstance(cfg, elmo.ElmoLstmpConfig)
                  else elmo.encode_jit)
    n = len(sentences)
    pooled_chunks = []
    for start in range(0, n, batch_size):
        chunk = sentences[start:start + batch_size]
        # pad token count to a multiple of 16 so corpora with slightly
        # different longest sentences reuse the same compiled program
        max_t = max(1, max(len(s) for s in chunk))
        max_t = -(-max_t // 16) * 16
        # batch rows pad to a multiple of 8 so corpora of slightly
        # different sizes share compiled programs (padded rows have
        # length 1 over zero ids; their pooled rows are sliced away)
        rows = -(-len(chunk) // 8) * 8
        ids = np.zeros((rows, max_t), np.int32)
        lengths = np.ones((rows,), np.int32)
        for i, toks in enumerate(chunk):
            for j, tok in enumerate(toks):
                ids[i, j] = elmo.token_id(tok, cfg.vocab_size)
            lengths[i] = max(1, len(toks))
        _, pooled = encode(params, jnp.asarray(ids), jnp.asarray(lengths),
                           cfg)
        pooled_chunks.append(pooled[:len(chunk)])
    if device:
        return hostio.concat_device(pooled_chunks, n, cfg.output_dim)
    # single device->host readback: dispatch is async, and the relay's
    # per-round-trip latency dwarfs the payload (utils/hostio.py)
    return hostio.gather_chunks(pooled_chunks, n, cfg.output_dim)


def make_embedder(params=None, cfg=None, seed: int = 0,
                  elmo_weights: Optional[str] = "auto",
                  with_id: bool = False, elmo_stateful: bool = False,
                  elmo_tp: int = 0):
    """Resolve the sentence embedder once -> ``(embed_fn, output_dim)``
    (plus a provenance id string with ``with_id``, recorded in extraction
    sidecars so downstream consumers can detect embedder mismatches).

    Resolution order: explicit ``params`` (+ ``cfg``) win; else a converted
    ELMoForManyLangs bundle (``elmo_weights`` path, or ``"auto"`` via
    ``ICASSP_ELMO_WEIGHTS``/the cache — see ``scripts/convert_elmo_zhs.py``);
    else a deterministic PRNG-initialised encoder (documented stand-in).
    Shared by the EATD and DAIC text frontends and the serving Predictor.

    ``elmo_stateful`` (pretrained bundle only): emulate upstream
    ``ElmobiLm``'s cross-batch statefulness instead of the default
    deterministic zero-state mode — see
    :class:`..models.elmo_pretrained.PretrainedElmo`.

    ``elmo_tp`` (N > 1): run the LSTMP biLM tensor-parallel over a pure
    model-axis mesh of the first N devices (``parallel/elmo_tp.py``) —
    results match the serial encoder up to collective reduction order.
    Applies to the pretrained bundle and to explicit/PRNG LSTMP encoders;
    the plain ``ElmoConfig`` BiLSTM has no TP layout and raises.
    """
    from icassp2022_depression_tpu.models import elmo_pretrained

    def ret(fn, dim, ident):
        return (fn, dim, ident) if with_id else (fn, dim)

    if cfg is None:
        cfg = elmo.ElmoConfig()
    tp_mesh = None
    if elmo_tp and elmo_tp > 1:
        from icassp2022_depression_tpu.parallel import elmo_tp as tp_mod

        tp_mesh = tp_mod.model_mesh(elmo_tp)

    def lstmp_tp_encode(lstmp_params, lstmp_cfg):
        from icassp2022_depression_tpu.parallel import elmo_tp as tp_mod

        if not isinstance(lstmp_cfg, elmo.ElmoLstmpConfig):
            raise ValueError(
                "--elmo-tp shards the stacked LSTMP biLM; the plain "
                "ElmoConfig BiLSTM has no tensor-parallel layout (use "
                "ElmoLstmpConfig or a converted bundle)")
        return tp_mod.make_tp_encode(tp_mesh, lstmp_params, lstmp_cfg)

    if params is not None:
        if elmo_stateful:
            raise ValueError("elmo_stateful requires a converted "
                             "ELMoForManyLangs bundle (explicit params "
                             "use the stateless encoder)")
        if tp_mesh is not None:
            # NOTE: the provenance id stays byte-identical to the serial
            # encoder's — TP is an execution strategy, not a semantic
            # change (results match serial; tests/test_elmo_tp.py), and
            # serving compares ids byte-for-byte against extraction
            # sidecars to detect feature mismatches.
            encode = lstmp_tp_encode(params, cfg)
            return ret(lambda s, **kw: embed_sentences(params, s, cfg,
                                                       encode=encode, **kw),
                       cfg.output_dim, "explicit-params")
        return ret(lambda s, **kw: embed_sentences(params, s, cfg, **kw),
                   cfg.output_dim, "explicit-params")
    found = None
    if elmo_weights == "auto":
        found = elmo_pretrained.default_weights_path()
    elif elmo_weights:
        found = Path(elmo_weights)
    if elmo_stateful and found is None:
        raise ValueError(
            "elmo_stateful emulates the pretrained upstream ElmobiLm's "
            "cross-batch state and needs a converted bundle "
            "(scripts/convert_elmo_zhs.py; set ICASSP_ELMO_WEIGHTS or "
            "pass --elmo-weights) — refusing to silently run the "
            "stateless PRNG encoder instead")
    if found is not None:
        pretrained = elmo_pretrained.load_npz(found)
        pretrained.stateful = elmo_stateful
        ident = f"elmo_bundle:{Path(found).name}:{Path(found).stat().st_size}"
        if elmo_stateful:
            ident += ":stateful"
        if tp_mesh is not None:
            pretrained.enable_tp(tp_mesh)   # id unchanged: TP == serial
        return ret(pretrained.embed_sentences, pretrained.output_dim, ident)
    if isinstance(cfg, elmo.ElmoLstmpConfig):
        params = elmo.init_lstmp_encoder(jax.random.PRNGKey(seed), cfg)
        kind = "prng-lstmp"
    else:
        params = elmo.init(jax.random.PRNGKey(seed), cfg)
        kind = "prng"
    warn_standin_encoder()
    if tp_mesh is not None:
        encode = lstmp_tp_encode(params, cfg)
        return ret(lambda s, **kw: embed_sentences(params, s, cfg,
                                                   encode=encode, **kw),
                   cfg.output_dim, f"{kind}:seed={seed}")
    return ret(lambda s, **kw: embed_sentences(params, s, cfg, **kw),
               cfg.output_dim, f"{kind}:seed={seed}")


def warn_standin_encoder() -> None:
    """Unmissable stderr notice that the hashed-token PRNG stand-in encoder
    is in use instead of converted pretrained ELMo weights.

    The reference ALWAYS embeds with the released zhs ELMoForManyLangs model
    (``Classification/text_features_whole.py:16``); features produced by the
    stand-in are internally consistent (extract/train/serve agree) but NOT
    comparable to the reference's published metrics.  Suppress with
    ``ICASSP_SUPPRESS_STANDIN_WARNING=1`` (tests)."""
    import os
    import sys

    if os.environ.get("ICASSP_SUPPRESS_STANDIN_WARNING"):
        return
    print(
        "\n".join([
            "=" * 72,
            "WARNING: no converted ELMo bundle found - using the PRNG",
            "stand-in text encoder.  Text features will be deterministic and",
            "self-consistent but NOT comparable to the reference's published",
            "metrics (it uses the pretrained zhs ELMoForManyLangs model).",
            "Convert real weights with scripts/convert_elmo_zhs.py and set",
            "ICASSP_ELMO_WEIGHTS (or pass --elmo-weights).",
            "=" * 72,
        ]),
        file=sys.stderr,
        flush=True,
    )


def extract_eatd(root: Path, params=None,
                 cfg=elmo.ElmoConfig(),
                 out_dir: Optional[Path] = None, seed: int = 0,
                 max_id: int = eatd.MAX_SPEAKER_ID,
                 sds_threshold: float = 53.0,
                 elmo_weights: Optional[str] = "auto",
                 elmo_stateful: bool = False,
                 segmenter: str = "auto", elmo_tp: int = 0):
    """Full EATD text pass -> ([N, 3, 1024] features, sds, clf labels).

    ``elmo_weights``: path to a converted ELMoForManyLangs bundle
    (``scripts/convert_elmo_zhs.py``); the default ``"auto"`` picks up
    ``ICASSP_ELMO_WEIGHTS`` / the cache location when present and falls
    back to the PRNG-initialised encoder otherwise (the reference's text
    embedder is the pretrained zhs model,
    ``Classification/text_features_whole.py:16,40``).  Passing ``params``
    explicitly always wins.
    """
    embed, dim, embedder_id = make_embedder(params, cfg, seed,
                                            elmo_weights, with_id=True,
                                            elmo_stateful=elmo_stateful,
                                            elmo_tp=elmo_tp)
    sentences: List[List[str]] = []
    sds: List[float] = []
    for sp in eatd.iter_speakers(root, max_id=max_id, read_text=True):
        assert sp.texts is not None, f"missing transcripts for {sp.number}"
        for text in sp.texts:
            sentences.append(tokenize(text, segmenter=segmenter))
        sds.append(sp.sds)
    if elmo_stateful:
        # reference granularity: ONE sents2elmo call per speaker (the 3
        # answers), biLM state carried across calls by the persistent
        # Embedder (``text_features_whole.py:16,40``) — batch composition
        # changes the carried states, so it must match call-for-call.
        # Outputs stay DEVICE-resident per call and are gathered in ONE
        # readback at the end: a blocking fetch per speaker would pay the
        # relay's ~0.45 s round-trip ~n_speakers times.
        chunks = [embed(sentences[i:i + 3], device=True)
                  for i in range(0, len(sentences), 3)]
        flat = hostio.gather_chunks(chunks, len(sentences), dim)
    else:
        flat = embed(sentences)
    from icassp2022_depression_tpu.data.eatd import eatd_targets

    n = len(sds)
    features = flat.reshape(n, 3, flat.shape[1])
    sds_targets, clf_targets = eatd_targets(sds, sds_threshold)
    if out_dir is not None:
        import json

        out_dir = Path(out_dir)
        out_dir.mkdir(parents=True, exist_ok=True)
        np.savez(out_dir / "whole_samples_reg_avg.npz", features)
        np.savez(out_dir / "whole_labels_reg_avg.npz", sds_targets)
        np.savez(out_dir / "whole_samples_clf_avg.npz", features)
        np.savez(out_dir / "whole_labels_clf_avg.npz", clf_targets)
        # provenance sidecar: which embedder produced these features
        # (models trained on them are only servable with the same one)
        (out_dir / "extraction_meta.json").write_text(json.dumps(
            {"embedder": embedder_id, "output_dim": int(flat.shape[1]),
             "seed": seed, "n_speakers": n, "segmenter": segmenter,
             "elmo_tp": elmo_tp}))
    return features, sds_targets, clf_targets


def extract_eatd_device(root: Path, params=None,
                        cfg=elmo.ElmoConfig(), seed: int = 0,
                        max_id: int = eatd.MAX_SPEAKER_ID,
                        sds_threshold: float = 53.0,
                        elmo_weights: Optional[str] = "auto",
                        segmenter: str = "auto", elmo_tp: int = 0):
    """Fused-pipeline EATD text pass: embeddings stay DEVICE-resident.

    The text twin of :func:`..audio.extract_eatd_device` (``cli train
    --corpus`` for the text tasks): host tokenisation, one batched embed
    dispatch, and the [N, 3, D] embedding array is returned as a DEVICE
    array the trainers consume directly (fold data built by on-device
    gathers) — no npz artifacts, no embedding readback.  Same
    math/resolution order as :func:`extract_eatd` in its default
    (stateless) mode; use ``extract_eatd`` for the persisted
    reference-layout files or ``elmo_stateful`` emulation.

    Returns (device features [N, 3, D], sds_targets, clf_targets,
    provenance dict — the sidecar-equivalent the caller threads into
    checkpoint meta so serving can detect embedder mismatches).
    """
    from icassp2022_depression_tpu.data.eatd import eatd_targets

    embed, dim, embedder_id = make_embedder(params, cfg, seed,
                                            elmo_weights, with_id=True,
                                            elmo_tp=elmo_tp)
    sentences: List[List[str]] = []
    sds: List[float] = []
    for sp in eatd.iter_speakers(root, max_id=max_id, read_text=True):
        assert sp.texts is not None, f"missing transcripts for {sp.number}"
        for text in sp.texts:
            sentences.append(tokenize(text, segmenter=segmenter))
        sds.append(sp.sds)
    flat = embed(sentences, device=True)
    features = flat.reshape(len(sds), 3, dim)
    sds_targets, clf_targets = eatd_targets(sds, sds_threshold)
    meta = {"embedder": embedder_id, "output_dim": int(dim), "seed": seed,
            "segmenter": segmenter, "elmo_tp": elmo_tp}
    return features, sds_targets, clf_targets, meta


def load_features(features_dir: Path, track: str = "clf"):
    features_dir = Path(features_dir)
    feats = np.load(features_dir / f"whole_samples_{track}_avg.npz")["arr_0"]
    labels = np.load(features_dir / f"whole_labels_{track}_avg.npz")["arr_0"]
    return feats, labels
