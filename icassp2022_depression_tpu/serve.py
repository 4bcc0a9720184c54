"""End-to-end inference (serving) API.

The reference has no inference path at all — predictions exist only inside
its evaluation scripts.  This module packages the full pipeline for
deployment: raw 3-answer audio (+ transcripts) -> log-mel/NetVLAD + text
embedding -> branch or fusion model -> label / SDS score, with the
device-side compute jitted once and reused across requests.

Typical use::

    predictor = Predictor.from_checkpoint("fuse_0.69_1.npz", task="fuse_clf")
    result = predictor.predict_speaker(waveforms, sample_rates, texts)
    # {'label': 1, 'probs': [...], 'depressed': True}

Batch APIs accept many speakers and share one device dispatch per
modality; feature extraction reuses the bucketed frontend (so repeated
serving traffic hits cached compilations).  Per-speaker extracted
features are additionally memoised in an LRU keyed by a content digest of
the raw inputs, so repeat speakers skip the (relay-transfer-bound)
extraction entirely.  ``serve_http`` is an optional stdlib HTTP front
(``cli serve``).  :class:`DaicPredictor` is the DAIC counterpart (raw
interview session -> PHQ8), served over the same HTTP front.  When a converted ELMoForManyLangs bundle is available
(``ICASSP_ELMO_WEIGHTS`` / the cache path — see
``scripts/convert_elmo_zhs.py``), text features come from the pretrained
encoder automatically, matching ``extract-text``.
"""

from __future__ import annotations

import hashlib
from collections import OrderedDict
from pathlib import Path
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from icassp2022_depression_tpu import config as C
from icassp2022_depression_tpu.frontend import audio as audio_fe
from icassp2022_depression_tpu.frontend import text as text_fe
from icassp2022_depression_tpu.models import audio_net, elmo, fusion, text_net
from icassp2022_depression_tpu.train import checkpoints
from icassp2022_depression_tpu.utils import shapes

TASKS = ("audio_clf", "text_clf", "fuse_clf",
         "audio_reg", "text_reg", "fuse_reg")


def _pow2(n: int) -> int:
    """Power-of-two bucket: serving traffic of varying sizes reuses a
    handful of compiled programs instead of compiling per size."""
    return shapes.next_pow2(n)


def _format_outputs(out: np.ndarray, clf: bool, reg_key: str) -> List[dict]:
    """Raw model outputs [N, C] -> one result dict per row (the single
    definition of the serving result schema)."""
    results = []
    for row in out:
        if clf:
            label = int(np.argmax(row))
            results.append({"label": label, "depressed": bool(label == 1),
                            "probs": row.tolist()})
        else:
            results.append({reg_key: float(row[0])})
    return results


def _model_for(task: str):
    if task.startswith("audio"):
        mcfg = (C.AUDIO_CLF if task.endswith("clf") else C.AUDIO_REG).model
        return audio_net, mcfg
    if task.startswith("text"):
        mcfg = (C.TEXT_CLF if task.endswith("clf") else C.TEXT_REG).model
        return text_net, mcfg
    fcfg = C.FUSE_CLF if task.endswith("clf") else C.FUSE_REG
    return fusion, fcfg


class _FeatureCache:
    """Content-addressed LRU of per-speaker extracted features, so repeat
    serving traffic for the same speaker skips extraction (the pipeline's
    relay-transfer-bound stage) entirely."""

    def __init__(self, max_entries: int = 256):
        self.max_entries = max_entries
        self._store: OrderedDict[str, np.ndarray] = OrderedDict()
        self.hits = 0
        self.misses = 0

    @staticmethod
    def key(parts) -> str:
        h = hashlib.blake2b(digest_size=16)
        for p in parts:
            if isinstance(p, str):
                h.update(p.encode("utf-8"))
            elif p is None:
                h.update(b"\x00none")
            else:
                a = np.ascontiguousarray(p)
                h.update(str(a.dtype).encode())
                h.update(str(a.shape).encode())
                h.update(a.tobytes())
            h.update(b"\x1f")
        return h.hexdigest()

    def get(self, key: str):
        if key in self._store:
            self._store.move_to_end(key)
            self.hits += 1
            return self._store[key]
        self.misses += 1
        return None

    def put(self, key: str, value: np.ndarray) -> None:
        self._store[key] = value
        self._store.move_to_end(key)
        while len(self._store) > self.max_entries:
            self._store.popitem(last=False)


class Predictor:
    """Loads one trained model and serves end-to-end predictions."""

    def __init__(self, params, task: str,
                 frontend_cfg: C.FrontendConfig = C.FrontendConfig(),
                 elmo_cfg=elmo.ElmoConfig(), elmo_params=None, seed: int = 0,
                 feature_cache_entries: int = 256,
                 elmo_weights: Optional[str] = "auto",
                 audio_embedder: str = "netvlad", vggish_params=None,
                 vggish_postprocessor=None, model_cfg=None):
        """``elmo_weights`` controls the text embedder like extract-text:
        a bundle path, ``"auto"`` (pick up ``ICASSP_ELMO_WEIGHTS``/the
        cache — announced on stderr, since the checkpoint being served
        must have been trained on features from the SAME embedder), or
        None to force the PRNG stand-in.  Explicit ``elmo_params`` win.

        ``audio_embedder="vggish"`` serves models trained on
        ``extract-audio --embedder vggish`` features (per-utterance
        mean-pooled 128-d VGGish, matching ``extract_eatd_vggish``);
        ``vggish_params`` defaults to the deterministic PRNG init at
        ``seed`` (match extraction's seed), and
        ``vggish_postprocessor`` must be passed iff extraction used
        ``--pca-params`` (same distribution at serve time as at
        training time).  ``model_cfg`` overrides the task's preset model
        config (e.g. a ``--audio-dim``-widened input layer).
        """
        assert task in TASKS, f"task must be one of {TASKS}"
        assert audio_embedder in ("netvlad", "vggish")
        self.task = task
        self.params = params
        self.frontend_cfg = frontend_cfg
        self.elmo_cfg = elmo_cfg
        self.audio_embedder = audio_embedder
        self._seed = seed
        self._vggish_params = vggish_params
        self._vggish_postprocessor = vggish_postprocessor
        self._model_cfg = model_cfg
        #: provenance id of the resolved text embedder (same id scheme as
        #: ``frontend.text.make_embedder`` records in extraction sidecars)
        self.embedder_id: Optional[str] = None
        self._text_embed = None
        self._text_dim = 0
        if not task.startswith("audio"):
            # ONE resolution chain shared with the extraction frontends —
            # the provenance id strings must stay byte-identical to the
            # extraction sidecars' for the mismatch warning to work
            self._text_embed, self._text_dim, self.embedder_id = \
                text_fe.make_embedder(params=elmo_params, cfg=elmo_cfg,
                                      seed=seed, elmo_weights=elmo_weights,
                                      with_id=True)
            if (elmo_weights == "auto"
                    and self.embedder_id.startswith("elmo_bundle")):
                import sys

                print("Predictor: auto-loaded the converted ELMo bundle — "
                      "the served checkpoint must have been trained on "
                      "features from this embedder (pass elmo_weights="
                      "None to force the PRNG encoder)", file=sys.stderr)
        self.elmo_params = elmo_params
        self.feature_cache = _FeatureCache(feature_cache_entries)

        module, mcfg = _model_for(task)
        if model_cfg is not None:
            mcfg = model_cfg
        if module is fusion:
            self._apply = jax.jit(
                lambda p, xa, xt: fusion.apply(p, mcfg, xa, xt,
                                               train=False)[0])
        else:
            self._apply = jax.jit(
                lambda p, x: module.apply(p, mcfg, x, train=False))
        self._module = module

    @classmethod
    def from_checkpoint(cls, path, task: str, **kw):
        """Load a gated-best checkpoint written by the trainers.

        When the checkpoint's sidecar records which text embedder produced
        its training features (``text_embedder``, written by the CLI
        trainers from the extraction sidecar), the resolved serving
        embedder is checked against it and a mismatch warns loudly."""
        module, mcfg = _model_for(task)
        if kw.get("model_cfg") is not None:
            mcfg = kw["model_cfg"]
        if module is fusion:
            template = fusion.init(jax.random.PRNGKey(0), mcfg)
        else:
            template = module.init(jax.random.PRNGKey(0), mcfg)
        params = checkpoints.load(path, like=template)
        predictor = cls(params, task, **kw)
        try:
            expected = checkpoints.load_meta(path).get("text_embedder")
        except (FileNotFoundError, ValueError):
            expected = None
        if (expected and predictor.embedder_id
                and expected != predictor.embedder_id):
            import sys

            print(f"WARNING: checkpoint {path} was trained on features "
                  f"from embedder '{expected}' but serving resolved "
                  f"'{predictor.embedder_id}' — predictions will be "
                  "meaningless; pass matching elmo_weights",
                  file=sys.stderr)
        return predictor

    @classmethod
    def from_torch_state_dict(cls, sd, task: str, **kw):
        """Serve a model trained by the reference (ported .pt state dict).

        For text/fusion tasks, reference-trained weights were fit on
        *pretrained ELMoForManyLangs* features — pass matching
        ``elmo_params`` (see ``models.elmo.from_elmoformanylangs``) or the
        text features will come from a different (PRNG-initialised)
        encoder and predictions will be meaningless.
        """
        import sys

        from icassp2022_depression_tpu.models import porting

        module, mcfg = _model_for(task)
        if module is audio_net:
            params = porting.audio_net_from_state_dict(sd, mcfg)
        elif module is text_net:
            params = porting.text_net_from_state_dict(sd, mcfg)
        else:
            params = porting.fusion_from_state_dict(sd, mcfg)
        predictor = cls(params, task, **kw)
        # warn only when the RESOLVED embedder is the PRNG stand-in — a
        # converted zhs bundle (explicit or auto-loaded) IS the pretrained
        # encoder the reference model was trained on
        if (not task.startswith("audio") and predictor.embedder_id
                and predictor.embedder_id.startswith("prng")):
            print("WARNING: serving a reference-trained text/fusion model "
                  "on the PRNG-initialised text encoder — it does NOT "
                  "match the pretrained ELMo features the reference model "
                  "was trained on (pass elmo_params or a converted "
                  "bundle)", file=sys.stderr)
        return predictor

    # -- feature extraction -------------------------------------------------

    def audio_features(self, waveforms_per_speaker: Sequence[Sequence],
                       sample_rates: Sequence[Sequence[int]],
                       ordinal_bases: Optional[Sequence[int]] = None
                       ) -> np.ndarray:
        """[[w_pos, w_neu, w_neg], ...] -> [N, 3, 256] wav2vlad features.

        NetVLAD projections are keyed per utterance ordinal.  By default
        every speaker uses ordinals (0, 1, 2) — batch-position independent,
        so a speaker gets identical features alone or in any batch.  To
        reproduce *training-time* features of a corpus speaker, pass that
        speaker's corpus ordinal base (3 x corpus position) per speaker in
        ``ordinal_bases`` (the ``cli predict`` path does this).
        """
        keys = self._audio_keys(waveforms_per_speaker, sample_rates,
                                ordinal_bases)
        if self.audio_embedder == "vggish":
            return self._audio_features_vggish(waveforms_per_speaker,
                                               sample_rates, keys)
        # ONE readback for API compatibility; the predict path uses the
        # device rows directly (no round-trip)
        return np.asarray(self._stack_rows(self._audio_feature_rows(
            waveforms_per_speaker, sample_rates, ordinal_bases, keys)))

    def _stack_rows(self, rows) -> jnp.ndarray:
        """[3, D] rows -> [N, 3, D] device array (empty-safe: zero
        speakers is a valid request answered with zero results)."""
        if not rows:
            return jnp.zeros((0, 3, self.frontend_cfg.netvlad_output_dim),
                             jnp.float32)
        return jnp.stack(rows)

    def _audio_keys(self, waveforms_per_speaker, sample_rates,
                    ordinal_bases):
        if waveforms_per_speaker is None or sample_rates is None:
            raise ValueError(
                f"task {self.task!r} needs 3 waveforms (+ sample rates) per "
                "speaker; got None")
        return [
            _FeatureCache.key(
                # default ordinals ARE base 0 — key them identically so a
                # speaker hits the cache regardless of batch composition
                ["audio", self.audio_embedder,
                 str(0 if ordinal_bases is None else ordinal_bases[i]),
                 str(list(sample_rates[i]))] + list(waveforms_per_speaker[i]))
            for i in range(len(waveforms_per_speaker))]

    def _audio_feature_rows(self, waveforms_per_speaker, sample_rates,
                            ordinal_bases, keys):
        """Cache-aware extraction -> list of per-speaker [3, D] DEVICE
        arrays.  Features stay device-resident end to end: extraction
        feeds the model forward without an intermediate host readback
        (one relay round-trip saved per cold request), and cache hits
        are device arrays — repeat speakers pay no transfer at all."""
        n = len(waveforms_per_speaker)
        rows: list = [None] * n
        todo = []
        for i, key in enumerate(keys):
            cached = self.feature_cache.get(key)
            if cached is not None:
                rows[i] = cached
            else:
                todo.append(i)
        if todo:
            flat_w = [w for i in todo for w in waveforms_per_speaker[i]]
            flat_sr = [sr for i in todo for sr in sample_rates[i]]
            if ordinal_bases is None:
                ordinals = [k for _ in todo for k in range(3)]
            else:
                ordinals = [ordinal_bases[i] + k for i in todo
                            for k in range(3)]
            feats = audio_fe.extract_batch(flat_w, flat_sr,
                                           self.frontend_cfg,
                                           ordinals=ordinals, device=True)
            feats = feats.reshape(len(todo), 3, -1)
            for row, i in enumerate(todo):
                rows[i] = feats[row]
                self.feature_cache.put(keys[i], feats[row])
        return rows

    def _audio_features_vggish(self, waveforms_per_speaker, sample_rates,
                               keys) -> np.ndarray:
        """Per-utterance mean-pooled VGGish embeddings through the SAME
        batched entry point as corpus extraction
        (``frontend.audio.vggish_embed_waveforms``: fixed-chunk conv
        batches, one fused readback), so checkpoints trained on
        ``extract-audio --embedder vggish`` features serve on
        identically-computed ones — including the PCA postprocessor when
        training extraction used one (``vggish_postprocessor``)."""
        from icassp2022_depression_tpu.models import vggish

        if self._vggish_params is None:
            bundle = vggish.default_weights_path()
            if bundle is not None:
                import sys

                self._vggish_params, bundle_post = vggish.load_npz(bundle)
                if self._vggish_postprocessor is None:
                    self._vggish_postprocessor = bundle_post
                print(f"Predictor: auto-loaded VGGish bundle {bundle} — "
                      "the served checkpoint must have been trained on "
                      "features from this embedder", file=sys.stderr)
            else:
                # same deterministic default as extract_eatd_vggish(seed=)
                self._vggish_params = vggish.init(
                    jax.random.PRNGKey(self._seed))
        n = len(waveforms_per_speaker)
        out = np.zeros((n, 3, vggish.EMBEDDING_SIZE), np.float32)
        todo = []
        for i in range(n):
            cached = self.feature_cache.get(keys[i])
            if cached is not None:
                out[i] = cached
            else:
                todo.append(i)
        if todo:
            flat_w = [w for i in todo for w in waveforms_per_speaker[i]]
            flat_sr = [sr for i in todo for sr in sample_rates[i]]
            emb = audio_fe.vggish_embed_waveforms(
                self._vggish_params, flat_w, flat_sr,
                self._vggish_postprocessor)
            emb = emb.reshape(len(todo), 3, -1)
            for row, i in enumerate(todo):
                out[i] = emb[row]
                self.feature_cache.put(keys[i], emb[row].copy())
        return out

    def text_features(self, texts_per_speaker: Sequence[Sequence[str]]
                      ) -> np.ndarray:
        """[[pos, neu, neg], ...] transcripts -> [N, 3, 1024] embeddings."""
        if texts_per_speaker is None or any(
                ts is None for ts in texts_per_speaker):
            raise ValueError(
                f"task {self.task!r} needs 3 transcripts per speaker; "
                "got None (speaker has no transcript files?)")
        n = len(texts_per_speaker)
        keys = [_FeatureCache.key(["text"] + list(ts))
                for ts in texts_per_speaker]
        out = np.zeros((n, 3, self._text_dim), np.float32)
        todo = []
        for i, key in enumerate(keys):
            cached = self.feature_cache.get(key)
            if cached is not None:
                out[i] = cached
            else:
                todo.append(i)
        if todo:
            sentences = [text_fe.tokenize(t) for i in todo
                         for t in texts_per_speaker[i]]
            flat = self._text_embed(sentences).reshape(len(todo), 3, -1)
            for row, i in enumerate(todo):
                out[i] = flat[row]
                # copy: a slice view would pin the whole batch array in
                # the LRU for the entry's lifetime
                self.feature_cache.put(keys[i], flat[row].copy())
        return out

    # -- prediction ---------------------------------------------------------

    @staticmethod
    def _pad_batch(x, total: int) -> jnp.ndarray:
        """Pad rows to ``total``.  jnp-based so a device-resident input
        (the serving fast path) incurs no host readback; a NumPy input
        enqueues one async transfer."""
        x = jnp.asarray(x, jnp.float32)
        pad = total - x.shape[0]
        if pad <= 0:
            return x
        return jnp.concatenate(
            [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], axis=0)

    def predict_features(self, audio_feats: Optional[np.ndarray] = None,
                         text_feats: Optional[np.ndarray] = None):
        """Model forward on precomputed features -> raw outputs [N, C].

        Accepts NumPy or device arrays.  The batch is padded to a
        power-of-two bucket so serving traffic of varying request sizes
        reuses a handful of compiled programs instead of compiling per
        batch size."""
        n = (audio_feats if audio_feats is not None else text_feats).shape[0]
        bucket = _pow2(n)
        if self._module is fusion:
            assert audio_feats is not None and text_feats is not None
            out = self._apply(self.params,
                              self._pad_batch(audio_feats, bucket),
                              self._pad_batch(text_feats, bucket))
        elif self.task.startswith("audio"):
            out = self._apply(self.params,
                              self._pad_batch(audio_feats, bucket))
        else:
            out = self._apply(self.params,
                              self._pad_batch(text_feats, bucket))
        return np.asarray(out)[:n]

    def predict_batch(self, waveforms_per_speaker=None, sample_rates=None,
                      texts_per_speaker=None, ordinal_bases=None
                      ) -> List[dict]:
        """Raw inputs -> one result dict per speaker."""
        af = tf = None
        if not self.task.startswith("text"):
            if self.audio_embedder == "vggish":
                af = self.audio_features(waveforms_per_speaker,
                                         sample_rates, ordinal_bases)
            else:
                # fast path: features stay ON DEVICE between extraction
                # and the model forward — one relay round-trip total
                keys = self._audio_keys(waveforms_per_speaker,
                                        sample_rates, ordinal_bases)
                af = self._stack_rows(self._audio_feature_rows(
                    waveforms_per_speaker, sample_rates, ordinal_bases,
                    keys))
        if not self.task.startswith("audio"):
            tf = self.text_features(texts_per_speaker)
        out = self.predict_features(af, tf)
        return _format_outputs(out, self.task.endswith("clf"), "sds_score")

    def predict_speaker(self, waveforms=None, sample_rates=None,
                        texts=None, ordinal_base: Optional[int] = None
                        ) -> dict:
        """Single speaker: 3 waveforms and/or 3 transcripts -> result."""
        return self.predict_batch(
            [waveforms] if waveforms is not None else None,
            [sample_rates] if sample_rates is not None else None,
            [texts] if texts is not None else None,
            [ordinal_base] if ordinal_base is not None else None)[0]

    def warmup(self, batch_sizes: Sequence[int] = (1, 2, 4),
               utt_seconds: float = 4.0, sr: int = 16000) -> None:
        """Pre-compile the standard serving shapes (extraction buckets,
        embedding chunks, model-forward batch buckets) with synthetic
        traffic, so the first real request does not pay remote compiles.
        Dummy features enter the LRU but are content-addressed, so they
        never collide with real traffic and age out."""
        rng = np.random.default_rng(0)
        for n in batch_sizes:
            kw = {}
            if not self.task.startswith("text"):
                kw["waveforms_per_speaker"] = [
                    [np.round(rng.standard_normal(int(sr * utt_seconds))
                              * 2000).astype(np.int16) for _ in range(3)]
                    for _ in range(n)]
                kw["sample_rates"] = [[sr] * 3] * n
            if not self.task.startswith("audio"):
                # distinct transcripts per speaker/batch size, else the
                # feature cache would satisfy repeats and skip compiling
                # the larger embedding-chunk shapes
                kw["texts_per_speaker"] = [
                    [f"warm {n} {i} 你 好", f"warm {n} {i} 还 可以",
                     f"warm {n} {i} 有点 累"] for i in range(n)]
            self.predict_batch(**kw)


class DaicPredictor:
    """Serve a DAIC-trained checkpoint (``train/daic.py``) end-to-end:
    a raw interview session (transcript CSV + full-session wav, segmented
    per-question by the bundled bank exactly like extraction —
    ``DAICFeatureExtarction/feature_extraction.py:31-64``) or
    pre-segmented response signals -> PHQ8 binary / score.

    Completes serving coverage for every model family: EATD branch /
    fusion tasks via :class:`Predictor`, DAIC cross-corpus models here.
    Response counts are ragged; batches are padded to a power-of-two
    response axis with a validity mask (no recompilation storms)."""

    TASKS = ("daic_clf", "daic_reg")

    def __init__(self, params, task: str, tcfg=None,
                 frontend_cfg: C.FrontendConfig = C.FrontendConfig()):
        assert task in self.TASKS, f"task must be one of {self.TASKS}"
        from icassp2022_depression_tpu.train import daic as daic_train

        self.task = task
        self.params = params
        self.tcfg = tcfg if tcfg is not None else (
            daic_train.DAIC_CLF if task == "daic_clf"
            else daic_train.DAIC_REG)
        self.frontend_cfg = frontend_cfg
        mcfg = self.tcfg.model
        self._apply = jax.jit(
            lambda p, x, m: audio_net.apply(p, mcfg, x, train=False,
                                            time_mask=m))

    @classmethod
    def from_checkpoint(cls, path, task: str, tcfg=None, **kw):
        from icassp2022_depression_tpu.train import daic as daic_train

        resolved = tcfg if tcfg is not None else (
            daic_train.DAIC_CLF if task == "daic_clf"
            else daic_train.DAIC_REG)
        template = audio_net.init(jax.random.PRNGKey(0), resolved.model)
        params = checkpoints.load(path, like=template)
        return cls(params, task, tcfg=resolved, **kw)

    def response_features(self, signals_per_participant,
                          sample_rates: Sequence[int],
                          start_ordinals: Optional[Sequence[int]] = None):
        """Ragged response signals -> list of [n_i, 1, D] feature blocks.

        One fused ``extract_batch`` across every participant's responses
        (single device round-trip).  ``start_ordinals`` reproduces
        training-time NetVLAD params for corpus participants (extraction
        numbers utterances cumulatively across the split —
        ``frontend.daic.extract_split``); default 0-based per participant
        (batch-position independent)."""
        counts = [len(s) for s in signals_per_participant]
        flat = [w for sig in signals_per_participant for w in sig]
        srs = [sample_rates[i] for i, c in enumerate(counts)
               for _ in range(c)]
        if start_ordinals is None:
            ords = [k for c in counts for k in range(c)]
        else:
            ords = [start_ordinals[i] + k
                    for i, c in enumerate(counts) for k in range(c)]
        feats = (audio_fe.extract_batch(flat, srs, self.frontend_cfg,
                                        ordinals=ords)
                 if flat else np.zeros(
                     (0, self.frontend_cfg.netvlad_output_dim),
                     np.float32))
        out, pos = [], 0
        for c in counts:
            out.append(feats[pos:pos + c][:, None, :])
            pos += c
        return out

    def predict_features(self, feature_blocks) -> List[dict]:
        """[n_i, 1, D] blocks (as the trainer consumes) -> result dicts."""
        from icassp2022_depression_tpu.frontend.daic import pad_responses

        if not feature_blocks:
            return []   # zero participants is a valid request
        if any(f.shape[0] == 0 for f in feature_blocks):
            raise ValueError("participant with zero segmented responses "
                             "(no transcript line matched the question "
                             "bank?) — nothing to pool over")
        n = len(feature_blocks)
        bucket_r = _pow2(max(f.shape[0] for f in feature_blocks))
        bucket_n = _pow2(n)
        x, mask = pad_responses(feature_blocks, bucket_r)
        if bucket_n > n:
            pad = bucket_n - n
            x = np.concatenate(
                [x, np.zeros((pad,) + x.shape[1:], x.dtype)])
            mask = np.concatenate(
                [mask, np.ones((pad, bucket_r), mask.dtype)])  # avoid 0/0
        out = np.asarray(self._apply(self.params, jnp.asarray(x),
                                     jnp.asarray(mask)))[:n]
        return _format_outputs(out, self.task.endswith("clf"),
                               "phq8_score")

    def predict_signals(self, signals_per_participant, sample_rates,
                        start_ordinals=None) -> List[dict]:
        return self.predict_features(self.response_features(
            signals_per_participant, sample_rates, start_ordinals))

    def predict_participant(self, daic_dir, number: int,
                            queries_path=None, start_ordinal: int = 0
                            ) -> dict:
        """Raw ``<daic_dir>/<number>_P`` session -> one result dict
        (reads/segments/embeds via the extraction-side
        ``extract_participant`` — one definition of the session
        pipeline)."""
        from icassp2022_depression_tpu.frontend import daic as daic_fe

        feats = daic_fe.extract_participant(
            Path(daic_dir), number, daic_fe.load_queries(queries_path),
            self.frontend_cfg, start_ordinal)
        return self.predict_features([feats])[0]


# ---------------------------------------------------------------------------
# Optional stdlib HTTP front
# ---------------------------------------------------------------------------
#
# POST /predict  {"speakers": [{"texts": ["...", "...", "..."],
#                               "wav_b64": ["<base64 int16 LE PCM>", ...],
#                               "sr": [16000, 16000, 16000],
#                               "ordinal_base": 0 (optional)}, ...]}
#   -> {"results": [{...}, ...]}   (one dict per speaker, as predict_batch)
# POST /predict_bin  zero-copy binary variant: uint32-LE header length,
#   JSON header ({"speakers": [{"n_samples": [...], "sr": [...],
#   "texts": ..., "ordinal_base": ...}]}), then all speakers' int16-LE
#   PCM concatenated; waveforms become views over the request body.
# POST /predict_stream  -> chunked NDJSON, one line per speaker.
# GET  /healthz -> {"ok": true, "task": ..., "cache": {hits, misses},
#                   "latency": {request, device_batch histograms}}
#
# Default mode is single-threaded: the TPU is single-tenant, so
# serialising requests at the HTTP layer is a correct concurrency model.
# With ``batch_window_ms > 0`` the server instead runs threaded with a
# micro-batcher: concurrent requests coalesce (up to the window / max
# batch) into ONE device batch — the right way to serve many clients
# from one chip.


class ServerOverloaded(RuntimeError):
    """Admission rejected: the pending-speaker queue is full.  The HTTP
    front maps this to 503 + Retry-After (load shedding) so sustained
    overload degrades into fast rejections instead of unbounded latency."""


class LatencyHistogram:
    """Lock-protected fixed-bucket latency histogram (milliseconds).

    Log-spaced upper edges cover the serving regime (sub-ms cache hits
    through multi-second cold compiles).  ``snapshot`` returns cumulative
    counts plus mean and interpolated p50/p90/p99 — the observability
    surface ``/healthz`` exposes so operators can see the shape of
    serving latency (including the latency bound documented on
    :class:`_MicroBatcher`) without external tooling."""

    EDGES_MS = (1.0, 2.0, 5.0, 10.0, 25.0, 50.0, 100.0, 250.0, 500.0,
                1000.0, 2500.0, 5000.0, 10000.0)

    def __init__(self):
        import threading

        self._lock = threading.Lock()
        self._counts = [0] * (len(self.EDGES_MS) + 1)  # last = overflow
        self._sum_ms = 0.0
        self._max_ms = 0.0

    def observe(self, seconds: float) -> None:
        ms = seconds * 1000.0
        i = 0
        while i < len(self.EDGES_MS) and ms > self.EDGES_MS[i]:
            i += 1
        with self._lock:
            self._counts[i] += 1
            self._sum_ms += ms
            if ms > self._max_ms:
                self._max_ms = ms

    def _quantile(self, counts, total, q: float) -> float:
        """Interpolated quantile from bucket counts (0 lower edge for the
        first bucket; the overflow bucket reports its lower edge)."""
        target = q * total
        seen = 0.0
        for i, c in enumerate(counts):
            if seen + c >= target and c > 0:
                lo = 0.0 if i == 0 else self.EDGES_MS[i - 1]
                if i >= len(self.EDGES_MS):
                    return lo
                hi = self.EDGES_MS[i]
                frac = (target - seen) / c
                return lo + frac * (hi - lo)
            seen += c
        return self._max_ms

    def snapshot(self) -> dict:
        with self._lock:
            counts = list(self._counts)
            sum_ms = self._sum_ms
            max_ms = self._max_ms
        total = sum(counts)
        if total == 0:
            return {"count": 0}
        labels = [f"le_{e:g}ms" for e in self.EDGES_MS] + ["inf"]
        return {
            "count": total,
            "mean_ms": round(sum_ms / total, 3),
            "max_ms": round(max_ms, 3),
            "p50_ms": round(self._quantile(counts, total, 0.50), 3),
            "p90_ms": round(self._quantile(counts, total, 0.90), 3),
            "p99_ms": round(self._quantile(counts, total, 0.99), 3),
            "buckets": {k: c for k, c in zip(labels, counts) if c},
        }


class _MicroBatcher:
    """Coalesces concurrent prediction requests into single device
    batches.  ``submit`` blocks the calling (handler) thread until its
    slice of the batched result is ready.

    Backpressure: admission is bounded at ``max_queue`` pending SPEAKERS
    (not requests) — beyond it ``submit``/``submit_async`` raise
    :class:`ServerOverloaded` immediately.  Admitted work drains in FIFO
    order (an overflow request held for the next round goes FIRST in that
    round), so the worst-case queueing latency is bounded by
    ``ceil(max_queue / max_batch)`` rounds of (window + one device
    batch) — sustained overload sheds, it never starves an admitted
    request."""

    def __init__(self, predictor: Predictor, window_s: float,
                 max_batch: int = 32, max_queue: int = 128):
        import queue
        import threading

        self.predictor = predictor
        self.window_s = window_s
        self.max_batch = max_batch
        self.max_queue = max_queue
        self.batches_run = 0
        self.requests_served = 0
        self.requests_shed = 0
        #: device-batch latency (one observation per coalesced batch)
        self.batch_latency = LatencyHistogram()
        self._q: "queue.Queue" = queue.Queue()
        self._queue_mod = queue
        self._held = None   # overflow request carried to the next round
        self._pending = 0   # admitted speakers not yet answered
        self._lock = threading.Lock()
        threading.Thread(target=self._loop, daemon=True).start()

    def submit_async(self, req: dict):
        """Admit (or shed) a request; returns ``(done_event, box)`` where
        ``box`` carries ``results`` or ``error`` once ``done_event`` is
        set.  Raises :class:`ServerOverloaded` when admission would exceed
        ``max_queue`` pending speakers — EXCEPT on an idle queue, where a
        request larger than ``max_queue`` is still admitted whole (a 503
        whose retry could never succeed would be a permanent rejection;
        the batcher handles oversized batches as one device batch)."""
        import threading

        with self._lock:
            if (self._pending > 0
                    and self._pending + req["n"] > self.max_queue):
                self.requests_shed += 1
                raise ServerOverloaded(
                    f"{self._pending} speakers pending (max_queue="
                    f"{self.max_queue}); retry later")
            self._pending += req["n"]
        done = threading.Event()
        box: dict = {}
        self._q.put((req, done, box))
        return done, box

    def _release(self, n: int) -> None:
        with self._lock:
            self._pending -= n

    def submit(self, req: dict) -> List[dict]:
        """req: {waves, srs, texts, bases, n} (modality fields may be
        None, matching the predictor's task)."""
        done, box = self.submit_async(req)
        done.wait()
        if "error" in box:
            raise box["error"]
        return box["results"]

    def _loop(self):
        import time as _time

        while True:
            first = self._held if self._held is not None else self._q.get()
            self._held = None
            batch = [first]
            total = first[0]["n"]
            deadline = _time.monotonic() + self.window_s
            while total < self.max_batch:
                timeout = deadline - _time.monotonic()
                if timeout <= 0:
                    break
                try:
                    nxt = self._q.get(timeout=timeout)
                except self._queue_mod.Empty:
                    break
                if total + nxt[0]["n"] > self.max_batch:
                    self._held = nxt   # would overflow: next round
                    break
                batch.append(nxt)
                total += nxt[0]["n"]
            self._run(batch)

    @staticmethod
    def _cat(batch, field, fill=None):
        if all(item[0][field] is None for item in batch):
            return None
        out = []
        for req, _, _ in batch:
            vals = req[field]
            out.extend(vals if vals is not None else [fill] * req["n"])
        return out

    def _predict_merged(self, batch) -> List[dict]:
        """Merge a round's requests and run ONE device batch; results in
        concatenated request order.  Subclasses override for other
        request shapes (e.g. DAIC participants)."""
        return self.predictor.predict_batch(
            self._cat(batch, "waves"), self._cat(batch, "srs"),
            self._cat(batch, "texts"), self._cat(batch, "bases", fill=0))

    def _run(self, batch):
        import time as _time

        t0 = _time.monotonic()
        try:
            results = self._predict_merged(batch)
            self.batch_latency.observe(_time.monotonic() - t0)
            self.batches_run += 1
            pos = 0
            for req, done, box in batch:
                box["results"] = results[pos:pos + req["n"]]
                pos += req["n"]
                self.requests_served += 1
                self._release(req["n"])
                done.set()
        except Exception:
            # one malformed request must not fail unrelated clients:
            # retry each request individually so only the bad one errors
            for req, done, box in batch:
                try:
                    t1 = _time.monotonic()
                    box["results"] = self._predict_merged([(req, done,
                                                            box)])
                    self.batch_latency.observe(_time.monotonic() - t1)
                    self.batches_run += 1
                    self.requests_served += 1
                except Exception as exc:
                    box["error"] = exc
                self._release(req["n"])
                done.set()


class _DaicMicroBatcher(_MicroBatcher):
    """Micro-batcher for :class:`DaicPredictor`: a round's participants
    (ragged response lists) coalesce into ONE ``predict_signals`` call —
    padded to the round's max response count on device.  Request shape:
    ``{"signals": [[resp, ...], ...], "srs": [...], "starts": [...]|None,
    "n": k}``."""

    def _predict_merged(self, batch) -> List[dict]:
        return self.predictor.predict_signals(
            self._cat(batch, "signals"), self._cat(batch, "srs"),
            self._cat(batch, "starts", fill=0))


def make_http_server(predictor: Predictor, host: str = "127.0.0.1",
                     port: int = 8000, batch_window_ms: float = 0.0,
                     max_batch: int = 32, max_queue: int = 128,
                     auth_token: Optional[str] = None,
                     tls_cert: Optional[str] = None,
                     tls_key: Optional[str] = None):
    """Build (not start) an ``http.server`` around a Predictor.  With
    ``batch_window_ms > 0`` the server is threaded and concurrent requests
    micro-batch into single device calls; admission is bounded at
    ``max_queue`` pending speakers and overload sheds with 503 +
    Retry-After (see :class:`_MicroBatcher` for the latency bound).
    ``POST /predict_stream`` answers NDJSON over chunked transfer
    encoding, one line per speaker as its result becomes available
    (each speaker is submitted to the batcher independently, so large
    requests stream results batch by batch).  ``POST /predict_bin`` is
    the zero-copy ingestion path: a uint32-LE header-length prefix, a
    JSON header (per speaker: ``n_samples``, ``sr``, optional ``texts`` /
    ``ordinal_base``), then the speakers' int16-LE PCM concatenated —
    the audio enters NumPy as views over the request body (no base64
    decode, no copy; ~25% less wire weight than /predict).

    ``auth_token`` requires ``Authorization: Bearer <token>`` on every
    prediction endpoint (401 otherwise); ``GET /healthz`` stays open for
    liveness probes.  ``tls_cert``/``tls_key`` (PEM paths) serve HTTPS.
    ``/healthz`` reports request- and device-batch-latency histograms
    with interpolated p50/p90/p99.  Call ``.serve_forever()`` to run;
    tests drive requests against an ephemeral port."""
    import base64
    import json
    import time as _time
    from http.server import (BaseHTTPRequestHandler, HTTPServer,
                             ThreadingHTTPServer)

    is_daic = isinstance(predictor, DaicPredictor)
    batcher_cls = _DaicMicroBatcher if is_daic else _MicroBatcher
    batcher = (batcher_cls(predictor, batch_window_ms / 1000.0, max_batch,
                           max_queue)
               if batch_window_ms > 0 else None)
    request_latency = LatencyHistogram()   # end-to-end handler latency

    class Handler(BaseHTTPRequestHandler):
        # HTTP/1.1 (keep-alive + chunked streaming) only on the THREADED
        # server: on the single-threaded HTTPServer a kept-alive client
        # would pin serve_forever inside its connection and wedge
        # shutdown(); there /predict_stream falls back to read-until-close.
        protocol_version = ("HTTP/1.1" if batcher is not None
                            else "HTTP/1.0")

        def _send(self, code: int, payload: dict, headers=()):
            body = json.dumps(payload).encode("utf-8")
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            for k, v in headers:
                self.send_header(k, v)
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, fmt, *args):  # quiet by default
            pass

        def _authorized(self) -> bool:
            """Bearer-token gate on prediction endpoints (healthz stays
            open for liveness probes).  Constant-time comparison."""
            if auth_token is None:
                return True
            import hmac

            # compare as bytes: http.server decodes headers as latin-1,
            # and compare_digest raises TypeError on non-ASCII str
            got = self.headers.get("Authorization", "").encode("latin-1")
            if hmac.compare_digest(got,
                                   f"Bearer {auth_token}".encode("utf-8")):
                return True
            # drain the unread body so a kept-alive connection's next
            # request does not start mid-payload; a client that closes
            # early returns b'' (EOF) — stop, never spin
            remaining = int(self.headers.get("Content-Length", "0"))
            while remaining > 0:
                got_bytes = self.rfile.read(min(remaining, 1 << 20))
                if not got_bytes:
                    self.close_connection = True
                    break
                remaining -= len(got_bytes)
            self._send(401, {"error": "missing or invalid bearer token"},
                       headers=(("WWW-Authenticate", "Bearer"),))
            return False

        def do_GET(self):
            if self.path == "/healthz":
                payload = {
                    "ok": True, "task": predictor.task,
                    "latency": {"request": request_latency.snapshot()}}
                if not is_daic:
                    payload["cache"] = {
                        "hits": predictor.feature_cache.hits,
                        "misses": predictor.feature_cache.misses}
                if batcher is not None:
                    payload["batcher"] = {
                        "batches_run": batcher.batches_run,
                        "requests_served": batcher.requests_served,
                        "requests_shed": batcher.requests_shed,
                        "pending": batcher._pending,
                        "max_queue": batcher.max_queue}
                    payload["latency"]["device_batch"] = (
                        batcher.batch_latency.snapshot())
                self._send(200, payload)
            else:
                self._send(404, {"error": f"unknown path {self.path}"})

        def _parse(self):
            length = int(self.headers.get("Content-Length", "0"))
            req = json.loads(self.rfile.read(length))
            speakers = req["speakers"]
            waves = srs = texts = bases = None
            if not predictor.task.startswith("text"):
                waves = [[np.frombuffer(base64.b64decode(b), np.int16)
                          for b in sp["wav_b64"]] for sp in speakers]
                srs = [sp["sr"] for sp in speakers]
            if not predictor.task.startswith("audio"):
                texts = [sp["texts"] for sp in speakers]
            if any("ordinal_base" in sp for sp in speakers):
                bases = [int(sp.get("ordinal_base", 0))
                         for sp in speakers]
            return len(speakers), waves, srs, texts, bases

        def _chunk(self, data: bytes):
            self.wfile.write(f"{len(data):X}\r\n".encode("ascii"))
            self.wfile.write(data)
            self.wfile.write(b"\r\n")

        def _parse_bin(self):
            """Zero-copy wav ingestion (``/predict_bin``): the body is a
            uint32-LE header-length prefix, a JSON header, then every
            speaker's int16-LE PCM concatenated in order.  Waveforms are
            read-only ``np.frombuffer`` views over the request body —
            no base64 decode and no per-utterance copies."""
            length = int(self.headers.get("Content-Length", "0"))
            body = self.rfile.read(length)
            if len(body) < 4:
                raise ValueError("binary body shorter than the uint32 "
                                 "header-length prefix")
            hlen = int.from_bytes(body[:4], "little")
            header = json.loads(body[4:4 + hlen].decode("utf-8"))
            speakers = header["speakers"]
            off = 4 + hlen
            waves = srs = texts = bases = None
            if not predictor.task.startswith("text"):
                waves, srs = [], []
                for sp in speakers:
                    w = []
                    for ns in sp["n_samples"]:
                        ns = int(ns)
                        if ns < 0:   # negative count would make frombuffer
                            # read "all remaining bytes" and walk off back-
                            # ward into already-consumed payload
                            raise ValueError(f"negative n_samples {ns}")
                        # frombuffer itself raises on a body shorter than
                        # the header describes (truncation -> 400)
                        w.append(np.frombuffer(body, np.int16, ns, off))
                        off += 2 * ns
                    waves.append(w)
                    srs.append(sp["sr"])
            if not predictor.task.startswith("audio"):
                texts = [sp["texts"] for sp in speakers]
            if any("ordinal_base" in sp for sp in speakers):
                bases = [int(sp.get("ordinal_base", 0))
                         for sp in speakers]
            return len(speakers), waves, srs, texts, bases

        def _post_daic(self):
            """DAIC request shape: {"participants": [{"responses_b64":
            ["<base64 int16 LE PCM>", ...], "sr": 16000,
            "start_ordinal": 0 (optional)}, ...]} — one ragged response
            list per participant, answered like /predict.  With
            ``--batch-window-ms`` concurrent requests coalesce into one
            padded ragged device batch (admission bounded in
            participants; overload sheds 503)."""
            if self.path != "/predict":
                self._send(404, {"error": "DAIC serving exposes /predict "
                                          "and /healthz only"})
                return
            t0 = _time.monotonic()
            try:
                length = int(self.headers.get("Content-Length", "0"))
                req = json.loads(self.rfile.read(length))
                parts = req["participants"]
                signals = [[np.frombuffer(base64.b64decode(b), np.int16)
                            for b in sp["responses_b64"]] for sp in parts]
                srs = [int(sp["sr"]) for sp in parts]
                starts = ([int(sp.get("start_ordinal", 0)) for sp in parts]
                          if any("start_ordinal" in sp for sp in parts)
                          else None)
                if batcher is not None:
                    results = batcher.submit(
                        {"signals": signals, "srs": srs, "starts": starts,
                         "n": len(parts)})
                else:
                    results = predictor.predict_signals(signals, srs,
                                                        starts)
                request_latency.observe(_time.monotonic() - t0)
                self._send(200, {"results": results})
            except ServerOverloaded as exc:
                self._send(503, {"error": f"overloaded: {exc}"},
                           headers=(("Retry-After", "1"),))
            except Exception as exc:
                self._send(400, {"error": f"{type(exc).__name__}: {exc}"})

        def do_POST(self):
            if not self._authorized():
                return
            if is_daic:
                self._post_daic()
                return
            if self.path == "/predict_stream":
                self._post_stream()
                return
            if self.path not in ("/predict", "/predict_bin"):
                self._send(404, {"error": f"unknown path {self.path}"})
                return
            t0 = _time.monotonic()
            try:
                n, waves, srs, texts, bases = (
                    self._parse_bin() if self.path == "/predict_bin"
                    else self._parse())
                if batcher is not None:
                    results = batcher.submit(
                        {"waves": waves, "srs": srs, "texts": texts,
                         "bases": bases, "n": n})
                else:
                    results = predictor.predict_batch(waves, srs, texts,
                                                      bases)
                request_latency.observe(_time.monotonic() - t0)
                self._send(200, {"results": results})
            except ServerOverloaded as exc:  # shed load, invite a retry
                self._send(503, {"error": f"overloaded: {exc}"},
                           headers=(("Retry-After", "1"),))
            except Exception as exc:  # surface errors as JSON, keep serving
                self._send(400, {"error": f"{type(exc).__name__}: {exc}"})

        def _post_stream(self):
            """NDJSON chunked streaming: one ``{"index", "result"}`` (or
            ``{"index", "error"}``) line per speaker, written as soon as
            that speaker's micro-batch completes."""
            try:
                n, waves, srs, texts, bases = self._parse()
            except Exception as exc:
                self._send(400, {"error": f"{type(exc).__name__}: {exc}"})
                return
            # chunked framing needs BOTH sides on HTTP/1.1: an HTTP/1.0
            # client would read the hex chunk-size lines as body bytes
            chunked = (self.protocol_version >= "HTTP/1.1"
                       and self.request_version >= "HTTP/1.1")
            self.send_response(200)
            self.send_header("Content-Type", "application/x-ndjson")
            if chunked:
                self.send_header("Transfer-Encoding", "chunked")
            else:  # HTTP/1.0: stream raw lines, client reads until close
                self.close_connection = True
            self.end_headers()

            def one(i):
                return {"waves": None if waves is None else [waves[i]],
                        "srs": None if srs is None else [srs[i]],
                        "texts": None if texts is None else [texts[i]],
                        "bases": None if bases is None else [bases[i]],
                        "n": 1}

            def write_line(i, box):
                if "error" in box:
                    line = {"index": i, "error": str(box["error"])}
                else:
                    line = {"index": i, "result": box["results"][0]}
                data = (json.dumps(line) + "\n").encode("utf-8")
                if chunked:
                    self._chunk(data)
                else:
                    self.wfile.write(data)

            # submit speakers as capacity allows; when admission sheds,
            # drain (and stream out) our own oldest in-flight speaker to
            # free a slot and retry — a stream request never 503s its own
            # speakers; only a queue full of OTHER clients' work with
            # nothing of ours in flight sheds a line
            t0 = _time.monotonic()
            pending: list = []
            next_out = 0
            i = 0
            while i < n or next_out < len(pending):
                if i < n:
                    if batcher is not None:
                        try:
                            pending.append((i,) +
                                           batcher.submit_async(one(i)))
                            i += 1
                            continue
                        except ServerOverloaded as exc:
                            if next_out >= len(pending):  # nothing in flight
                                pending.append((i, None, {
                                    "error": RuntimeError(
                                        f"overloaded: {exc}")}))
                                i += 1
                                continue
                            # fall through: drain our oldest, then retry i
                    else:
                        box = {}
                        r = one(i)
                        try:
                            box["results"] = predictor.predict_batch(
                                r["waves"], r["srs"], r["texts"],
                                r["bases"])
                        except Exception as exc:
                            box["error"] = exc
                        pending.append((i, None, box))
                        i += 1
                        continue
                idx, done, box = pending[next_out]
                if done is not None:
                    done.wait()
                write_line(idx, box)
                next_out += 1
            request_latency.observe(_time.monotonic() - t0)
            if chunked:
                self._chunk(b"")  # terminating chunk

    if tls_cert is not None:
        import ssl

        ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
        ctx.load_cert_chain(tls_cert, tls_key)

        class Handler(Handler):  # noqa: F811 — TLS-aware variant
            def setup(self):
                # handshake HERE (handler thread), not in the accept
                # loop: with do_handshake_on_connect=True a client that
                # connects and sends no ClientHello would block
                # serve_forever itself, stalling every other connection
                # on the threaded server.  Bounded so a silent peer
                # releases the thread.
                old = self.request.gettimeout()
                self.request.settimeout(30.0)
                self.request.do_handshake()
                self.request.settimeout(old)
                super().setup()

    server_cls = ThreadingHTTPServer if batcher is not None else HTTPServer
    server = server_cls((host, port), Handler)
    if tls_cert is not None:
        server.socket = ctx.wrap_socket(server.socket, server_side=True,
                                        do_handshake_on_connect=False)
    return server


def serve_http(predictor: Predictor, host: str = "127.0.0.1",
               port: int = 8000, batch_window_ms: float = 0.0,
               max_batch: int = 32, max_queue: int = 128,
               auth_token: Optional[str] = None,
               tls_cert: Optional[str] = None,
               tls_key: Optional[str] = None) -> None:
    server = make_http_server(predictor, host, port, batch_window_ms,
                              max_batch, max_queue, auth_token,
                              tls_cert, tls_key)
    mode = (f"micro-batching ({batch_window_ms} ms window, max {max_batch}, "
            f"queue bound {max_queue})"
            if batch_window_ms > 0 else "single-threaded")
    if auth_token is not None:
        mode += ", bearer auth"
    scheme = "https" if tls_cert is not None else "http"
    endpoints = ("POST /predict; GET /healthz"
                 if isinstance(predictor, DaicPredictor)
                 else "POST /predict, /predict_bin, /predict_stream; "
                      "GET /healthz")
    print(f"serving {predictor.task} on {scheme}://{host}:{port} "
          f"({endpoints}; {mode})")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.server_close()
