"""Serving predictors: raw audio/text -> features -> model forward.

The reference has no inference path at all -- predictions exist only
inside its evaluation scripts.  :class:`Predictor` packages the full EATD
pipeline for deployment (raw 3-answer audio (+ transcripts) ->
log-mel/NetVLAD + text embedding -> branch or fusion model -> label /
SDS score) with the device-side compute jitted once and reused across
requests; :class:`DaicPredictor` is the DAIC counterpart (raw interview
session -> PHQ8).  Batch APIs share one device dispatch per modality;
per-speaker features are memoised in a content-addressed LRU
(:class:`_FeatureCache`) holding DEVICE arrays, so repeat speakers skip
the (relay-transfer-bound) extraction entirely.  The HTTP front lives in
:mod:`.transport`; ``icassp2022_depression_tpu.serve`` re-exports both
halves as the stable public surface.
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
                 vggish_postprocessor=None, model_cfg=None,
                 segmenter: str = "auto"):
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

        ``segmenter`` must match the one extraction used
        (``extract-text --segmenter``, recorded in the extraction
        sidecar and propagated to the checkpoint sidecar as
        ``text_segmenter``); :meth:`from_checkpoint` adopts the
        checkpoint's value automatically.
        """
        assert task in TASKS, f"task must be one of {TASKS}"
        assert audio_embedder in ("netvlad", "vggish")
        # resolve eagerly so an unknown name fails at construction, not
        # on the first text request
        self.segmenter = segmenter
        if not task.startswith("audio"):
            text_fe.get_segmenter(segmenter)
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

        When the checkpoint's sidecar records which text embedder /
        segmenter produced its training features (``text_embedder`` /
        ``text_segmenter``, written by the CLI trainers from the
        extraction sidecar), the resolved serving embedder is checked
        against it and a mismatch warns loudly; the segmenter is ADOPTED
        automatically unless the caller passed one explicitly (then a
        mismatch warns)."""
        if str(path).endswith(".pt"):
            # reference whole-module pickle (torch.save(model),
            # audio_gru_whole.py:125) — extract + map, then take the
            # reference-weights serving path with its ELMo warning
            from icassp2022_depression_tpu.models import porting

            return cls.from_torch_state_dict(
                porting.load_reference_pt(path), task, **kw)
        module, mcfg = _model_for(task)
        if kw.get("model_cfg") is not None:
            mcfg = kw["model_cfg"]
        if module is fusion:
            template = fusion.init(jax.random.PRNGKey(0), mcfg)
        else:
            template = module.init(jax.random.PRNGKey(0), mcfg)
        params = checkpoints.load(path, like=template)
        try:
            meta = checkpoints.load_meta(path)
        except (FileNotFoundError, ValueError):
            meta = {}
        expected = meta.get("text_embedder")
        trained_seg = meta.get("text_segmenter")
        if trained_seg and "segmenter" not in kw:
            kw = dict(kw, segmenter=trained_seg)
            if trained_seg != "auto":
                import sys

                print(f"Predictor: adopting segmenter '{trained_seg}' "
                      f"recorded by the checkpoint's training features",
                      file=sys.stderr)
        predictor = cls(params, task, **kw)
        if (expected and predictor.embedder_id
                and expected != predictor.embedder_id):
            import sys

            print(f"WARNING: checkpoint {path} was trained on features "
                  f"from embedder '{expected}' but serving resolved "
                  f"'{predictor.embedder_id}' — predictions will be "
                  "meaningless; pass matching elmo_weights",
                  file=sys.stderr)
        if (trained_seg and predictor.segmenter != trained_seg
                and not task.startswith("audio")):
            import sys

            print(f"WARNING: checkpoint {path} was trained on features "
                  f"segmented by '{trained_seg}' but serving uses "
                  f"'{predictor.segmenter}' — text features will not "
                  "match training", file=sys.stderr)
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

    def _stack_rows(self, rows, dim: Optional[int] = None) -> jnp.ndarray:
        """[3, D] rows -> [N, 3, D] device array (empty-safe: zero
        speakers is a valid request answered with zero results)."""
        if not rows:
            return jnp.zeros(
                (0, 3, self.frontend_cfg.netvlad_output_dim
                 if dim is None else dim), jnp.float32)
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
                vggish.warn_standin_weights()
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
        """[[pos, neu, neg], ...] transcripts -> [N, 3, 1024] embeddings.

        ONE readback for API compatibility; the predict path uses the
        device rows directly (no round-trip)."""
        return np.asarray(
            self._stack_rows(self._text_feature_rows(texts_per_speaker),
                             dim=self._text_dim))

    def _text_feature_rows(self, texts_per_speaker):
        """Cache-aware embedding -> list of per-speaker [3, D] DEVICE
        arrays (the text twin of :meth:`_audio_feature_rows`): the
        embedder's pooled chunks stay device-resident into the model
        forward, saving the blocking relay readback per cold request, and
        cache hits are device arrays."""
        if texts_per_speaker is None or any(
                ts is None for ts in texts_per_speaker):
            raise ValueError(
                f"task {self.task!r} needs 3 transcripts per speaker; "
                "got None (speaker has no transcript files?)")
        n = len(texts_per_speaker)
        keys = [_FeatureCache.key(["text"] + list(ts))
                for ts in texts_per_speaker]
        rows: list = [None] * n
        todo = []
        for i, key in enumerate(keys):
            cached = self.feature_cache.get(key)
            if cached is not None:
                rows[i] = cached
            else:
                todo.append(i)
        if todo:
            sentences = [text_fe.tokenize(t, segmenter=self.segmenter)
                         for i in todo
                         for t in texts_per_speaker[i]]
            flat = self._text_embed(sentences, device=True)
            flat = flat.reshape(len(todo), 3, -1)
            for row, i in enumerate(todo):
                # indexing a jax array materialises a NEW device buffer,
                # so (unlike a NumPy slice view) caching it does not pin
                # the whole batch array
                rows[i] = flat[row]
                self.feature_cache.put(keys[i], flat[row])
        return rows

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
            # same device-resident fast path as audio: embedding chunks
            # feed the model forward without a host round-trip
            tf = self._stack_rows(
                self._text_feature_rows(texts_per_speaker),
                dim=self._text_dim)
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
                 frontend_cfg: C.FrontendConfig = C.FrontendConfig(),
                 multimodal: bool = False, elmo_cfg=None, elmo_params=None,
                 seed: int = 0, elmo_weights: Optional[str] = "auto",
                 segmenter: str = "auto",
                 feature_cache_entries: int = 1024):
        """``multimodal=True`` serves ``train-daic --multimodal``
        checkpoints: per-response text embeddings (resolved exactly like
        ``extract-daic --multimodal``, see
        ``frontend.text.make_embedder``) are concatenated onto the audio
        features; the model's ``embedding_size`` must equal
        audio_dim + text_dim (``from_checkpoint`` resizes from the
        checkpoint's recorded ``embedding_size``)."""
        assert task in self.TASKS, f"task must be one of {self.TASKS}"
        from icassp2022_depression_tpu.train import daic as daic_train

        self.task = task
        self.params = params
        self.tcfg = tcfg if tcfg is not None else (
            daic_train.DAIC_CLF if task == "daic_clf"
            else daic_train.DAIC_REG)
        self.frontend_cfg = frontend_cfg
        # per-RESPONSE (not per-participant) LRU: repeat participants hit
        # it fully, and sessions sharing responses hit partially; entries
        # are device arrays, so hits also skip the relay upload
        self.feature_cache = _FeatureCache(feature_cache_entries)
        self.multimodal = multimodal
        self.segmenter = segmenter
        self._text_embed = None
        self._text_dim = 0
        #: provenance id of the resolved text embedder (multimodal only;
        #: same id scheme as extraction sidecars — see Predictor)
        self.embedder_id: Optional[str] = None
        if multimodal:
            text_fe.get_segmenter(segmenter)   # fail fast on bad names
            self._text_embed, text_dim, self.embedder_id = \
                text_fe.make_embedder(
                    params=elmo_params, cfg=elmo_cfg, seed=seed,
                    elmo_weights=elmo_weights, with_id=True)
            self._text_dim = text_dim
            expect = frontend_cfg.netvlad_output_dim + text_dim
            if self.tcfg.model.embedding_size != expect:
                raise ValueError(
                    f"multimodal DAIC model expects embedding_size "
                    f"{self.tcfg.model.embedding_size} but audio+text "
                    f"features are {expect}-d "
                    f"({frontend_cfg.netvlad_output_dim}+{text_dim}) — "
                    "pass the elmo_cfg/elmo_weights used at extraction")
        mcfg = self.tcfg.model
        self._apply = jax.jit(
            lambda p, x, m: audio_net.apply(p, mcfg, x, train=False,
                                            time_mask=m))

    @classmethod
    def from_checkpoint(cls, path, task: str, tcfg=None, **kw):
        """Load a ``train-daic`` checkpoint.  The sidecar's recorded
        ``embedding_size`` (written by the trainer; inferred from the
        stored gate-weight shapes for older checkpoints) resizes the
        model config automatically, and a non-default size implies a
        ``--multimodal`` checkpoint unless the caller says otherwise.
        Text provenance recorded by the trainer (``text_embedder`` /
        ``text_segmenter`` / ``text_seed``, from the extraction sidecar)
        is adopted: segmenter and seed feed the serving embedder unless
        the caller passed their own, and an embedder-id mismatch warns
        loudly (same contract as :meth:`Predictor.from_checkpoint`)."""
        import sys

        from icassp2022_depression_tpu.train import daic as daic_train

        resolved = tcfg if tcfg is not None else (
            daic_train.DAIC_CLF if task == "daic_clf"
            else daic_train.DAIC_REG)
        try:
            meta = checkpoints.load_meta(path)
        except (FileNotFoundError, ValueError):
            meta = {}
        sd_pt = None
        if str(path).endswith(".pt"):
            from icassp2022_depression_tpu.models import porting

            sd_pt = porting.load_reference_pt(path)
        emb = meta.get("embedding_size")
        if not emb:
            # pre-meta checkpoint: the stored first-layer gate weight is
            # [3H, embedding], so the true input width is recoverable
            if sd_pt is not None:
                emb = int(sd_pt["lstm_net_audio.weight_ih_l0"].shape[1])
            else:
                npz = str(path)
                if not npz.endswith(".npz"):
                    npz += ".npz"
                with np.load(npz) as z:
                    emb = int(z["rnn/0/fwd/w_ih"].shape[1])
        if int(emb) != resolved.model.embedding_size:
            resolved = C.replace(resolved, model=C.replace(
                resolved.model, embedding_size=int(emb)))
        audio_dim = kw.get("frontend_cfg",
                           C.FrontendConfig()).netvlad_output_dim
        if "multimodal" not in kw and int(emb) != audio_dim:
            kw = dict(kw, multimodal=True)
            print(f"DaicPredictor: checkpoint records embedding_size "
                  f"{emb} != audio dim {audio_dim} — serving it as a "
                  "--multimodal model (audio + per-response text)",
                  file=sys.stderr)
        trained_seg = meta.get("text_segmenter")
        if trained_seg and "segmenter" not in kw:
            kw = dict(kw, segmenter=trained_seg)
            if trained_seg != "auto":
                print(f"DaicPredictor: adopting segmenter "
                      f"'{trained_seg}' recorded by the checkpoint's "
                      "training features", file=sys.stderr)
        if meta.get("text_seed") is not None and "seed" not in kw:
            kw = dict(kw, seed=int(meta["text_seed"]))
        if sd_pt is not None:
            from icassp2022_depression_tpu.models import porting

            params = porting.audio_net_from_state_dict(sd_pt,
                                                       resolved.model)
        else:
            template = audio_net.init(jax.random.PRNGKey(0),
                                      resolved.model)
            params = checkpoints.load(path, like=template)
        predictor = cls(params, task, tcfg=resolved, **kw)
        expected = meta.get("text_embedder")
        if (expected and predictor.embedder_id
                and expected != predictor.embedder_id):
            print(f"WARNING: checkpoint {path} was trained on text "
                  f"features from embedder '{expected}' but serving "
                  f"resolved '{predictor.embedder_id}' — predictions "
                  "will be meaningless; pass matching elmo_weights",
                  file=sys.stderr)
        return predictor

    @staticmethod
    def _flatten_signals(signals_per_participant, sample_rates,
                         start_ordinals):
        """Ragged per-participant response lists -> flat (waveforms, srs,
        ordinals, counts) for ONE fused ``extract_batch`` dispatch."""
        counts = [len(s) for s in signals_per_participant]
        flat = [w for sig in signals_per_participant for w in sig]
        srs = [sample_rates[i] for i, c in enumerate(counts)
               for _ in range(c)]
        if start_ordinals is None:
            ords = [k for c in counts for k in range(c)]
        else:
            ords = [start_ordinals[i] + k
                    for i, c in enumerate(counts) for k in range(c)]
        return flat, srs, ords, counts

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
        flat, srs, ords, counts = self._flatten_signals(
            signals_per_participant, sample_rates, start_ordinals)
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

    def _predict_flat(self, flat: jnp.ndarray, counts) -> List[dict]:
        """Flat [M, D] DEVICE response features + per-participant counts
        -> result dicts, with the padded ragged batch built ON DEVICE by
        an index gather (a zeros sentinel row fills the padding slots) —
        the DAIC twin of the EATD device-resident fast path: no host
        readback between extraction/embedding and the model forward."""
        n = len(counts)
        m = int(sum(counts))
        bucket_r = _pow2(max(counts))
        bucket_n = _pow2(n)
        idx = np.full((bucket_n, bucket_r), m, np.int64)  # m -> zeros row
        mask = np.ones((bucket_n, bucket_r), np.float32)  # pad rows: all
        pos = 0                                           # ones, avoid 0/0
        for i, c in enumerate(counts):
            idx[i, :c] = np.arange(pos, pos + c)
            mask[i, c:] = 0.0
            pos += c
        x = jnp.concatenate(
            [flat, jnp.zeros((1, flat.shape[-1]), flat.dtype)]
        )[jnp.asarray(idx)]
        out = np.asarray(self._apply(self.params, x,
                                     jnp.asarray(mask)))[:n]
        return _format_outputs(out, self.task.endswith("clf"),
                               "phq8_score")

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
                        start_ordinals=None,
                        texts_per_participant=None) -> List[dict]:
        """Pre-segmented response signals (+ aligned per-response
        transcripts for multimodal models) -> result dicts.

        Device-resident fast path: audio features (and multimodal text
        embeddings) stay ON DEVICE from extraction through the model
        forward — one relay round-trip per request (the final output
        readback), like the EATD ``predict_batch`` path.  Per-response
        features are memoised in the content-addressed LRU, so repeat
        participants skip extraction (and its relay transfer) entirely."""
        if self.multimodal:
            if texts_per_participant is None:
                raise ValueError(
                    "multimodal DAIC model: per-response transcripts are "
                    "required (one texts list per participant, aligned "
                    "1:1 with its response signals)")
            if len(texts_per_participant) != len(signals_per_participant) \
                    or any(len(t) != len(s) for t, s in
                           zip(texts_per_participant,
                               signals_per_participant)):
                raise ValueError("per-participant texts must align 1:1 "
                                 "with response signals")
        flat_w, srs, ords, counts = self._flatten_signals(
            signals_per_participant, sample_rates, start_ordinals)
        if not counts:
            return []   # zero participants is a valid request
        if any(c == 0 for c in counts):
            raise ValueError("participant with zero segmented responses "
                             "(no transcript line matched the question "
                             "bank?) — nothing to pool over")
        texts_flat = ([t for ts in texts_per_participant for t in ts]
                      if self.multimodal else None)
        # default ordinals ARE 0-based per participant, so a repeat
        # participant keys identically regardless of batch composition
        keys = [_FeatureCache.key(
                    ["daic", self.embedder_id or "", str(ords[i]),
                     str(srs[i]), flat_w[i]]
                    + ([texts_flat[i]] if texts_flat is not None else []))
                for i in range(len(flat_w))]
        rows: list = [None] * len(keys)
        todo = []
        for i, key in enumerate(keys):
            cached = self.feature_cache.get(key)
            if cached is not None:
                rows[i] = cached
            else:
                todo.append(i)
        if todo:
            feats = audio_fe.extract_batch(
                [flat_w[i] for i in todo], [srs[i] for i in todo],
                self.frontend_cfg, ordinals=[ords[i] for i in todo],
                device=True)
            if self.multimodal:
                tokens = [text_fe.tokenize(texts_flat[i],
                                           segmenter=self.segmenter)
                          for i in todo]
                emb = self._text_embed(tokens, device=True)
                feats = jnp.concatenate([feats, emb], axis=-1)
            for row, i in enumerate(todo):
                # indexing a jax array materialises a NEW device buffer,
                # so caching it does not pin the whole batch array
                rows[i] = feats[row]
                self.feature_cache.put(keys[i], feats[row])
        return self._predict_flat(jnp.stack(rows), counts)

    def predict_participant(self, daic_dir, number: int,
                            queries_path=None, start_ordinal: int = 0
                            ) -> dict:
        """Raw ``<daic_dir>/<number>_P`` session -> one result dict
        (reads/segments/embeds via the extraction-side
        ``extract_participant``/``extract_participant_multimodal`` — one
        definition of the session pipeline per modality set)."""
        from icassp2022_depression_tpu.frontend import daic as daic_fe

        if self.multimodal:
            from icassp2022_depression_tpu.train.daic import (
                concat_multimodal,
            )

            af, tf = daic_fe.extract_participant_multimodal(
                Path(daic_dir), number, daic_fe.load_queries(queries_path),
                None, None, self.frontend_cfg, start_ordinal,
                embed_fn=self._text_embed, segmenter=self.segmenter)
            feats = concat_multimodal([af], [tf])[0]
        else:
            feats = daic_fe.extract_participant(
                Path(daic_dir), number, daic_fe.load_queries(queries_path),
                self.frontend_cfg, start_ordinal)
        return self.predict_features([feats])[0]


