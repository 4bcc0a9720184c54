"""EATD audio frontend: batched wav2vlad on TPU.

Reference (``Classification/audio_features_whole.py:57-72,74-131``):
``wav2vlad`` = librosa log-mel -> a *freshly constructed* loupe_keras
NetVLAD layer run in a throwaway TF1 session per utterance — the hottest
loop of the whole pipeline (3 x 162 graph builds for EATD).

TPU-native design: utterances are grouped into padded length buckets, the
log-mel + masked NetVLAD pipeline is one jitted program per bucket shape
(compiled once, reused), and the whole bucket is processed as a single
``vmap`` batch.  NetVLAD weights are PRNG-derived per utterance ordinal
(see :mod:`..ops.netvlad` for the reproducibility note).

Output layout matches the reference exactly: each speaker contributes a
``[3, 1, 256]`` block (``audio_features_whole.py:111-112``), saved as
``whole_samples_{clf,reg}_256.npz`` / ``whole_labels_{clf,reg}_256.npz``
(the reference runs twice toggling a commented line for clf vs reg labels
— ``:113-114``; we emit both in one pass).
"""

from __future__ import annotations

import functools
from pathlib import Path
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from icassp2022_depression_tpu.config import FrontendConfig
from icassp2022_depression_tpu.data import eatd
from icassp2022_depression_tpu.ops import mel, netvlad
from icassp2022_depression_tpu.utils import hostio, shapes


def _bucket_length(n: int, min_len: int = 16384) -> int:
    """Next power-of-two padded length (bounded recompilation: one compile
    per bucket, ~log2 buckets overall)."""
    return shapes.next_pow2(n, minimum=min_len)


@functools.partial(jax.jit,
                   static_argnames=("blen", "sr", "n_fft", "hop", "n_mels",
                                    "nv_seed", "nv_clusters", "nv_dim"))
def _bucket_pipeline_flat(flat, offsets, written, lengths, ordinals, blen,
                          sr, n_fft, hop, n_mels, log_floor, nv_seed,
                          nv_clusters, nv_dim):
    """Flat-packed bucket -> [B, output_dim] features.

    ``flat`` is every utterance's true samples (plus its host-computed
    reflected tail) concatenated back to back — the transfer carries ONLY
    real bytes.  The padded [B, blen] row matrix the mel kernel wants is
    materialised ON DEVICE (row i reads
    ``flat[offsets[i] : offsets[i] + written[i]]``, zeros beyond): the
    host->device relay moves ~44 MB/s while the on-chip unpack is
    HBM-speed, so shipping the power-of-two zero padding (up to ~4x the
    payload) was the measured bottleneck of the whole extraction
    pipeline, not compute.

    The unpack is a vmapped ``dynamic_slice`` (contiguous rows, ~15x
    faster on TPU than the equivalent arbitrary [B, blen] gather).  The
    caller sizes ``flat`` so ``offset + blen`` stays in bounds for every
    row: XLA *clamps* out-of-bounds slice starts, which would silently
    misalign tail rows instead of erroring."""
    j = jnp.arange(blen, dtype=jnp.int32)[None, :]
    rows = jax.vmap(
        lambda off: jax.lax.dynamic_slice(flat, (off,), (blen,)))(offsets)
    wavs = jnp.where(j < written[:, None], rows, 0).astype(jnp.float32)
    lm = mel.batched_log_mel(wavs, sr, n_fft, hop, n_mels, log_floor, True)
    fmask = mel.frame_mask(lengths, lm.shape[1], hop)
    # per-utterance NetVLAD params derive INSIDE the same program (the
    # ordinal-keyed threefry stream is bit-deterministic regardless of
    # where it is traced), so each bucket is exactly ONE compiled
    # program and one dispatch — this matters on the serving cold path,
    # where every dispatch rides the latency-bound relay
    nv_params = netvlad.batched_per_utterance_params(
        nv_seed, ordinals, n_mels, nv_clusters, nv_dim)
    return jax.vmap(netvlad.netvlad)(nv_params, lm, fmask)


def extract_batch(waveforms: Sequence[np.ndarray], sample_rates: Sequence[int],
                  cfg: FrontendConfig = FrontendConfig(),
                  start_ordinal: int = 0,
                  ordinals: Optional[Sequence[int]] = None,
                  device: bool = False):
    """wav2vlad over a list of variable-length utterances -> [N, output_dim].

    Utterances are bucketed by padded length; each bucket is one device
    dispatch.  Per-utterance NetVLAD params are keyed by ordinal —
    consecutive from ``start_ordinal``, or explicit via ``ordinals`` (the
    incremental-extraction path, where only a subset of corpus positions is
    recomputed).

    ``device=True`` returns the features as a DEVICE array in input order
    (on-device reorder, no host readback) — the serving path feeds them
    straight into the model forward, eliminating one blocking relay
    round-trip per request.
    """
    n = len(waveforms)
    # the reference substitutes 5 s of 1e-4 "silence" for empty audio at
    # the corpus reader (audio_features_whole.py:105-110); serving feeds
    # raw request waveforms straight in, so apply the SAME fallback here
    # — a zero-length signal would otherwise pool one junk log-floor
    # frame into a confident nonsense feature
    waveforms = [np.asarray(w) if len(w)
                 else eatd.silence_fallback(sr, cfg.silence_amplitude,
                                            cfg.silence_seconds)
                 for w, sr in zip(waveforms, sample_rates)]
    out = np.zeros((n, cfg.netvlad_output_dim), np.float32)
    buckets: dict = {}

    def _is_pcm(w) -> bool:
        """int16-representable waveform (raw PCM shorts cast to float by
        the readers) -> eligible for half-width transfer.  The silence
        fallback (1e-4 floats) and any processed audio stay f32.

        Verified in bounded chunks with ONE int16-cast round trip per
        chunk (the equality catches non-integral values, overflow wrap
        and NaN/inf in the same pass): the corpus readers return float64
        (reference dtype path), so whole-array ``abs``+``round`` here
        cost several full passes over 4x-width temporaries on the
        one-core host."""
        if w.dtype in (np.int16,):
            return True
        if w.dtype not in (np.float32, np.float64):
            return False
        if len(w) == 0:
            return True
        # cheap strided probe rejects typical float audio without a pass
        probe = w[:: max(1, len(w) // 64)]
        if (np.max(np.abs(probe)) > 32767
                or not np.all(probe == np.round(probe))):
            return False
        with np.errstate(invalid="ignore"):   # NaN->int cast is a no-warn miss
            for lo in range(0, len(w), 1 << 20):
                c = w[lo:lo + (1 << 20)]
                if not np.array_equal(c.astype(np.int16), c):
                    return False
        return True

    pcm_flags = [_is_pcm(np.asarray(w)) for w in waveforms]
    tail = cfg.n_fft // 2
    for i, (w, sr) in enumerate(zip(waveforms, sample_rates)):
        # mel banks are sr-dependent -> per-(length, sr, dtype) buckets;
        # bucket length reserves room for the reflected tail (below)
        buckets.setdefault((_bucket_length(len(w) + tail), sr, pcm_flags[i]),
                           []).append(i)

    from icassp2022_depression_tpu.utils import profiling

    # Stage 1: enqueue every bucket's host->device transfer up front so
    # the copies overlap earlier buckets' compute — JAX dispatch is async,
    # so nothing here blocks.  Each bucket ships ONE flat array of the
    # true samples (+ per-utterance reflected tails) — never the padded
    # [B, blen] zero matrix, whose padding bytes dominated transfer time
    # (the relay's host->device direction measures ~44 MB/s); the padded
    # rows are rebuilt on device by `_bucket_pipeline_flat`'s gather.
    staged = []
    for (blen, sr, is_pcm), idxs in buckets.items():
        # pad the batch dimension to a multiple of 8 so each length bucket
        # compiles for at most a handful of batch shapes
        brows = -(-len(idxs) // 8) * 8
        dtype = np.int16 if is_pcm else np.float32
        # staged as int64 so a too-large batch reaches the explicit guard
        # below instead of a cryptic numpy OverflowError; cast to the
        # device's int32 after the guard
        offsets = np.zeros((brows,), np.int64)
        written = np.zeros((brows,), np.int64)
        lengths = np.zeros((brows,), np.int64)
        row_ordinals = np.zeros((brows,), np.int64)
        pos = 0
        for row, i in enumerate(idxs):
            nw = len(waveforms[i])
            offsets[row] = pos
            lengths[row] = nw
            # each row ships its true samples plus a reflected tail (below)
            written[row] = nw + min(tail, blen - nw)
            row_ordinals[row] = (ordinals[i] if ordinals is not None
                                 else start_ordinal + i)
            pos += int(written[row])
        # flat length quantized to 1/8-pow2 steps: still-bounded compile
        # keys (8 per octave) with the padding bytes capped at 12.5% of
        # payload — a pure pow2 here shipped up to ~2x the real PCM over
        # the relay's volatile uplink (measured 151 MB for 80.6 MB real
        # at bench scale), which dominated extraction time.  One extra
        # row length is reserved so every row's dynamic_slice window
        # fits without start clamping (see `_bucket_pipeline_flat`).
        if pos + blen > np.iinfo(np.int32).max:
            raise ValueError(
                f"bucket of {len(idxs)} utterances packs {pos} samples — "
                "flat offsets are int32 on device; split the call (e.g. "
                "extract in per-split or per-speaker-group chunks)")
        flat_len = shapes.next_quantized(max(pos, 1) + blen, minimum=16384)
        flat = np.zeros((flat_len,), dtype)
        for row, i in enumerate(idxs):
            w = waveforms[i]
            nw = len(w)
            lo = int(offsets[row])
            end = lo + nw
            # slice assignment casts into the wire dtype in place — no
            # per-utterance astype/concatenate copies (~0.18 s -> ~0.05 s
            # host packing at the 486-utterance bench scale, one core)
            flat[lo:end] = w
            t_room = int(written[row]) - nw
            if t_room <= 0:
                continue
            # librosa's centered STFT reflect-pads at the TRUE signal end;
            # bucket zero-padding would make the last ~2 valid frames read
            # zeros instead, so append the reflected tail to the stream
            if nw > 1 and t_room < nw:
                # single-bounce reflect: w[-2], w[-3], ... (edge excluded)
                stop = nw - 2 - t_room
                flat[end:end + t_room] = \
                    w[nw - 2: (stop if stop >= 0 else None): -1]
            elif nw > 1:
                # multi-bounce reflection for very short signals
                flat[end:end + t_room] = np.pad(w, (0, t_room),
                                                mode="reflect")[nw:]
            else:
                flat[end:end + t_room] = w[0]   # edge pad for 1 sample
        staged.append((blen, sr, idxs, jnp.asarray(flat),
                       jnp.asarray(offsets.astype(np.int32)),
                       jnp.asarray(written.astype(np.int32)),
                       jnp.asarray(lengths.astype(np.int32)),
                       jnp.asarray(row_ordinals.astype(np.int32))))

    # Stage 2: dispatch compute per bucket (transfers already in flight).
    # Readback is deferred and fused into ONE device->host transfer: the
    # relay's per-round-trip latency (~0.5 s here) dwarfs the payload, so
    # a blocking np.asarray per bucket would serialize K latencies.
    computed = []
    for (blen, sr, idxs, flat_d, offsets_d, written_d, lengths_d,
         ordinals_d) in staged:
        with profiling.annotate(f"wav2vlad/bucket{blen}"):
            feats = _bucket_pipeline_flat(flat_d, offsets_d, written_d,
                                          lengths_d, ordinals_d, blen, sr,
                                          cfg.n_fft, cfg.hop_length,
                                          cfg.n_mels, cfg.log_floor,
                                          cfg.netvlad_seed,
                                          cfg.netvlad_clusters,
                                          cfg.netvlad_output_dim)
            computed.append((idxs, feats[:len(idxs)]))
    if device:
        n_utts = len(waveforms)
        if not computed:
            return jnp.zeros((n_utts, cfg.netvlad_output_dim), jnp.float32)
        merged_d = (computed[0][1] if len(computed) == 1
                    else jnp.concatenate([f for _, f in computed], axis=0))
        # invert the bucket grouping on device: row k of the result is
        # the utterance k of the input order
        order = np.concatenate([np.asarray(idxs, np.int64)
                                for idxs, _ in computed])
        perm = np.empty(n_utts, np.int64)
        perm[order] = np.arange(len(order))
        return merged_d[jnp.asarray(perm)]
    if computed:
        with profiling.annotate("wav2vlad/readback"):
            merged = np.asarray(jnp.concatenate([f for _, f in computed],
                                                axis=0))
        pos = 0
        for idxs, f in computed:
            out[np.asarray(idxs)] = merged[pos:pos + len(idxs)]
            pos += len(idxs)
    return out


def extract_eatd(root: Path, cfg: FrontendConfig = FrontendConfig(),
                 out_dir: Optional[Path] = None,
                 max_id: int = eatd.MAX_SPEAKER_ID,
                 sds_threshold: float = 53.0,
                 incremental: bool = False):
    """Full EATD audio pass: [N, 3, 1, 256] features + reg/clf labels.

    Returns (features, sds_targets, clf_targets, manifest); with ``out_dir``
    also writes the four reference-layout npz files plus a per-speaker
    manifest (extraction status for resumable reruns — the reference's only
    fault handling is silently skipping missing dirs).

    ``incremental`` (requires ``out_dir``): reuse a per-speaker feature
    cache from a previous pass — only speakers absent from the cache are
    re-embedded, so an interrupted or extended corpus pass resumes instead
    of recomputing.  Cache entries are keyed by (speaker, corpus
    position, frontend-config fingerprint): a changed config OR a layout
    change that shifts a speaker's position (per-utterance NetVLAD
    ordinals are ``3*position+k``) invalidates exactly the affected
    entries instead of silently reusing features computed under different
    parameters.
    """
    import hashlib
    import json as _json

    # every field that changes the computed features participates in the
    # cache key; ordinal position is appended per speaker below
    fp = hashlib.md5(_json.dumps([
        cfg.netvlad_seed, cfg.n_mels, cfg.netvlad_clusters,
        cfg.netvlad_output_dim, cfg.n_fft, cfg.hop_length, cfg.log_floor,
        cfg.silence_amplitude, cfg.silence_seconds,
    ]).encode()).hexdigest()[:10]

    def cache_key(sp, idx: int) -> str:
        return f"{sp.split}/{sp.number}@{idx}|{fp}"

    cache: dict = {}
    cache_path = (Path(out_dir) / "speaker_cache.npz"
                  if out_dir is not None else None)
    if incremental and cache_path is not None and cache_path.exists():
        cache = dict(np.load(cache_path))

    waveforms: List[np.ndarray] = []
    rates: List[int] = []
    sds: List[float] = []
    manifest = []
    speakers = []
    todo_ordinals: List[int] = []
    min_len, max_len = float("inf"), 0.0
    for idx, sp in enumerate(eatd.load_speakers(root, max_id=max_id,
                                                read_text=False)):
        speakers.append(sp)
        sds.append(sp.sds)
        cached = incremental and cache_key(sp, idx) in cache
        manifest.append({"split": sp.split, "number": sp.number,
                         "status": "cached" if cached else "ok"})
        if cached:
            continue
        for w, sr, dur in zip(sp.waveforms, sp.sample_rates, sp.durations):
            waveforms.append(w)
            rates.append(sr)
            min_len = min(min_len, dur)
            max_len = max(max_len, dur)
        todo_ordinals.append(idx)

    n = len(sds)
    features = np.zeros((n, 3, 1, cfg.netvlad_output_dim), np.float32)
    if todo_ordinals:
        utt_ordinals = [3 * idx + k for idx in todo_ordinals for k in range(3)]
        flat = extract_batch(waveforms, rates, cfg, ordinals=utt_ordinals)
        for j, idx in enumerate(todo_ordinals):
            features[idx] = flat[3 * j: 3 * j + 3, None, :]
    for idx, sp in enumerate(speakers):
        key = cache_key(sp, idx)
        if incremental and key in cache:
            features[idx] = cache[key]
    if incremental and cache_path is not None:
        cache_path.parent.mkdir(parents=True, exist_ok=True)
        np.savez(cache_path, **{cache_key(sp, idx): features[idx]
                                for idx, sp in enumerate(speakers)})
    sds_targets, clf_targets = eatd_targets(sds, sds_threshold)

    if out_dir is not None:
        out_dir = Path(out_dir)
        out_dir.mkdir(parents=True, exist_ok=True)
        dim = cfg.netvlad_output_dim
        np.savez(out_dir / f"whole_samples_reg_{dim}.npz", features)
        np.savez(out_dir / f"whole_labels_reg_{dim}.npz", sds_targets)
        np.savez(out_dir / f"whole_samples_clf_{dim}.npz", features)
        np.savez(out_dir / f"whole_labels_clf_{dim}.npz", clf_targets)
        import json

        # durations were only measured for non-cached speakers; merge with
        # the previous manifest so incremental reruns keep corpus-wide stats
        prev = {}
        manifest_path = out_dir / "manifest.json"
        if incremental and manifest_path.exists():
            try:
                prev = json.loads(manifest_path.read_text())
            except ValueError:
                prev = {}
        if prev.get("min_len_s") is not None:
            min_len = min(min_len, prev["min_len_s"])
        if prev.get("max_len_s") is not None:
            max_len = max(max_len, prev["max_len_s"])
        manifest_path.write_text(json.dumps(
            {"speakers": manifest,
             # None (not bare Infinity, which is invalid JSON) when no
             # duration has ever been measured
             "min_len_s": min_len if np.isfinite(min_len) else None,
             "max_len_s": max_len if max_len > 0 else None}, indent=2))
    return features, sds_targets, clf_targets, manifest


def extract_eatd_device(root: Path, cfg: FrontendConfig = FrontendConfig(),
                        max_id: int = eatd.MAX_SPEAKER_ID,
                        sds_threshold: float = 53.0):
    """Fused-pipeline EATD audio pass: features stay DEVICE-resident.

    The fused extract->train path (``cli train --corpus``, bench
    ``bench_e2e_fused``): one corpus read, one flat-packed PCM upload, and
    the [N, 3, output_dim] feature array is returned as a DEVICE array the
    trainers consume directly (their fold data is then built by on-device
    gathers — ``train.loop.fold_data_from_plans``), so features never
    cross the relay back to the host.  Labels are host arrays (tiny).
    Same math/ordinals as :func:`extract_eatd`; no npz/manifest artifacts
    (use ``extract_eatd`` for the persisted reference-layout files).

    Returns (device features [N, 3, output_dim], sds_targets [N] f32,
    clf_targets [N] int64).
    """
    waveforms, rates, sds, _ = _corpus_utterances(root, max_id)
    flat = extract_batch(waveforms, rates, cfg, device=True)
    feats = flat.reshape(len(sds), 3, cfg.netvlad_output_dim)
    sds_targets, clf_targets = eatd_targets(sds, sds_threshold)
    return feats, sds_targets, clf_targets


def _corpus_utterances(root: Path, max_id: int):
    """Flatten the corpus into per-utterance lists in ``load_speakers``
    order (3 utterances per speaker) — the shared front half of the
    non-incremental extraction entry points.  Returns (waveforms, rates,
    sds, manifest)."""
    waveforms: List[np.ndarray] = []
    rates: List[int] = []
    sds: List[float] = []
    manifest = []
    for sp in eatd.load_speakers(root, max_id=max_id, read_text=False):
        sds.append(sp.sds)
        manifest.append({"split": sp.split, "number": sp.number,
                         "status": "ok"})
        for w, sr in zip(sp.waveforms, sp.sample_rates):
            waveforms.append(np.asarray(w))
            rates.append(sr)
    return waveforms, rates, sds, manifest


# the label rule is corpus math, owned by the corpus reader
eatd_targets = eatd.eatd_targets


def vggish_embed_waveforms(params, waveforms: Sequence[np.ndarray],
                           sample_rates: Sequence[int],
                           postprocessor=None) -> np.ndarray:
    """Waveforms -> per-utterance mean-pooled VGGish embeddings
    [n_utt, 128].

    The one batched VGGish entry point — corpus extraction AND serving
    both embed through here, so a checkpoint trained on these features
    is served on identically-computed ones.  All utterances' 0.96 s
    examples go through fixed 256-example chunks of ONE jitted conv
    stack (single compiled shape, early conv feature maps bounded in
    HBM), dispatched first and read back ONCE (the relay is
    latency-bound).  Utterances shorter than one example embed as zero
    vectors."""
    from icassp2022_depression_tpu.models import vggish

    per_utt_examples = [vggish.waveform_to_examples(np.asarray(w), sr)
                        for w, sr in zip(waveforms, sample_rates)]
    counts = [e.shape[0] for e in per_utt_examples]
    total = sum(counts)
    out = np.zeros((len(counts), vggish.EMBEDDING_SIZE), np.float32)
    if not total:
        return out
    flat = np.concatenate([e for e in per_utt_examples if e.shape[0]])
    chunk = 256
    pieces = []
    for lo in range(0, total, chunk):
        part = flat[lo:lo + chunk]
        if part.shape[0] < chunk:
            part = np.concatenate(
                [part, np.zeros((chunk - part.shape[0],) + part.shape[1:],
                                np.float32)])
        pieces.append(vggish.apply(params, jnp.asarray(part)))
    emb = hostio.gather_chunks(pieces, total, vggish.EMBEDDING_SIZE)
    if postprocessor is not None:
        emb = postprocessor(emb).astype(np.float32)
    pos = 0
    for utt, c in enumerate(counts):
        if c:
            out[utt] = emb[pos:pos + c].mean(0)
            pos += c
    return out


def extract_eatd_vggish(root: Path, params=None, postprocessor=None,
                        out_dir: Optional[Path] = None,
                        max_id: int = eatd.MAX_SPEAKER_ID,
                        sds_threshold: float = 53.0, seed: int = 0):
    """EATD corpus pass through the reference's *alternative* embedder:
    VGGish (``to_vggish_embedds``, ``audio_features_whole.py:39-55`` —
    defined with checkpoint paths at ``:31-32`` but never called in the
    committed pipeline; exposed here as a first-class choice).

    Per utterance the 0.96 s example embeddings are mean-pooled to one
    128-d vector, giving the same ``[N, 3, 1, D]`` layout as wav2vlad so
    the fold/augmentation machinery applies unchanged; ``out_dir`` writes
    the reference-layout npz files with the ``_128`` dim suffix.  All
    utterances' examples are concatenated into a handful of padded
    power-of-two batches through ONE jitted conv stack (MXU-friendly),
    instead of a session per utterance.  ``params=None`` uses the
    deterministic PRNG init (documented stand-in — pass
    ``models.vggish.from_tf_checkpoint(...)`` for released weights).
    Utterances shorter than one example (after the 5 s silence fallback
    this cannot happen for empty files) embed as zero vectors.

    Returns (features [N, 3, 1, 128], sds_targets, clf_targets, manifest).
    """
    from icassp2022_depression_tpu.models import vggish

    if params is None:
        vggish.warn_standin_weights()
        params = vggish.init(jax.random.PRNGKey(seed))

    waveforms, rates, sds, manifest = _corpus_utterances(root, max_id)

    n = len(sds)
    dim = vggish.EMBEDDING_SIZE
    per_utt = vggish_embed_waveforms(params, waveforms, rates,
                                     postprocessor)
    features = per_utt.reshape(n, 3, 1, dim)
    sds_targets, clf_targets = eatd_targets(sds, sds_threshold)

    if out_dir is not None:
        import json

        out_dir = Path(out_dir)
        out_dir.mkdir(parents=True, exist_ok=True)
        np.savez(out_dir / f"whole_samples_reg_{dim}.npz", features)
        np.savez(out_dir / f"whole_labels_reg_{dim}.npz", sds_targets)
        np.savez(out_dir / f"whole_samples_clf_{dim}.npz", features)
        np.savez(out_dir / f"whole_labels_clf_{dim}.npz", clf_targets)
        # same resumability surface as extract_eatd's manifest (and it
        # replaces any stale netvlad-run manifest in a shared out_dir)
        (out_dir / "manifest.json").write_text(json.dumps(
            {"speakers": manifest, "embedder": "vggish"}, indent=2))
    return features, sds_targets, clf_targets, manifest


def load_features(features_dir: Path, track: str = "clf", dim: int = 256):
    """Load the reference-layout npz pair and squeeze the singleton axis
    the trainers expect (``audio_gru_whole.py:19``)."""
    features_dir = Path(features_dir)
    feats = np.load(features_dir / f"whole_samples_{track}_{dim}.npz")["arr_0"]
    labels = np.load(features_dir / f"whole_labels_{track}_{dim}.npz")["arr_0"]
    return np.squeeze(feats, axis=2), labels
