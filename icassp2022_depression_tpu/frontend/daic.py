"""DAIC-WOZ (English) frontend: transcript segmentation + batched wav2vlad.

Reference (``DAICFeatureExtarction/feature_extraction.py``): for each
participant, walk ``{id}_TRANSCRIPT.csv``; a new response segment starts
when speaker ``Ellie`` asks a line that exactly matches one of the
canonical questions in ``queries.txt`` (or contains "i think i have asked
everything"); ``Participant`` rows append ``wave_data[start:stop]`` to the
current signal (skipping ``scrubbed_entry``); each closed segment is
embedded with ``wav2vlad``.  Labels are PHQ8_Binary / PHQ8_Score from the
AVEC2017 split CSVs (``:11-18``).

TPU-native differences: segmentation stays on host (string/CSV work), but
all of a participant's ragged responses are embedded as ONE padded,
masked, bucketed batch (see :mod:`.audio`) instead of a TF session per
response.  Participants yield a variable number of responses; the saved
arrays are object arrays of per-participant ``[n_i, 1, 256]`` blocks, the
reference's ragged layout — with an optional padded dense export
(``pad_responses``) for jit-friendly downstream batching.

``queries.txt`` is DAIC corpus metadata (Ellie's canonical utterance
inventory, 324 lines) — a constant data table, bundled at
``data/daic_queries.txt`` so ``extract-daic`` runs out of the box
(reference ships it as ``DAICFeatureExtarction/queries.txt``).
:func:`load_queries` defaults to the bundled copy; pass a path to
override.  The matcher reproduces the exact-string comparison
(``feature_extraction.py:23-29``).
"""

from __future__ import annotations

import csv
from pathlib import Path
from typing import List, NamedTuple, Optional, Sequence, Tuple

import numpy as np

from icassp2022_depression_tpu.config import FrontendConfig
from icassp2022_depression_tpu.data.eatd import read_wav
from icassp2022_depression_tpu.frontend import audio as audio_frontend


#: Bundled DAIC question bank (Ellie's utterance inventory; corpus
#: metadata shipped by the reference as ``DAICFeatureExtarction/queries.txt``).
BUNDLED_QUERIES = Path(__file__).resolve().parent.parent / "data" / \
    "daic_queries.txt"


def load_queries(path: Optional[Path] = None) -> List[str]:
    """Question bank lines; defaults to the bundled 324-question table."""
    return [line.rstrip("\n") for line in
            Path(path or BUNDLED_QUERIES).read_text().splitlines()]


def is_topic_question(sentence: str, queries: Sequence[str]) -> bool:
    """Exact-match against the question bank (reference ``identify_topics``)."""
    sentence = sentence.strip("\n")
    return any(q.strip("\n") == sentence for q in queries)


def read_transcript(path: Path) -> List[dict]:
    """TRANSCRIPT.csv rows (tab-separated: start_time, stop_time, speaker,
    value), NaNs as empty strings.

    Documented parity deviation: the speaker field is whitespace-STRIPPED
    before the downstream 'Ellie'/'Participant' comparisons.  The
    reference compares the raw pandas value (``feature_extraction.py``),
    so a malformed row like ``'Ellie '`` (trailing whitespace occurs in
    some raw DAIC-WOZ sessions) matches neither speaker there and shifts
    that participant's response boundaries; stripping is the robust
    reading and affects only rows the reference mishandles."""
    rows = []
    with open(path, newline="") as f:
        for row in csv.DictReader(f, delimiter="\t"):
            rows.append({
                "start_time": float(row["start_time"] or 0.0),
                "stop_time": float(row["stop_time"] or 0.0),
                "speaker": (row["speaker"] or "").strip(),
                "value": row["value"] or "",
            })
    return rows


def segment_responses(transcript: List[dict], wave_data: np.ndarray, sr: int,
                      queries: Sequence[str], with_text: bool = False):
    """Split a session into per-question participant response signals,
    reproducing the reference's accumulation rules
    (``feature_extraction.py:45-60``): a matching Ellie question closes the
    current signal (if nonempty); ``scrubbed_entry`` rows are skipped.

    ``with_text`` additionally returns the concatenated participant
    transcript per response — the reference accumulates this ``response``
    string (``:39,49,59``) but never uses it; completing the text modality
    enables DAIC multimodal training (see ``train/daic.py``).
    """
    signals: List[np.ndarray] = []
    texts: List[str] = []
    signal = np.empty(0, np.float64)
    response = ""
    for t in transcript:
        if t["speaker"] == "Ellie" and (
                is_topic_question(t["value"], queries) or
                "i think i have asked everything" in t["value"]):
            if len(signal) == 0:
                response = ""
                continue
            signals.append(signal)
            texts.append(response.strip())
            signal = np.empty(0, np.float64)
            response = ""
        elif t["speaker"] == "Participant":
            if "scrubbed_entry" in t["value"]:
                continue
            start = int(t["start_time"] * sr)
            stop = int(t["stop_time"] * sr)
            signal = np.hstack((signal, wave_data[start:stop].astype(np.float64)))
            response += " " + t["value"]
    if with_text:
        return signals, texts
    return signals


def participant_signals(daic_dir: Path, number: int,
                        queries: Sequence[str], with_text: bool = False):
    """One participant's segmented response signals (host IO + string work
    only; no device dispatch).  Returns (signals, sample_rate), or
    (signals, texts, sample_rate) with ``with_text``."""
    base = Path(daic_dir) / f"{number}_P"
    transcript = read_transcript(base / f"{number}_TRANSCRIPT.csv")
    wave_data, sr = read_wav(base / f"{number}_AUDIO.wav")
    if with_text:
        signals, texts = segment_responses(transcript, wave_data, sr,
                                           queries, with_text=True)
        return signals, texts, sr
    return segment_responses(transcript, wave_data, sr, queries), sr


def extract_participant(daic_dir: Path, number: int, queries: Sequence[str],
                        cfg: FrontendConfig = FrontendConfig(),
                        start_ordinal: int = 0) -> np.ndarray:
    """One participant -> [n_responses, 1, output_dim] feature block."""
    signals, sr = participant_signals(daic_dir, number, queries)
    if not signals:
        return np.zeros((0, 1, cfg.netvlad_output_dim), np.float32)
    feats = audio_frontend.extract_batch(signals, [sr] * len(signals), cfg,
                                         start_ordinal=start_ordinal)
    return feats[:, None, :]


class FlatResponses(NamedTuple):
    """A whole split's response features as one flat row matrix + the
    per-participant row counts — the device-resident wire format of the
    fused DAIC extract->train pipeline (``flat`` is a DEVICE array out of
    :func:`extract_split_device`; participant ``i`` owns rows
    ``[sum(counts[:i]), sum(counts[:i+1]))``, the same cumulative-ordinal
    order the reference's split pass produces)."""

    flat: np.ndarray      # [total_responses, output_dim]
    counts: List[int]     # [n_participants]


def _split_flat_features(daic_dir: Path, ids: Sequence[int],
                         queries: Sequence[str], cfg: FrontendConfig,
                         device: bool = False):
    """All participants' responses through ONE ``extract_batch`` call.

    The per-participant loop does only host IO/segmentation; the single
    fused call preserves the split's cumulative utterance ordinals
    (``feature_extraction.py`` numbers utterances across the whole split)
    and pays ONE relay readback for the whole split instead of one per
    participant (~0.45 s each behind the relay, regardless of payload).
    Bit-identical per-participant results (bucketing is by each
    utterance's own pow2-padded length, never by its batch peers).
    """
    signals: List[np.ndarray] = []
    srs: List[int] = []
    counts: List[int] = []
    for pid in ids:
        s, sr = participant_signals(daic_dir, pid, queries)
        signals.extend(s)
        srs.extend([sr] * len(s))
        counts.append(len(s))
    if signals:
        flat = audio_frontend.extract_batch(signals, srs, cfg,
                                            device=device)
    elif device:
        # keep the documented contract: device=True always yields a
        # DEVICE array, even for a split with zero matched responses
        import jax.numpy as jnp

        flat = jnp.zeros((0, cfg.netvlad_output_dim), jnp.float32)
    else:
        flat = np.zeros((0, cfg.netvlad_output_dim), np.float32)
    return flat, counts


def read_split_csv(path: Path) -> Tuple[List[int], List[int], List[float]]:
    """AVEC2017 split CSV -> (participant ids, PHQ8_Binary, PHQ8_Score)."""
    ids, clabels, rlabels = [], [], []
    with open(path, newline="") as f:
        for row in csv.DictReader(f):
            ids.append(int(row["Participant_ID"]))
            clabels.append(int(row["PHQ8_Binary"]))
            rlabels.append(float(row["PHQ8_Score"]))
    return ids, clabels, rlabels


def extract_split(daic_dir: Path, split_csv: Path,
                  queries_path: Optional[Path] = None,
                  cfg: FrontendConfig = FrontendConfig(),
                  out_prefix: Optional[Path] = None, split_name: str = "train"):
    """Full split pass: ragged per-participant features + both label sets,
    saved in the reference's four-file layout
    (``feature_extraction.py:83-100``)."""
    queries = load_queries(queries_path)
    ids, clabels, rlabels = read_split_csv(split_csv)
    flat, counts = _split_flat_features(daic_dir, ids, queries, cfg)
    features, pos = [], 0
    for c in counts:
        features.append(flat[pos:pos + c][:, None, :])
        pos += c
    if out_prefix is not None:
        out_prefix = Path(out_prefix)
        out_prefix.mkdir(parents=True, exist_ok=True)
        _save_ragged(out_prefix / f"{split_name}_samples_clf.npz", features)
        _save_ragged(out_prefix / f"{split_name}_samples_reg.npz", features)
        np.savez(out_prefix / f"{split_name}_labels_clf.npz", np.asarray(clabels))
        np.savez(out_prefix / f"{split_name}_labels_reg.npz", np.asarray(rlabels))
    return features, clabels, rlabels


def extract_split_device(daic_dir: Path, split_csv: Path,
                         queries_path: Optional[Path] = None,
                         cfg: FrontendConfig = FrontendConfig()):
    """Fused-pipeline DAIC split pass: features stay DEVICE-resident.

    The DAIC twin of :func:`..audio.extract_eatd_device` (``cli
    train-daic --daic-dir``): host segmentation, ONE flat-packed PCM
    upload for the whole split, and the features come back as a
    :class:`FlatResponses` whose ``flat`` matrix is a DEVICE array —
    ``train.daic.train_daic`` consumes it directly, building the padded
    ragged batch by an on-device gather, so features never cross the
    relay back to the host.  Same math/ordinals as :func:`extract_split`;
    no npz artifacts (use ``extract_split`` for the persisted
    reference-layout files — ``feature_extraction.py:83-100``).

    Returns (:class:`FlatResponses`, PHQ8_Binary labels, PHQ8_Score
    labels).
    """
    queries = load_queries(queries_path)
    ids, clabels, rlabels = read_split_csv(split_csv)
    flat, counts = _split_flat_features(daic_dir, ids, queries, cfg,
                                        device=True)
    return FlatResponses(flat, counts), clabels, rlabels


def _save_ragged(path: Path, features) -> None:
    ragged = np.empty(len(features), dtype=object)
    for i, f in enumerate(features):
        ragged[i] = f
    np.savez(path, np.asarray(ragged, dtype=object))


def extract_split_multimodal(daic_dir: Path, split_csv: Path,
                             queries_path: Optional[Path] = None,
                             cfg: FrontendConfig = FrontendConfig(),
                             elmo_params=None, elmo_cfg=None, seed: int = 0,
                             elmo_weights: str | None = "auto",
                             out_prefix: Optional[Path] = None,
                             split_name: str = "train",
                             segmenter: str = "auto", elmo_tp: int = 0):
    """Full split pass over BOTH modalities — the DAIC text branch the
    reference drops (it extracts audio only,
    ``DAICFeatureExtarction/feature_extraction.py:83-100``).  One session
    decode per participant feeds both modalities; the audio features are
    saved in the reference's four-file layout plus
    ``{split}_text_samples.npz`` (ragged [n_i, Dt] blocks).  The text
    embedder resolves like ``extract-text`` (pretrained bundle when
    available, see :func:`..frontend.text.make_embedder`)."""
    from icassp2022_depression_tpu.frontend import text as text_fe

    embed, _tdim, embedder_id = text_fe.make_embedder(
        elmo_params, elmo_cfg, seed, elmo_weights, with_id=True,
        elmo_tp=elmo_tp)
    queries = load_queries(queries_path)
    ids, clabels, rlabels = read_split_csv(split_csv)
    # both modalities fused across the whole split: ONE extract_batch for
    # every response's audio and ONE embed call for every response's text
    # (one blocking readback each, instead of two per participant — the
    # same restructuring as the audio-only extract_split; per-response
    # results are batch-composition independent, so bit-identical)
    signals: List[np.ndarray] = []
    srs: List[int] = []
    texts: List[str] = []
    counts: List[int] = []
    for pid in ids:
        s, t, sr = participant_signals(daic_dir, pid, queries,
                                       with_text=True)
        signals.extend(s)
        srs.extend([sr] * len(s))
        texts.extend(t)
        counts.append(len(s))
    if signals:
        flat_audio = audio_frontend.extract_batch(signals, srs, cfg)
        flat_text = embed(
            [text_fe.tokenize(t, segmenter=segmenter) for t in texts])
    else:
        if _tdim is None:
            _tdim = embed([["x"]]).shape[1]
        flat_audio = np.zeros((0, cfg.netvlad_output_dim), np.float32)
        flat_text = np.zeros((0, _tdim), np.float32)
    audio_features, text_features, pos = [], [], 0
    for c in counts:
        audio_features.append(flat_audio[pos:pos + c][:, None, :])
        text_features.append(np.asarray(flat_text[pos:pos + c]))
        pos += c
    if out_prefix is not None:
        out_prefix = Path(out_prefix)
        out_prefix.mkdir(parents=True, exist_ok=True)
        _save_ragged(out_prefix / f"{split_name}_samples_clf.npz",
                     audio_features)
        _save_ragged(out_prefix / f"{split_name}_samples_reg.npz",
                     audio_features)
        _save_ragged(out_prefix / f"{split_name}_text_samples.npz",
                     text_features)
        np.savez(out_prefix / f"{split_name}_labels_clf.npz",
                 np.asarray(clabels))
        np.savez(out_prefix / f"{split_name}_labels_reg.npz",
                 np.asarray(rlabels))
        # text-modality provenance sidecar (same scheme as extract-text):
        # train-daic copies it into checkpoint sidecars so serving can
        # adopt the segmenter/seed and detect embedder mismatches
        import json

        (out_prefix / "extraction_meta.json").write_text(json.dumps(
            {"embedder": embedder_id, "segmenter": segmenter,
             "seed": seed, "elmo_tp": elmo_tp,
             "text_dim": int(_tdim)}))
    return audio_features, text_features, clabels, rlabels


def load_features(prefix: Path, split_name: str = "train",
                  track: str = "clf", multimodal: bool = False):
    """Saved split features back as ragged per-participant lists ->
    (audio_features[, text_features], labels)."""
    prefix = Path(prefix)
    with np.load(prefix / f"{split_name}_samples_{track}.npz",
                 allow_pickle=True) as z:
        audio = list(z["arr_0"])
    labels = np.load(prefix / f"{split_name}_labels_{track}.npz")["arr_0"]
    if not multimodal:
        return audio, labels
    with np.load(prefix / f"{split_name}_text_samples.npz",
                 allow_pickle=True) as z:
        text = list(z["arr_0"])
    return audio, text, labels


def extract_participant_multimodal(daic_dir: Path, number: int,
                                   queries: Sequence[str], elmo_params,
                                   elmo_cfg,
                                   cfg: FrontendConfig = FrontendConfig(),
                                   start_ordinal: int = 0, embed_fn=None,
                                   segmenter: str = "auto"):
    """One participant, ONE session decode -> ([n, 1, Da] audio features,
    [n, Dt] text embeddings).  Reads the (large) session wav and transcript
    once for both modalities.  ``embed_fn`` (from
    :func:`..frontend.text.make_embedder`) overrides the explicit
    ``elmo_params``/``elmo_cfg`` pair."""
    from icassp2022_depression_tpu.frontend import audio as audio_frontend_
    from icassp2022_depression_tpu.frontend import text as text_fe

    if embed_fn is None:
        embed_fn, tdim = text_fe.make_embedder(elmo_params, elmo_cfg,
                                               elmo_weights=None)
    else:
        tdim = None
    base = Path(daic_dir) / f"{number}_P"
    transcript = read_transcript(base / f"{number}_TRANSCRIPT.csv")
    wave_data, sr = read_wav(base / f"{number}_AUDIO.wav")
    signals, texts = segment_responses(transcript, wave_data, sr, queries,
                                       with_text=True)
    if not signals:
        if tdim is None:
            tdim = embed_fn([["x"]]).shape[1]
        return (np.zeros((0, 1, cfg.netvlad_output_dim), np.float32),
                np.zeros((0, tdim), np.float32))
    audio_feats = audio_frontend_.extract_batch(
        signals, [sr] * len(signals), cfg, start_ordinal=start_ordinal)
    text_feats = embed_fn([text_fe.tokenize(t, segmenter=segmenter)
                           for t in texts])
    return audio_feats[:, None, :], text_feats


def extract_participant_text(daic_dir: Path, number: int,
                             queries: Sequence[str], elmo_params,
                             elmo_cfg) -> np.ndarray:
    """One participant's per-response transcripts -> [n_responses, D] text
    embeddings (the DAIC text modality the reference drops).  Prefer
    :func:`extract_participant_multimodal` when audio features are also
    needed (single session decode for both)."""
    from icassp2022_depression_tpu.frontend import text as text_fe

    base = Path(daic_dir) / f"{number}_P"
    transcript = read_transcript(base / f"{number}_TRANSCRIPT.csv")
    wave_data, sr = read_wav(base / f"{number}_AUDIO.wav")
    _, texts = segment_responses(transcript, wave_data, sr, queries,
                                 with_text=True)
    if not texts:
        return np.zeros((0, elmo_cfg.output_dim), np.float32)
    sentences = [text_fe.tokenize(t) for t in texts]
    return text_fe.embed_sentences(elmo_params, sentences, elmo_cfg)


def pad_responses(features: List[np.ndarray], max_responses: int | None = None):
    """Ragged [n_i, 1, D] blocks -> dense [N, R, D] + mask [N, R] for
    jit-friendly downstream batching (no recompilation per participant)."""
    if max_responses is None:
        max_responses = max((f.shape[0] for f in features), default=1)
    n = len(features)
    d = features[0].shape[-1] if features else 0
    out = np.zeros((n, max_responses, d), np.float32)
    mask = np.zeros((n, max_responses), np.float32)
    for i, f in enumerate(features):
        r = min(f.shape[0], max_responses)
        out[i, :r] = f[:r, 0, :]
        mask[i, :r] = 1.0
    return out, mask
