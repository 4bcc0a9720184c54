"""DAIC segmenter fuzz: pathological transcripts must neither crash nor
deviate from the reference's accumulation rules
(``DAICFeatureExtarction/feature_extraction.py:45-60``): a matching Ellie
question closes the current (nonempty) signal, ``scrubbed_entry`` rows are
skipped, audio after the last matched question is dropped, and an empty
accumulated signal produces NO segment.
"""

import numpy as np
import pytest

from icassp2022_depression_tpu.config import FrontendConfig
from icassp2022_depression_tpu.data import eatd
from icassp2022_depression_tpu.frontend import daic as daic_fe

SR = 1000   # segmentation is sample-rate agnostic; small keeps arrays tiny
QUERIES = ["how are you doing today", "do you travel a lot"]
CFG = FrontendConfig()


def _row(start, stop, speaker, value):
    return {"start_time": float(start), "stop_time": float(stop),
            "speaker": speaker, "value": value}


def _wav(n=SR * 10, seed=0):
    return np.arange(n, dtype=np.float64) + seed   # position-identifying


# -- deterministic pathological cases ---------------------------------------


def test_all_scrubbed_entries_yield_no_segments():
    t = [
        _row(0, 1, "Ellie", QUERIES[0]),
        _row(1, 2, "Participant", "scrubbed_entry"),
        _row(2, 3, "Participant", "scrubbed_entry"),
        _row(3, 4, "Ellie", QUERIES[1]),
    ]
    signals, texts = daic_fe.segment_responses(t, _wav(), SR, QUERIES,
                                               with_text=True)
    assert signals == [] and texts == []


def test_zero_matched_questions_yield_no_segments():
    t = [
        _row(0, 1, "Ellie", "an improvised unmatched line"),
        _row(1, 2, "Participant", "i talk a lot"),
        _row(2, 3, "Participant", "really a lot"),
    ]
    assert daic_fe.segment_responses(t, _wav(), SR, QUERIES) == []


def test_final_row_question_closes_and_trailing_audio_drops():
    wav = _wav()
    t = [
        _row(0, 1, "Ellie", QUERIES[0]),
        _row(1, 2, "Participant", "answer one"),
        _row(2, 3, "Ellie", QUERIES[1]),      # closes segment 1
        _row(3, 4, "Participant", "answer two"),
        _row(4, 5, "Ellie", QUERIES[0]),      # FINAL row: closes segment 2
    ]
    signals = daic_fe.segment_responses(t, wav, SR, QUERIES)
    assert len(signals) == 2
    np.testing.assert_array_equal(signals[0], wav[SR:2 * SR])
    np.testing.assert_array_equal(signals[1], wav[3 * SR:4 * SR])
    # audio accumulated after the last matched question is DROPPED
    # (the reference never flushes the open segment at end-of-transcript)
    t_trailing = t + [_row(5, 6, "Participant", "never closed")]
    signals2 = daic_fe.segment_responses(t_trailing, wav, SR, QUERIES)
    assert len(signals2) == 2


def test_empty_audio_produces_no_segment_and_resets_text():
    wav = _wav()
    t = [
        _row(0, 1, "Ellie", QUERIES[0]),
        _row(2, 2, "Participant", "zero-width row"),   # start == stop
        _row(3, 4, "Ellie", QUERIES[1]),               # closes NOTHING
        _row(4, 5, "Participant", "real answer"),
        _row(5, 6, "Ellie", QUERIES[0]),
    ]
    signals, texts = daic_fe.segment_responses(t, wav, SR, QUERIES,
                                               with_text=True)
    assert len(signals) == 1
    np.testing.assert_array_equal(signals[0], wav[4 * SR:5 * SR])
    # the zero-width row's transcript text must NOT leak into the next
    # segment (the reference resets `response` when it skips an empty close)
    assert texts == ["real answer"]


def test_reversed_and_out_of_range_times_do_not_crash():
    wav = _wav(n=SR * 3)
    t = [
        _row(0, 0.5, "Ellie", QUERIES[0]),
        _row(2.0, 1.0, "Participant", "reversed times"),      # stop < start
        _row(1.0, 99.0, "Participant", "stop beyond the wav"),  # clamped
        _row(2.5, 2.75, "Ellie", QUERIES[1]),
    ]
    signals = daic_fe.segment_responses(t, wav, SR, QUERIES)
    # reversed slice contributes nothing; the long slice clamps to len(wav)
    assert len(signals) == 1
    np.testing.assert_array_equal(signals[0], wav[SR:])


def test_overlapping_rows_accumulate_both():
    wav = _wav()
    t = [
        _row(0, 0.5, "Ellie", QUERIES[0]),
        _row(1.0, 3.0, "Participant", "first"),
        _row(2.0, 4.0, "Participant", "second overlaps first"),
        _row(5, 6, "Ellie", QUERIES[1]),
    ]
    signals = daic_fe.segment_responses(t, wav, SR, QUERIES)
    assert len(signals) == 1
    np.testing.assert_array_equal(
        signals[0], np.concatenate([wav[SR:3 * SR], wav[2 * SR:4 * SR]]))


def test_wrapup_phrase_substring_closes():
    wav = _wav()
    t = [
        _row(0, 0.5, "Ellie", QUERIES[0]),
        _row(1, 2, "Participant", "an answer"),
        _row(3, 4, "Ellie", "okay i think i have asked everything i wanted"),
    ]
    assert len(daic_fe.segment_responses(t, wav, SR, QUERIES)) == 1


def test_unknown_speakers_are_ignored():
    wav = _wav()
    t = [
        _row(0, 0.5, "Ellie", QUERIES[0]),
        _row(0.5, 0.9, "Interviewer", "not a DAIC speaker"),
        _row(1, 2, "Participant", "an answer"),
        _row(2, 3, "", "speakerless row"),
        _row(3, 4, "Ellie", QUERIES[1]),
    ]
    signals = daic_fe.segment_responses(t, wav, SR, QUERIES)
    assert len(signals) == 1
    np.testing.assert_array_equal(signals[0], wav[SR:2 * SR])


def test_transcript_csv_with_blank_fields_parses(tmp_path):
    p = tmp_path / "T.csv"
    p.write_text("start_time\tstop_time\tspeaker\tvalue\n"
                 "\t\tEllie \thow are you doing today\n"   # blanks + space
                 "0.1\t0.2\tParticipant\t\n")
    rows = daic_fe.read_transcript(p)
    assert rows[0]["start_time"] == 0.0 and rows[0]["stop_time"] == 0.0
    assert rows[0]["speaker"] == "Ellie"      # whitespace-stripped
    assert rows[1]["value"] == ""


# -- seeded random sweep vs an independent replay oracle ---------------------


def _oracle(transcript, wav, sr, queries):
    """Transparent re-derivation of feature_extraction.py:45-60's rules,
    written independently of frontend/daic.py: walk rows, keep a list of
    pending participant slices, close on matching Ellie rows."""
    out, pending = [], []
    qset = {q.strip("\n") for q in queries}
    for r in transcript:
        if r["speaker"] == "Ellie" and (
                r["value"].strip("\n") in qset
                or "i think i have asked everything" in r["value"]):
            if pending:
                out.append(np.concatenate(pending))
                pending = []
        elif r["speaker"] == "Participant":
            if "scrubbed_entry" in r["value"]:
                continue
            seg = wav[int(r["start_time"] * sr):int(r["stop_time"] * sr)]
            if len(seg):
                pending.append(seg.astype(np.float64))
    return out


@pytest.mark.parametrize("seed", range(12))
def test_random_transcript_sweep_matches_oracle(seed):
    rng = np.random.default_rng(seed)
    wav = _wav(n=SR * 8, seed=seed)
    rows = []
    for _ in range(rng.integers(0, 40)):
        kind = rng.integers(0, 6)
        a, b = sorted(rng.uniform(-1.0, 10.0, size=2))
        if rng.random() < 0.2:
            a, b = b, a           # reversed times
        if kind == 0:
            rows.append(_row(a, b, "Ellie", str(rng.choice(QUERIES))))
        elif kind == 1:
            rows.append(_row(a, b, "Ellie", "unmatched filler"))
        elif kind == 2:
            rows.append(_row(a, b, "Participant", "scrubbed_entry"))
        elif kind == 3:
            rows.append(_row(a, b, "Participant",
                             f"utterance {rng.integers(1000)}"))
        elif kind == 4:
            rows.append(_row(a, b, "Someone", "ignored speaker"))
        else:
            rows.append(_row(a, a, "Participant", "zero width"))
    got, texts = daic_fe.segment_responses(rows, wav, SR, QUERIES,
                                           with_text=True)
    want = _oracle(rows, wav, SR, QUERIES)
    assert len(got) == len(want) == len(texts)
    for g, w in zip(got, want):
        assert g.dtype == np.float64
        np.testing.assert_array_equal(g, w)


# -- pathological inputs through the file-level pipeline ---------------------


def test_zero_matched_split_extracts_reference_shaped_empties(tmp_path):
    pid = 310
    d = tmp_path / f"{pid}_P"
    d.mkdir(parents=True)
    eatd.write_wav(d / f"{pid}_AUDIO.wav",
                   np.random.default_rng(0).standard_normal(16000) * 3000,
                   16000)
    (d / f"{pid}_TRANSCRIPT.csv").write_text(
        "start_time\tstop_time\tspeaker\tvalue\n"
        "0.0\t0.3\tEllie\tno question matches this\n"
        "0.4\t0.8\tParticipant\ttalking anyway\n")
    queries = tmp_path / "queries.txt"
    queries.write_text("how are you doing today\n")
    split = tmp_path / "split.csv"
    split.write_text("Participant_ID,PHQ8_Binary,PHQ8_Score\n"
                     f"{pid},0,3\n")
    features, clabels, rlabels = daic_fe.extract_split(
        tmp_path, split, queries, CFG,
        out_prefix=tmp_path / "F", split_name="train")
    assert len(features) == 1
    assert features[0].shape == (0, 1, CFG.netvlad_output_dim)
    assert clabels == [0] and rlabels == [3.0]
    # padded export of an all-empty split stays reference-shaped
    dense, mask = daic_fe.pad_responses(features, max_responses=2)
    assert dense.shape == (1, 2, CFG.netvlad_output_dim)
    assert mask.sum() == 0
    # round-trips through the saved ragged layout
    audio, labels = daic_fe.load_features(tmp_path / "F", "train", "clf")
    assert audio[0].shape == (0, 1, CFG.netvlad_output_dim)


def test_pad_responses_empty_split():
    dense, mask = daic_fe.pad_responses([], max_responses=3)
    assert dense.shape == (0, 3, 0) and mask.shape == (0, 3)
