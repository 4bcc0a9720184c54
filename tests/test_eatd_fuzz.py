"""EATD corpus-pathology fuzz: degenerate corpora must flow through every
extraction entry point (host, device-resident, incremental) without
crashing, and broken files must fail with errors that NAME the offending
path.  Counterpart of ``test_daic_fuzz.py`` for the EATD side; pins the
fault-handling contract around the reference's only fault handling —
silently skipping missing speaker dirs
(``Classification/audio_features_whole.py:76-77``) and the empty-wav
silence fallback (``:105-110``).
"""

import wave

import numpy as np
import pytest

from icassp2022_depression_tpu.config import FrontendConfig
from icassp2022_depression_tpu.data import eatd
from icassp2022_depression_tpu.frontend import audio as audio_fe

SR = 2000
CFG = FrontendConfig(sample_rate=SR)


def _speaker_dir(root, split, num, sds=40.0, wav_samples=(600, 700, 800)):
    """Minimal well-formed speaker; per-topic sample counts configurable."""
    d = root / split / str(num)
    for topic, n in zip(eatd.TOPICS, wav_samples):
        eatd.write_wav(d / f"{topic}_out.wav",
                       np.full(n, 1000.0) if n else np.zeros(0), SR)
    (d / "new_label.txt").write_text(f"{sds}\n")
    return d


# -- degenerate corpora flow through every entry point -----------------------


def test_zero_speaker_corpus_all_entry_points(tmp_path):
    (tmp_path / "Data").mkdir()
    feats, sds_t, clf_t, manifest = audio_fe.extract_eatd(
        tmp_path, CFG, out_dir=tmp_path / "out")
    assert feats.shape == (0, 3, 1, CFG.netvlad_output_dim)
    assert sds_t.shape == (0,) and clf_t.shape == (0,) and manifest == []
    # reference-layout artifacts still written, manifest stats are None
    # (never bare Infinity) when no duration was measured
    import json
    assert (tmp_path / "out" / "whole_samples_clf_256.npz").exists()
    meta = json.loads((tmp_path / "out" / "manifest.json").read_text())
    assert meta["min_len_s"] is None and meta["max_len_s"] is None

    dfeats, dsds, dclf = audio_fe.extract_eatd_device(tmp_path, CFG)
    assert dfeats.shape == (0, 3, CFG.netvlad_output_dim)
    assert dsds.shape == (0,) and dclf.shape == (0,)


def test_all_empty_audio_uses_silence_fallback(tmp_path):
    """Every wav zero-length -> the reference's 5 s 1e-4 fallback, finite
    features (a zero-length signal would otherwise pool one junk log-floor
    frame into a confident nonsense feature)."""
    _speaker_dir(tmp_path, "Data", 1, wav_samples=(0, 0, 0))
    sp = eatd.load_speakers(tmp_path, read_text=False)[0]
    assert all(len(w) == SR * CFG.silence_seconds for w in sp.waveforms)
    assert all(np.all(w == CFG.silence_amplitude) for w in sp.waveforms)
    feats, _, _, manifest = audio_fe.extract_eatd(tmp_path, CFG)
    assert feats.shape == (1, 3, 1, CFG.netvlad_output_dim)
    assert np.all(np.isfinite(feats))
    assert manifest[0]["status"] == "ok"


def test_one_sample_utterances_no_crash(tmp_path):
    """n == 1 exercises the edge-pad (not reflect-pad) tail path in
    ``extract_batch`` — np.pad(mode='reflect') needs n > 1."""
    _speaker_dir(tmp_path, "Data", 1, wav_samples=(1, 1, 2))
    feats, _, _, _ = audio_fe.extract_eatd(tmp_path, CFG)
    assert feats.shape == (1, 3, 1, CFG.netvlad_output_dim)
    assert np.all(np.isfinite(feats))


# -- broken files fail loudly, naming the path -------------------------------


@pytest.mark.parametrize("use_native", [False, True])
def test_corrupt_wav_raises_wave_error(tmp_path, use_native):
    """Garbage bytes where a RIFF file should be: the native decoder
    rejects it (IOError) and the whole-corpus stdlib fallback then raises
    wave.Error — never a silent skip or junk features."""
    d = _speaker_dir(tmp_path, "Data", 1)
    (d / "positive_out.wav").write_bytes(b"this is not a RIFF file at all")
    with pytest.raises(wave.Error):
        eatd.load_speakers(tmp_path, read_text=False, use_native=use_native)


@pytest.mark.parametrize("use_native", [False, True])
def test_missing_sibling_wav_raises(tmp_path, use_native):
    """``positive_out.wav`` gates dir presence (reference semantics); a dir
    that passes the gate but lacks a sibling topic wav is CORRUPT, not
    absent — it must raise, not skip."""
    d = _speaker_dir(tmp_path, "Data", 1)
    (d / "neutral_out.wav").unlink()
    with pytest.raises((FileNotFoundError, IOError)):
        eatd.load_speakers(tmp_path, read_text=False, use_native=use_native)


@pytest.mark.parametrize("content", ["", "not-a-number\n"])
def test_malformed_label_file_names_the_path(tmp_path, content):
    d = _speaker_dir(tmp_path, "Data", 1)
    (d / "new_label.txt").write_text(content)
    with pytest.raises(ValueError, match="new_label.txt"):
        eatd.load_speakers(tmp_path, read_text=False)


def test_missing_dirs_are_skipped_not_raised(tmp_path):
    """The reference's one fault-handling behavior: absent speaker ids are
    silently skipped (``audio_features_whole.py:76-77``)."""
    _speaker_dir(tmp_path, "Data", 3)
    _speaker_dir(tmp_path, "Data", 7)
    sp = eatd.load_speakers(tmp_path, read_text=False)
    assert [s.number for s in sp] == [3, 7]


# -- seeded random sweep ------------------------------------------------------


def test_random_corpus_sweep(tmp_path):
    """Random small corpora (durations 0..0.6 s incl. empties, random SDS
    around the threshold): extraction never crashes, shapes/labels hold,
    and the incremental rerun reuses every speaker."""
    rng = np.random.default_rng(7)
    for trial in range(3):
        root = tmp_path / f"t{trial}"
        sds_all = []
        n_data = int(rng.integers(1, 4))
        n_val = int(rng.integers(0, 3))
        for split, count in (("Data", n_data), ("ValidationData", n_val)):
            for num in range(1, count + 1):
                sds = float(rng.integers(45, 61))
                samples = tuple(int(rng.integers(0, SR * 0.6 + 1))
                                for _ in range(3))
                _speaker_dir(root, split, num, sds=sds, wav_samples=samples)
                sds_all.append(sds)
        out = root / "out"
        feats, sds_t, clf_t, manifest = audio_fe.extract_eatd(
            root, CFG, out_dir=out, incremental=True)
        n = n_data + n_val
        assert feats.shape == (n, 3, 1, CFG.netvlad_output_dim)
        assert np.all(np.isfinite(feats))
        assert np.array_equal(sds_t, np.asarray(sds_all, np.float32))
        assert np.array_equal(clf_t, (sds_t >= 53.0).astype(np.int64))
        # second pass resumes entirely from the per-speaker cache and
        # reproduces the features bit-exactly
        feats2, _, _, manifest2 = audio_fe.extract_eatd(
            root, CFG, out_dir=out, incremental=True)
        assert np.array_equal(feats, feats2)
        assert all(m["status"] == "cached" for m in manifest2)
