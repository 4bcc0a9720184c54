import numpy as np
import pytest

from icassp2022_depression_tpu.data import eatd, folds


def test_synthetic_corpus_roundtrip(tmp_path):
    eatd.make_synthetic_corpus(tmp_path, n_data=4, n_validation=2,
                               seconds=0.2, seed=0)
    speakers = list(eatd.iter_speakers(tmp_path, max_id=10))
    assert len(speakers) == 6
    assert [s.split for s in speakers[:4]] == ["Data"] * 4
    sp = speakers[0]
    assert len(sp.waveforms) == 3
    assert sp.sample_rates == [16000] * 3
    assert all(len(w) == 3200 for w in sp.waveforms)
    assert sp.texts is not None and len(sp.texts) == 3
    assert eatd.binary_label(sp.sds) == (1 if sp.sds >= 53 else 0)


def test_missing_speaker_skipped(tmp_path):
    eatd.make_synthetic_corpus(tmp_path, n_data=3, n_validation=0,
                               seconds=0.1)
    # remove speaker 2's positive wav -> whole speaker silently skipped
    (tmp_path / "Data" / "2" / "positive_out.wav").unlink()
    nums = [s.number for s in eatd.iter_speakers(tmp_path, splits=("Data",))]
    assert nums == [1, 3]


def test_empty_wav_silence_fallback(tmp_path):
    eatd.make_synthetic_corpus(tmp_path, n_data=1, n_validation=0,
                               seconds=0.1)
    eatd.write_wav(tmp_path / "Data" / "1" / "neutral_out.wav",
                   np.zeros(0), 16000)
    sp = eatd.load_speaker(tmp_path, "Data", 1)
    assert len(sp.waveforms[1]) == 16000 * 5
    np.testing.assert_allclose(sp.waveforms[1], 1e-4)


def test_clf_folds_partition_and_stratify():
    targets = np.array([1] * 30 + [0] * 90)
    train_folds = folds.generate_clf_folds(targets, 3, seed=0)
    n = len(targets)
    for tr in train_folds:
        te = folds.clf_test_complement(tr, n)
        assert len(set(tr.tolist()) | set(te.tolist())) == n
        assert len(set(tr.tolist()) & set(te.tolist())) == 0
        # roughly stratified: each test fold has ~10 depressed speakers
        assert 8 <= targets[te].sum() <= 12
    # folds are deterministic
    again = folds.generate_clf_folds(targets, 3, seed=0)
    for a, b in zip(train_folds, again):
        np.testing.assert_array_equal(a, b)


def test_reg_fold_split_shapes():
    targets = np.concatenate([np.full(30, 60.0), np.full(132, 40.0)])
    dep, non = folds.generate_reg_shuffles(targets, seed=0)
    assert len(dep) == 30 and len(non) == 132
    tr_d, tr_n, te_d, te_n = folds.reg_fold_split(dep, non, fold=1)
    assert len(te_d) == 10 and len(te_n) == 44
    assert len(tr_d) == 20 and len(tr_n) == 88
    assert not set(te_d.tolist()) & set(tr_d.tolist())
    assert not set(te_n.tolist()) & set(tr_n.tolist())
    # complements are ascending (documented deterministic ordering)
    assert list(tr_d) == sorted(tr_d)
