"""Native (C++) wav IO runtime vs the stdlib wave path."""

import numpy as np
import pytest

from icassp2022_depression_tpu.data import eatd
from icassp2022_depression_tpu.utils import native


@pytest.fixture(scope="module")
def have_native():
    if not native.available():
        pytest.skip("g++ toolchain unavailable — native path skipped")
    return True


def test_native_read_matches_stdlib(tmp_path, have_native):
    rng = np.random.default_rng(0)
    data = (rng.standard_normal(12345) * 5000)
    path = tmp_path / "a.wav"
    eatd.write_wav(path, data, 16000)
    ref, sr_ref = eatd.read_wav(path)
    got, sr = native.read_wav(path)
    assert sr == sr_ref == 16000
    np.testing.assert_array_equal(got.astype(np.float64), ref)


def test_native_batch_read(tmp_path, have_native):
    rng = np.random.default_rng(1)
    paths = []
    refs = []
    for i in range(10):
        p = tmp_path / f"{i}.wav"
        d = rng.standard_normal(1000 + 317 * i) * 3000
        eatd.write_wav(p, d, 8000 + 1000 * (i % 3))
        paths.append(p)
        refs.append(eatd.read_wav(p))
    out = native.read_wav_batch(paths, n_threads=4)
    for (got, sr), (ref, sr_ref) in zip(out, refs):
        assert sr == sr_ref
        np.testing.assert_array_equal(got.astype(np.float64), ref)


def test_native_missing_file_errors(have_native):
    with pytest.raises(IOError):
        native.read_wav("/nonexistent/file.wav")


def test_load_speakers_native_matches_stdlib(tmp_path, have_native):
    eatd.make_synthetic_corpus(tmp_path, n_data=3, n_validation=1,
                               seconds=0.2, seed=0)
    # include an empty wav to exercise the silence fallback on both paths
    eatd.write_wav(tmp_path / "Data" / "2" / "neutral_out.wav",
                   np.zeros(0), 16000)
    a = eatd.load_speakers(tmp_path, use_native=True)
    b = eatd.load_speakers(tmp_path, use_native=False)
    assert len(a) == len(b) == 4
    for sa, sb in zip(a, b):
        assert sa.number == sb.number and sa.sds == sb.sds
        for wa, wb in zip(sa.waveforms, sb.waveforms):
            np.testing.assert_array_equal(wa, wb)
