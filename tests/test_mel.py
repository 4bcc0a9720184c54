"""Log-mel frontend verified against slow direct-DFT NumPy oracles
(independent O(N^2) implementations, not a re-export of the device code)."""

import numpy as np
import jax.numpy as jnp
import pytest

from icassp2022_depression_tpu.ops import mel


def _dft_power_oracle(y, n_fft, hop):
    """Centered, reflect-padded, periodic-Hann power spectrogram via direct
    DFT sums."""
    pad = n_fft // 2
    yp = np.concatenate([y[1:pad + 1][::-1], y, y[-pad - 1:-1][::-1]])
    frames = 1 + (len(yp) - n_fft) // hop
    win = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(n_fft) / n_fft)
    n = np.arange(n_fft)
    out = np.zeros((frames, n_fft // 2 + 1))
    for f in range(frames):
        seg = yp[f * hop: f * hop + n_fft] * win
        for k in range(n_fft // 2 + 1):
            c = np.sum(seg * np.cos(2 * np.pi * k * n / n_fft))
            s = -np.sum(seg * np.sin(2 * np.pi * k * n / n_fft))
            out[f, k] = c * c + s * s
    return out


def test_power_spectrogram_matches_direct_dft():
    rng = np.random.default_rng(0)
    n_fft, hop = 64, 16
    y = rng.standard_normal(200).astype(np.float32)
    got = np.asarray(mel.power_spectrogram(jnp.asarray(y), n_fft, hop))
    want = _dft_power_oracle(y.astype(np.float64), n_fft, hop)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_mel_filterbank_properties():
    sr, n_fft, n_mels = 16000, 2048, 80
    fb = mel.mel_filterbank(sr, n_fft, n_mels)
    assert fb.shape == (n_mels, 1 + n_fft // 2)
    assert (fb >= 0).all()
    # every filter has some support and filters tile the band
    assert (fb.sum(axis=1) > 0).all()
    # slaney normalisation: peak amplitude shrinks with filter width, so
    # higher filters (wider in Hz) have smaller peaks
    peaks = fb.max(axis=1)
    assert peaks[0] > peaks[-1]


def test_mel_scale_roundtrip():
    hz = np.array([0.0, 500.0, 1000.0, 4000.0, 8000.0])
    np.testing.assert_allclose(mel.mel_to_hz(mel.hz_to_mel(hz)), hz,
                               rtol=1e-9, atol=1e-6)
    # slaney scale is linear below 1 kHz
    np.testing.assert_allclose(mel.hz_to_mel(200.0), 3.0)


def test_log_mel_shape_and_floor():
    sr = 16000
    y = np.zeros(sr, dtype=np.float32)  # 1 s of silence
    out = np.asarray(mel.log_mel(jnp.asarray(y), sr=sr))
    assert out.shape == (1 + sr // 512, 80)
    np.testing.assert_allclose(out, np.log(1e-6), atol=1e-6)


def test_batched_log_mel_matches_single():
    rng = np.random.default_rng(1)
    ys = rng.standard_normal((3, 4096)).astype(np.float32)
    batched = np.asarray(mel.batched_log_mel(
        jnp.asarray(ys), 16000, 2048, 512, 80, 1e-6, True))
    for i in range(3):
        single = np.asarray(mel.log_mel(jnp.asarray(ys[i]), sr=16000))
        np.testing.assert_allclose(batched[i], single, atol=1e-5)


# ---------------------------------------------------------------------------
# MFCC (DCT-II over dB-mel, librosa.feature.mfcc convention)
# ---------------------------------------------------------------------------


def test_dct_ii_matrix_matches_scipy():
    from scipy.fftpack import dct as scipy_dct
    rng = np.random.default_rng(2)
    n_mels, n_mfcc, frames = 12, 7, 5
    S = rng.standard_normal((frames, n_mels))
    want = scipy_dct(S, type=2, axis=-1, norm="ortho")[:, :n_mfcc]
    got = S @ mel.dct_ii_matrix(n_mfcc, n_mels).T
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_power_to_db_matches_librosa_formula():
    rng = np.random.default_rng(3)
    S = rng.uniform(0.0, 5.0, (4, 6)) ** 4  # wide dynamic range
    S[0, 0] = 0.0  # exercise amin floor
    log_spec = 10.0 * np.log10(np.maximum(1e-10, S))
    want = np.maximum(log_spec, log_spec.max() - 80.0)
    got = np.asarray(mel.power_to_db(jnp.asarray(S)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)


def test_mfcc_matches_numpy_oracle_end_to_end():
    """Full-chain oracle: direct-DFT power spec -> numpy filterbank ->
    librosa power_to_db formula -> scipy DCT-II(ortho) -> lifter."""
    from scipy.fftpack import dct as scipy_dct
    rng = np.random.default_rng(4)
    sr, n_fft, hop, n_mels, n_mfcc, lifter = 16000, 64, 16, 10, 6, 22
    y = rng.standard_normal(300).astype(np.float32)

    spec = _dft_power_oracle(y.astype(np.float64), n_fft, hop)
    fb = mel.mel_filterbank(sr, n_fft, n_mels).astype(np.float64)
    mel_power = spec @ fb.T
    log_spec = 10.0 * np.log10(np.maximum(1e-10, mel_power))
    db = np.maximum(log_spec, log_spec.max() - 80.0)
    want = scipy_dct(db, type=2, axis=-1, norm="ortho")[:, :n_mfcc]
    want *= 1.0 + (lifter / 2.0) * np.sin(
        np.pi * (1.0 + np.arange(n_mfcc)) / lifter)

    got = np.asarray(mel.mfcc(jnp.asarray(y), sr=sr, n_fft=n_fft, hop=hop,
                              n_mels=n_mels, n_mfcc=n_mfcc, lifter=lifter))
    assert got.shape == (1 + len(y) // hop, n_mfcc)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_mfcc_no_lifter_default():
    rng = np.random.default_rng(5)
    y = rng.standard_normal(256).astype(np.float32)
    a = np.asarray(mel.mfcc(jnp.asarray(y), n_fft=64, hop=32, n_mels=8,
                            n_mfcc=4))
    b = np.asarray(mel.mfcc(jnp.asarray(y), n_fft=64, hop=32, n_mels=8,
                            n_mfcc=4, lifter=0))
    np.testing.assert_allclose(a, b)
