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
