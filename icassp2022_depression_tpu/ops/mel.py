"""Log-mel spectrogram frontend, TPU-native.

Replaces ``librosa.feature.melspectrogram(signal, n_mels=80, sr=sr)`` +
``np.log(np.maximum(1e-6, .))`` from the reference's ``wav2vlad``
(``Classification/audio_features_whole.py:60-61``) with a jitted XLA
pipeline:

  frame (gather) -> hann window -> rFFT -> |.|^2 -> mel filterbank matmul
  -> log floor

The mel filterbank is a dense [n_mels, n_fft//2+1] matrix applied as a
single matmul on the MXU; framing is a static gather; the whole function is
`jit`-compiled per (padded) length bucket and `vmap`s over batches of
utterances — the reference instead rebuilt a TF graph per utterance.

librosa-compatible settings: n_fft=2048, hop=512, centered frames with
reflect padding, periodic Hann window, power=2 spectrogram, Slaney-style mel
scale with Slaney area normalisation, fmin=0, fmax=sr/2.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Mel filterbank (host-side, static)
# ---------------------------------------------------------------------------


def hz_to_mel(frequencies, htk: bool = False):
    frequencies = np.asanyarray(frequencies, dtype=np.float64)
    if htk:
        return 2595.0 * np.log10(1.0 + frequencies / 700.0)
    # Slaney formula: linear below 1 kHz, log above.
    f_min, f_sp = 0.0, 200.0 / 3
    mels = (frequencies - f_min) / f_sp
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    log_region = frequencies >= min_log_hz
    mels = np.where(
        log_region,
        min_log_mel + np.log(np.maximum(frequencies, 1e-10) / min_log_hz) / logstep,
        mels,
    )
    return mels


def mel_to_hz(mels, htk: bool = False):
    mels = np.asanyarray(mels, dtype=np.float64)
    if htk:
        return 700.0 * (10.0 ** (mels / 2595.0) - 1.0)
    f_min, f_sp = 0.0, 200.0 / 3
    freqs = f_min + f_sp * mels
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    log_region = mels >= min_log_mel
    freqs = np.where(log_region,
                     min_log_hz * np.exp(logstep * (mels - min_log_mel)),
                     freqs)
    return freqs


def mel_filterbank(sr: int, n_fft: int, n_mels: int,
                   fmin: float = 0.0, fmax: float | None = None,
                   htk: bool = False) -> np.ndarray:
    """Dense [n_mels, 1 + n_fft//2] triangular filterbank with Slaney
    normalisation (librosa.filters.mel semantics)."""
    if fmax is None:
        fmax = sr / 2.0
    n_bins = 1 + n_fft // 2
    fft_freqs = np.linspace(0.0, sr / 2.0, n_bins)
    mel_pts = np.linspace(hz_to_mel(fmin, htk), hz_to_mel(fmax, htk), n_mels + 2)
    hz_pts = mel_to_hz(mel_pts, htk)

    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fft_freqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))
    # Slaney area normalisation
    enorm = 2.0 / (hz_pts[2: n_mels + 2] - hz_pts[:n_mels])
    weights *= enorm[:, None]
    return weights.astype(np.float32)


# ---------------------------------------------------------------------------
# STFT + log-mel (device)
# ---------------------------------------------------------------------------


def hann_window(n: int) -> np.ndarray:
    """Periodic Hann (scipy get_window('hann', n, fftbins=True))."""
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n) / n)).astype(np.float32)


def num_frames(length: int, n_fft: int, hop: int, center: bool = True) -> int:
    if center:
        return 1 + length // hop
    return 1 + (length - n_fft) // hop


@functools.partial(jax.jit, static_argnames=("n_fft", "hop", "center"))
def power_spectrogram(y: jnp.ndarray, n_fft: int = 2048, hop: int = 512,
                      center: bool = True) -> jnp.ndarray:
    """[T] waveform -> [frames, 1 + n_fft//2] power spectrogram."""
    if center:
        y = jnp.pad(y, (n_fft // 2, n_fft // 2), mode="reflect")
    n = y.shape[0]
    frames = 1 + (n - n_fft) // hop
    idx = (jnp.arange(frames)[:, None] * hop + jnp.arange(n_fft)[None, :])
    windowed = y[idx] * jnp.asarray(hann_window(n_fft))
    spec = jnp.fft.rfft(windowed, axis=-1)
    return (spec.real ** 2 + spec.imag ** 2).astype(jnp.float32)


@functools.partial(jax.jit,
                   static_argnames=("sr", "n_fft", "hop", "n_mels", "center"))
def log_mel(y: jnp.ndarray, sr: int = 16000, n_fft: int = 2048,
            hop: int = 512, n_mels: int = 80, log_floor: float = 1e-6,
            center: bool = True) -> jnp.ndarray:
    """[T] waveform -> [frames, n_mels] log-mel, exactly the reference's
    ``log(max(1e-6, melspectrogram(...).T))``."""
    spec = power_spectrogram(y, n_fft, hop, center)            # [F, bins]
    fb = jnp.asarray(mel_filterbank(sr, n_fft, n_mels))         # [M, bins]
    mel = jnp.dot(spec, fb.T, preferred_element_type=jnp.float32)
    return jnp.log(jnp.maximum(log_floor, mel))


def dct_ii_matrix(n_out: int, n_in: int, norm: str | None = "ortho") -> np.ndarray:
    """[n_out, n_in] DCT-II basis (scipy.fftpack.dct(type=2) convention).

    With ``norm='ortho'`` rows are orthonormal, matching librosa's
    ``feature.mfcc`` which computes ``dct(S, axis=-2, type=2, norm='ortho')``
    over the dB-scaled mel spectrogram.  Applied as one matmul on the MXU.
    """
    k = np.arange(n_out, dtype=np.float64)[:, None]
    m = np.arange(n_in, dtype=np.float64)[None, :]
    basis = 2.0 * np.cos(np.pi * k * (2.0 * m + 1.0) / (2.0 * n_in))
    if norm == "ortho":
        basis *= np.sqrt(1.0 / (2.0 * n_in))
        basis[0] *= np.sqrt(0.5)
    elif norm is not None:
        raise ValueError(f"unknown DCT norm {norm!r}")
    return basis.astype(np.float32)


def power_to_db(S: jnp.ndarray, amin: float = 1e-10,
                top_db: float | None = 80.0) -> jnp.ndarray:
    """librosa.power_to_db with ref=1.0: 10*log10(max(amin, S)), then clamp
    to within ``top_db`` of the global maximum."""
    log_spec = 10.0 * jnp.log10(jnp.maximum(amin, S))
    if top_db is not None:
        log_spec = jnp.maximum(log_spec, jnp.max(log_spec) - top_db)
    return log_spec


@functools.partial(jax.jit, static_argnames=(
    "sr", "n_fft", "hop", "n_mels", "n_mfcc", "center", "lifter"))
def mfcc(y: jnp.ndarray, sr: int = 16000, n_fft: int = 2048, hop: int = 512,
         n_mels: int = 80, n_mfcc: int = 20, center: bool = True,
         lifter: int = 0) -> jnp.ndarray:
    """[T] waveform -> [frames, n_mfcc] MFCCs, librosa.feature.mfcc
    semantics: DCT-II (ortho) over the dB-scaled mel power spectrogram,
    optional sinusoidal liftering.

    Completes the "STFT, log-mel/MFCC" frontend family: the reference's own
    pipeline stops at log-mel (``Classification/audio_features_whole.py:60``),
    so MFCC is an extension, not a parity requirement.
    """
    spec = power_spectrogram(y, n_fft, hop, center)             # [F, bins]
    fb = jnp.asarray(mel_filterbank(sr, n_fft, n_mels))          # [M, bins]
    mel_power = jnp.dot(spec, fb.T, preferred_element_type=jnp.float32)
    db = power_to_db(mel_power)                                  # [F, M]
    dct = jnp.asarray(dct_ii_matrix(n_mfcc, n_mels))             # [C, M]
    out = jnp.dot(db, dct.T, preferred_element_type=jnp.float32)  # [F, C]
    if lifter > 0:
        lift = 1.0 + (lifter / 2.0) * np.sin(
            np.pi * (1.0 + np.arange(n_mfcc)) / lifter)
        out = out * jnp.asarray(lift.astype(np.float32))[None, :]
    return out


def frame_mask(lengths: jnp.ndarray, max_frames: int, hop: int = 512,
               center: bool = True, n_fft: int = 2048) -> jnp.ndarray:
    """Valid-frame mask [B, max_frames] for a batch of padded waveforms with
    true sample counts ``lengths`` [B] (ragged batching support)."""
    if center:
        nf = 1 + lengths // hop
    else:
        nf = 1 + (lengths - n_fft) // hop
    return (jnp.arange(max_frames)[None, :] < nf[:, None])


batched_log_mel = jax.vmap(log_mel, in_axes=(0,) + (None,) * 6)
