"""VGGish audio embedding (capability parity component).

The reference defines ``to_vggish_embedds`` — waveform -> TF1 slim VGGish
-> PCA/whitening postprocessor — but never calls it in the committed
pipeline (``Classification/audio_features_whole.py:39-55``; wav2vlad is
used instead).  It is part of the capability surface, so the full path is
implemented TPU-native:

* :func:`waveform_to_examples`: VGGish's own frontend — resample to 16 kHz,
  25 ms / 10 ms magnitude STFT, 64 HTK-mel bins in [125, 7500] Hz,
  log(mel + 0.01), framed into non-overlapping 0.96 s examples [N, 96, 64];
* :func:`apply`: the VGG conv stack (64-128-256x2-512x2 + 4096-4096-128 FC,
  ReLU throughout, as in the torchvggish port of the TF checkpoint) as one
  jitted XLA program (convs tile onto the MXU);
* :class:`Postprocessor`: PCA projection + [-2, 2] clip + uint8 quantise
  (``vggish_postprocess`` semantics).

Pretrained weights: convert the released checkpoint to npz and pass the
param pytree; otherwise deterministic PRNG init (documented stand-in, as
with NetVLAD/ELMo).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from icassp2022_depression_tpu.ops import mel as mel_ops

SAMPLE_RATE = 16000
STFT_WINDOW = 400   # 25 ms
STFT_HOP = 160      # 10 ms
NUM_MEL_BINS = 64
MEL_MIN_HZ = 125.0
MEL_MAX_HZ = 7500.0
LOG_OFFSET = 0.01
EXAMPLE_FRAMES = 96  # 0.96 s of 10 ms frames
EMBEDDING_SIZE = 128

_CONV_CHANNELS = [(1, 64), (64, 128), (128, 256), (256, 256),
                  (256, 512), (512, 512)]
#: pool after these conv indices (VGG-ish layout: 1, 1, 2, 2 convs/block)
_POOL_AFTER = {0, 1, 3, 5}


def resample(x: np.ndarray, sr: int, target_sr: int = SAMPLE_RATE) -> np.ndarray:
    """Linear-interpolation resampler (host-side, matches scipy within the
    tolerance the log-mel frontend cares about)."""
    if sr == target_sr:
        return x
    n_out = int(round(len(x) * target_sr / sr))
    t_in = np.arange(len(x)) / sr
    t_out = np.arange(n_out) / target_sr
    return np.interp(t_out, t_in, x).astype(x.dtype)


def _is_pcm_scaled(x: np.ndarray) -> bool:
    """True when the waveform carries raw int16-scale samples (integer
    dtype, or integral-valued floats bounded by 32767 — what the wav
    readers produce).  Amplitude alone cannot decide this: a quiet PCM
    clip peaking at |1| is indistinguishable from full-scale normalised
    audio by range, and a max>1 test creates a ~16384x feature-scale
    cliff between two audibly identical near-silent clips."""
    if np.issubdtype(x.dtype, np.integer):
        return True
    if len(x) == 0 or float(np.max(np.abs(x), initial=0.0)) > 32767:
        return False
    probe = x[:: max(1, len(x) // 64)]
    if not np.all(probe == np.round(probe)):
        return False
    return bool(np.all(x == np.round(x)))


def waveform_to_examples(x: np.ndarray, sr: int) -> np.ndarray:
    """[T] waveform (any rate) -> [N, 96, 64] log-mel examples.

    Raw int16-scale PCM (what the corpus readers and serving requests
    carry) is normalised by 32768 like upstream ``wavfile_to_examples``;
    already-normalised float audio passes through.  The frame window is
    upstream ``mel_features``'s SYMMETRIC Hann (``np.hanning``), not the
    periodic Hann the librosa-convention EATD frontend uses — the
    released vggish_model.ckpt was trained on symmetric-windowed frames.
    """
    x = np.asarray(x)
    if _is_pcm_scaled(x):
        x = np.asarray(x, np.float32) / 32768.0  # int16 scale -> [-1, 1]
    x = np.asarray(x, np.float32)
    x = resample(x, sr)
    n_frames = 1 + (len(x) - STFT_WINDOW) // STFT_HOP if len(x) >= STFT_WINDOW else 0
    if n_frames <= 0:
        return np.zeros((0, EXAMPLE_FRAMES, NUM_MEL_BINS), np.float32)
    idx = np.arange(n_frames)[:, None] * STFT_HOP + np.arange(STFT_WINDOW)
    window = np.hanning(STFT_WINDOW).astype(np.float32)
    frames = x[idx] * window
    spec = np.abs(np.fft.rfft(frames, n=512, axis=-1))  # magnitude, fft 512
    log_mel = np.log(spec @ _vggish_mel_matrix().T + LOG_OFFSET)
    n_examples = log_mel.shape[0] // EXAMPLE_FRAMES
    return log_mel[:n_examples * EXAMPLE_FRAMES].reshape(
        n_examples, EXAMPLE_FRAMES, NUM_MEL_BINS).astype(np.float32)


@functools.lru_cache(maxsize=1)
def _vggish_mel_matrix() -> np.ndarray:
    """VGGish's own mel weight matrix [64, 257]: unnormalised triangles
    interpolated in MEL space (``vggish_input``'s
    ``spectrogram_to_mel_matrix`` semantics — NOT librosa's Hz-space
    triangles), with the DC spectrogram bin zeroed.  An earlier version
    peak-renormalised a Slaney filterbank, which forces every peak to
    exactly 1.0 while the discrete mel-space triangles peak slightly
    below it — a small systematic per-band scale error with released
    weights."""
    n_bins = 1 + 512 // 2
    spec_mel = mel_ops.hz_to_mel(
        np.linspace(0.0, SAMPLE_RATE / 2.0, n_bins), htk=True)
    edges = np.linspace(mel_ops.hz_to_mel(MEL_MIN_HZ, htk=True),
                        mel_ops.hz_to_mel(MEL_MAX_HZ, htk=True),
                        NUM_MEL_BINS + 2)
    fb = np.zeros((NUM_MEL_BINS, n_bins), np.float32)
    for i in range(NUM_MEL_BINS):
        lo, ctr, hi = edges[i], edges[i + 1], edges[i + 2]
        lower = (spec_mel - lo) / (ctr - lo)
        upper = (hi - spec_mel) / (hi - ctr)
        fb[i] = np.maximum(0.0, np.minimum(lower, upper))
    fb[:, 0] = 0.0   # the DC bin contributes nothing
    return fb


def warn_standin_weights() -> None:
    """Unmissable stderr notice that PRNG-initialised VGGish weights are
    in use instead of the released checkpoint — the audio twin of
    ``frontend.text.warn_standin_encoder`` (the reference's
    ``to_vggish_embedds`` always loads ``vggish_model.ckpt``,
    ``audio_features_whole.py:31,44``).  Suppress with
    ``ICASSP_SUPPRESS_STANDIN_WARNING=1`` (tests)."""
    import os
    import sys

    if os.environ.get("ICASSP_SUPPRESS_STANDIN_WARNING"):
        return
    print(
        "\n".join([
            "=" * 72,
            "WARNING: no converted VGGish bundle found - using PRNG",
            "stand-in conv weights.  VGGish features will be deterministic",
            "and self-consistent but NOT comparable to features from the",
            "released vggish_model.ckpt the reference uses.  Convert real",
            "weights with scripts/convert_vggish.py and set",
            "ICASSP_VGGISH_WEIGHTS (or pass --vggish-ckpt).",
            "=" * 72,
        ]),
        file=sys.stderr,
        flush=True,
    )


def init(key):
    params = {"convs": [], "fcs": []}
    keys = jax.random.split(key, len(_CONV_CHANNELS) + 3)
    for i, (cin, cout) in enumerate(_CONV_CHANNELS):
        bound = 1.0 / np.sqrt(cin * 9)
        params["convs"].append({
            "w": jax.random.uniform(keys[i], (3, 3, cin, cout),
                                    minval=-bound, maxval=bound),
            "b": jnp.zeros((cout,)),
        })
    dims = [(EXAMPLE_FRAMES // 16 * NUM_MEL_BINS // 16 * 512, 4096),
            (4096, 4096), (4096, EMBEDDING_SIZE)]
    for j, (din, dout) in enumerate(dims):
        bound = 1.0 / np.sqrt(din)
        params["fcs"].append({
            "w": jax.random.uniform(keys[len(_CONV_CHANNELS) + j],
                                    (din, dout), minval=-bound, maxval=bound),
            "b": jnp.zeros((dout,)),
        })
    return params


@jax.jit
def apply(params, examples: jnp.ndarray) -> jnp.ndarray:
    """[N, 96, 64] log-mel examples -> [N, 128] embeddings."""
    x = examples[..., None]  # NHWC
    for i, conv in enumerate(params["convs"]):
        x = jax.lax.conv_general_dilated(
            x, conv["w"], window_strides=(1, 1), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        x = jax.nn.relu(x + conv["b"])
        if i in _POOL_AFTER:
            x = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
    x = x.reshape(x.shape[0], -1)
    for fc in params["fcs"]:
        x = jax.nn.relu(jnp.dot(x, fc["w"],
                                preferred_element_type=jnp.float32) + fc["b"])
    return x


class Postprocessor:
    """PCA + clip + uint8 quantise (``vggish_postprocess.Postprocessor``)."""

    def __init__(self, pca_matrix: np.ndarray, pca_means: np.ndarray,
                 clip_min: float = -2.0, clip_max: float = 2.0):
        self.pca_matrix = np.asarray(pca_matrix, np.float32)
        self.pca_means = np.asarray(pca_means, np.float32).reshape(-1, 1)
        self.clip_min, self.clip_max = clip_min, clip_max

    @classmethod
    def random(cls, key, dim: int = EMBEDDING_SIZE):
        q, _ = jnp.linalg.qr(jax.random.normal(key, (dim, dim)))
        return cls(np.asarray(q), np.zeros(dim))

    def __call__(self, embeddings: np.ndarray) -> np.ndarray:
        applied = np.dot(self.pca_matrix,
                         (np.asarray(embeddings).T - self.pca_means)).T
        clipped = np.clip(applied, self.clip_min, self.clip_max)
        quantized = ((clipped - self.clip_min) *
                     (255.0 / (self.clip_max - self.clip_min)))
        return quantized.astype(np.uint8)


#: slim variable scopes in the released vggish_model.ckpt, in stack order
#: (``Classification/audio_features_whole.py:31`` loads this checkpoint)
_TF_CONV_SCOPES = ["vggish/conv1", "vggish/conv2",
                   "vggish/conv3/conv3_1", "vggish/conv3/conv3_2",
                   "vggish/conv4/conv4_1", "vggish/conv4/conv4_2"]
_TF_FC_SCOPES = ["vggish/fc1/fc1_1", "vggish/fc1/fc1_2", "vggish/fc2"]


def from_tf_checkpoint(ckpt_path) -> dict:
    """Convert the released TF-slim VGGish checkpoint to this module's
    param pytree (``audio_features_whole.py:31,41-53`` is the reference
    load site).  Slim stores conv kernels HWIO and FC kernels [in, out] —
    both exactly this module's layouts, and slim's ``flatten`` of the NHWC
    feature map matches :func:`apply`'s reshape, so tensors port verbatim.
    Requires tensorflow only for the checkpoint reader."""
    import tensorflow as tf  # local: heavy import, converter-only

    reader = tf.train.load_checkpoint(str(ckpt_path))

    def tensors(scope):
        w = np.asarray(reader.get_tensor(f"{scope}/weights"), np.float32)
        b = np.asarray(reader.get_tensor(f"{scope}/biases"), np.float32)
        return {"w": jnp.asarray(w), "b": jnp.asarray(b)}

    params = {"convs": [tensors(s) for s in _TF_CONV_SCOPES],
              "fcs": [tensors(s) for s in _TF_FC_SCOPES]}
    for i, ((cin, cout), conv) in enumerate(zip(_CONV_CHANNELS,
                                                params["convs"])):
        assert conv["w"].shape == (3, 3, cin, cout), \
            f"conv {i}: got {conv['w'].shape}, want (3, 3, {cin}, {cout})"
    assert params["fcs"][-1]["w"].shape[1] == EMBEDDING_SIZE
    return params


def default_weights_path():
    """Resolution order for auto-loading a converted bundle
    (``scripts/convert_vggish.py``): the ``ICASSP_VGGISH_WEIGHTS`` env
    var, then ``~/.cache/icassp2022_tpu/vggish.npz`` — the same
    convention as the ELMo bundle.  Returns None when neither exists."""
    import os
    from pathlib import Path

    env = os.environ.get("ICASSP_VGGISH_WEIGHTS")
    if env and Path(env).exists():
        return Path(env)
    cached = Path.home() / ".cache" / "icassp2022_tpu" / "vggish.npz"
    if cached.exists():
        return cached
    return None


def load_npz(path):
    """Converted bundle (``scripts/convert_vggish.py``) -> (params,
    Postprocessor | None).  The optional ``pca`` subtree (written when
    the converter got ``--pca``) becomes the postprocessor."""
    p = str(path)
    if not p.endswith(".npz"):
        p += ".npz"
    flat = dict(np.load(p))
    params = {"convs": [], "fcs": []}
    for group in ("convs", "fcs"):
        i = 0
        while f"{group}/{i}/w" in flat:
            params[group].append({"w": jnp.asarray(flat[f"{group}/{i}/w"]),
                                  "b": jnp.asarray(flat[f"{group}/{i}/b"])})
            i += 1
    assert len(params["convs"]) == len(_CONV_CHANNELS), sorted(flat)[:5]
    post = (Postprocessor(flat["pca/matrix"], flat["pca/means"])
            if "pca/matrix" in flat else None)
    return params, post


def load_pca_params(pca_params_path) -> Postprocessor:
    """Released ``vggish_pca_params.npz`` -> :class:`Postprocessor`
    (``audio_features_whole.py:32,44``)."""
    with np.load(pca_params_path) as z:
        return Postprocessor(z["pca_eigen_vectors"], z["pca_means"])


def to_vggish_embedds(params, x: np.ndarray, sr: int,
                      postprocessor: Postprocessor | None = None):
    """Full reference path: waveform -> examples -> embeddings
    (-> postprocessed), as float32 (``audio_features_whole.py:39-55``)."""
    examples = waveform_to_examples(x, sr)
    if examples.shape[0] == 0:
        return np.zeros((0, EMBEDDING_SIZE), np.float32)
    emb = np.asarray(apply(params, jnp.asarray(examples)))
    if postprocessor is not None:
        emb = postprocessor(emb).astype(np.float32)
    return emb
