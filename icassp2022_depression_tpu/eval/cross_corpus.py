"""Cross-corpus evaluation: EATD-trained models on DAIC-WOZ features.

The reference ships the DAIC frontend for cross-corpus work
(``DAICFeatureExtarction/``; BASELINE config 5) but no evaluation code —
its EATD models consume exactly 3 utterances per speaker while DAIC yields
a variable number of responses.  This utility bridges the shape gap:

* each participant's response features are chunked into consecutive
  windows of 3 (the EATD answer count), the last window padded by
  repeating its final response;
* the EATD classifier scores every window; windows' probabilities are
  mean-pooled per participant (soft voting) into one prediction;
* metrics use the standard depressed-positive conventions against
  PHQ8_Binary (classification) or PHQ8_Score (regression MAE/RMSE).
"""

from __future__ import annotations

import functools

from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from icassp2022_depression_tpu.utils import shapes
from icassp2022_depression_tpu import config as C
from icassp2022_depression_tpu.eval import metrics
from icassp2022_depression_tpu.models import audio_net


def windows_of_3(responses: np.ndarray) -> np.ndarray:
    """[n, D] response features -> [ceil(n/3), 3, D] windows (tail padded
    by repeating the last response)."""
    responses = np.asarray(responses)
    if responses.ndim == 3:  # [n, 1, D] ragged-block layout
        responses = responses[:, 0, :]
    n, d = responses.shape
    if n == 0:
        return np.zeros((0, 3, d), np.float32)
    n_win = -(-n // 3)
    padded = np.concatenate(
        [responses, np.repeat(responses[-1:], n_win * 3 - n, axis=0)], axis=0)
    return padded.reshape(n_win, 3, d).astype(np.float32)


@functools.lru_cache(maxsize=8)
def _apply_jit(mcfg: C.RNNConfig):
    """One jitted forward per model config — NOT per evaluate_* call, so
    repeated evaluations reuse the compiled program (compiles ride the
    volatile remote service here)."""
    return jax.jit(lambda p, x: audio_net.apply(p, mcfg, x))


def _all_window_outputs(apply_fn, params, features):
    """Every participant's windows through ONE padded device batch ->
    (per-participant window counts, [total, ...] outputs).

    One dispatch and one blocking readback for the whole corpus: the
    relay charges ~0.45 s per blocking fetch regardless of payload
    (CLAUDE.md), so a readback per participant would cost ~n_participants
    round-trips.  The total window count pads to a power of two (bounded
    compile keys)."""
    wins_list = [windows_of_3(f) for f in features]
    counts = [len(w) for w in wins_list]
    total = sum(counts)
    if total == 0:
        return counts, None
    flat = np.concatenate([w for w in wins_list if len(w)], axis=0)
    bucket = shapes.next_pow2(total)
    if bucket > total:
        flat = np.concatenate(
            [flat, np.zeros((bucket - total,) + flat.shape[1:],
                            flat.dtype)])
    return counts, np.asarray(apply_fn(params, jnp.asarray(flat)))[:total]


def evaluate_clf(params, features: Sequence[np.ndarray], labels,
                 mcfg: C.RNNConfig = C.AUDIO_CLF.model) -> dict:
    """EATD audio classifier on DAIC participants (soft-voted windows)."""
    counts, probs = _all_window_outputs(_apply_jit(mcfg), params, features)
    preds = []
    pos = 0
    for c in counts:
        if c == 0:
            preds.append(0)
            continue
        preds.append(int(np.argmax(probs[pos:pos + c].mean(axis=0))))
        pos += c
    cm = metrics.standard_confusion_matrix(np.asarray(labels),
                                           np.asarray(preds))
    m = metrics.safe_classification_metrics(cm)
    m["confusion_matrix"] = cm.tolist()
    m["predictions"] = preds
    return m


def evaluate_reg(params, features: Sequence[np.ndarray], scores,
                 mcfg: C.RNNConfig = C.AUDIO_REG.model) -> dict:
    """EATD audio regressor on DAIC participants (window-mean scores).

    Note the scale mismatch (SDS 25-75 vs PHQ8 0-24) — cross-corpus score
    regression needs a calibration; raw MAE/RMSE are reported alongside a
    least-squares affine rescaling of the predictions (documented aid)."""
    counts, out = _all_window_outputs(_apply_jit(mcfg), params, features)
    preds = []
    pos = 0
    for c in counts:
        if c == 0:
            preds.append(0.0)
            continue
        preds.append(float(out[pos:pos + c].mean()))
        pos += c
    preds = np.asarray(preds)
    scores = np.asarray(scores, np.float64)
    result = {
        "mae": metrics.mean_absolute_error(scores, preds),
        "rmse": metrics.root_mean_squared_error(scores, preds),
    }
    # affine calibration (a*pred + b), least squares
    a_mat = np.stack([preds, np.ones_like(preds)], axis=1)
    coef, *_ = np.linalg.lstsq(a_mat, scores, rcond=None)
    calibrated = a_mat @ coef
    result["mae_calibrated"] = metrics.mean_absolute_error(scores, calibrated)
    result["rmse_calibrated"] = metrics.root_mean_squared_error(scores,
                                                               calibrated)
    return result
