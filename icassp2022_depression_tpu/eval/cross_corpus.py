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


def _bucketed_apply(apply_fn, params, wins: np.ndarray) -> np.ndarray:
    """Pad the window count to a power-of-two bucket: one compile per
    bucket instead of one per distinct participant response count (compiles
    are expensive through this environment's remote service)."""
    n = len(wins)
    bucket = shapes.next_pow2(n)
    if bucket > n:
        wins = np.concatenate(
            [wins, np.zeros((bucket - n,) + wins.shape[1:], wins.dtype)])
    return np.asarray(apply_fn(params, jnp.asarray(wins)))[:n]


def evaluate_clf(params, features: Sequence[np.ndarray], labels,
                 mcfg: C.RNNConfig = C.AUDIO_CLF.model) -> dict:
    """EATD audio classifier on DAIC participants (soft-voted windows)."""
    apply_fn = jax.jit(lambda p, x: audio_net.apply(p, mcfg, x))
    preds = []
    for feat in features:
        wins = windows_of_3(feat)
        if len(wins) == 0:
            preds.append(0)
            continue
        probs = _bucketed_apply(apply_fn, params, wins)
        preds.append(int(np.argmax(probs.mean(axis=0))))
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
    apply_fn = jax.jit(lambda p, x: audio_net.apply(p, mcfg, x))
    preds = []
    for feat in features:
        wins = windows_of_3(feat)
        if len(wins) == 0:
            preds.append(0.0)
            continue
        out = _bucketed_apply(apply_fn, params, wins)
        preds.append(float(out.mean()))
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
