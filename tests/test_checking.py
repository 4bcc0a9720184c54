"""Model-checking harness + traditional baselines + logging utils."""

import json

import numpy as np
import jax
import pytest

from icassp2022_depression_tpu import config as C
from icassp2022_depression_tpu.data import folds
from icassp2022_depression_tpu.eval import checking, traditional
from icassp2022_depression_tpu.models import audio_net, fusion, text_net
from icassp2022_depression_tpu.train import checkpoints
from icassp2022_depression_tpu.utils.logging import (
    MetricsLogger,
    format_confusion_matrix,
    format_epoch_clf,
)

ACFG = C.replace(C.AUDIO_CLF.model, embedding_size=16, hidden_dims=16)


def _clf_data(seed=0, n=24, d=16):
    rng = np.random.default_rng(seed)
    targets = (rng.random(n) < 0.4).astype(np.int64)
    x = (np.where(targets[:, None, None] == 1, .6, -.6) +
         rng.standard_normal((n, 3, d))).astype(np.float32)
    return x, targets


def test_check_audio_clf_with_params_and_paths(tmp_path):
    x, y = _clf_data()
    tf_idx = folds.generate_clf_folds(y, 3, seed=0)
    params = [audio_net.init(jax.random.PRNGKey(i), ACFG) for i in range(3)]
    results, summary = checking.check_audio_clf(x, y, tf_idx, params, ACFG)
    assert len(results) == 3
    assert set(summary) == {"precision", "recall", "f1", "accuracy"}
    # path-based loading gives identical numbers
    paths = []
    for i, p in enumerate(params):
        path = tmp_path / f"ckpt_{i}"
        checkpoints.save(path, p)
        paths.append(path)
    results2, summary2 = checking.check_audio_clf(x, y, tf_idx, paths, ACFG)
    for k in summary:
        # untrained models can yield nan precision/f1 (the reference's
        # formulas propagate the division by zero) — nan == nan here
        np.testing.assert_equal(summary[k], summary2[k])


def test_check_fuse_and_reg():
    xa, y = _clf_data(1)
    xt, _ = _clf_data(2, d=24)
    fcfg = C.replace(C.FUSE_CLF, audio_embed_size=16, text_embed_size=24,
                     audio_hidden_dims=8, text_hidden_dims=8)
    tf_idx = folds.generate_clf_folds(y, 3, seed=1)
    fparams = [fusion.init(jax.random.PRNGKey(i), fcfg) for i in range(3)]
    results, summary = checking.check_fuse_clf(xa, xt, y, tf_idx, fparams, fcfg)
    assert len(results) == 3 and "f1" in summary

    # regression checking
    rcfg = C.replace(C.AUDIO_REG.model, embedding_size=16, hidden_dims=16)
    scores = np.where(y == 1, 60.0, 40.0).astype(np.float32)
    dep, non = folds.generate_reg_shuffles(scores, seed=0)
    rparams = [audio_net.init(jax.random.PRNGKey(i), rcfg) for i in range(3)]
    fc = C.FoldConfig(reg_test_dep=2, reg_test_non=4)
    rres, rsum = checking.check_audio_reg(xa, scores, dep, non, rparams, rcfg,
                                          fold_cfg=fc)
    assert len(rres) == 3 and np.isfinite(rsum["mae"])


def test_traditional_classify_and_regress():
    x, y = _clf_data(3, n=30)
    tf_idx = folds.generate_clf_folds(y, 3, seed=0)
    for model in ("rf", "dt", "svm", "lr"):
        _, summary = traditional.classify(x, y, tf_idx, model=model)
        assert 0.0 <= summary["f1"] <= 1.0
    scores = np.where(y == 1, 60.0, 40.0) + np.random.default_rng(0).normal(0, 3, len(y))
    dep, non = folds.generate_reg_shuffles(scores, seed=0)
    for model in ("svr", "dt", "rf", "ada"):
        _, summary = traditional.regress(x, scores.astype(np.float32), dep,
                                         non, model=model, test_dep=2,
                                         test_non=4)
        assert np.isfinite(summary["mae"])


def test_metrics_logger(tmp_path):
    path = tmp_path / "m.jsonl"
    logger = MetricsLogger(path)
    logs = {"f1": np.array([0.1, 0.5]), "loss": np.array([2.0, 1.0])}
    logger.log_fold("audio_clf", 1, logs, {"f1": 0.5, "params": None})
    lines = [json.loads(l) for l in path.read_text().splitlines()]
    assert len(lines) == 3
    assert lines[0]["event"] == "epoch" and lines[0]["f1"] == pytest.approx(0.1)
    assert lines[2]["event"] == "fold_best" and "params" not in lines[2]


def test_reference_print_formats():
    s = format_confusion_matrix([[3, 1], [2, 10]])
    assert "Confusion Matrix:" in s and "[[3 1]" in s
    line = format_epoch_clf(5, 6e-6, 1.23, 80, 100)
    assert "Train Epoch:  5" in line and "80/100 (80%)" in line
