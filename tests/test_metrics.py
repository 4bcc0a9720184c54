import numpy as np
import jax.numpy as jnp
import pytest
from sklearn.metrics import confusion_matrix as sk_confusion_matrix

from icassp2022_depression_tpu.eval import metrics


def test_standard_confusion_matrix_matches_sklearn_reorder():
    rng = np.random.default_rng(0)
    y_true = rng.integers(0, 2, 50)
    y_pred = rng.integers(0, 2, 50)
    [[tn, fp], [fn, tp]] = sk_confusion_matrix(y_true, y_pred)
    expected = np.array([[tp, fp], [fn, tn]])
    np.testing.assert_array_equal(
        metrics.standard_confusion_matrix(y_true, y_pred), expected)


def test_classification_metrics_formulas():
    cm = np.array([[10, 5], [2, 33]])  # [[TP, FP], [FN, TN]]
    m = metrics.classification_metrics(cm)
    assert m["accuracy"] == pytest.approx(43 / 50)
    assert m["precision"] == pytest.approx(10 / 15)
    assert m["recall"] == pytest.approx(10 / 12)
    p, r = 10 / 15, 10 / 12
    assert m["f1"] == pytest.approx(2 * p * r / (p + r))


def test_safe_metrics_nan_to_zero():
    cm = np.array([[0, 0], [3, 47]])  # no positive predictions
    m = metrics.safe_classification_metrics(cm)
    assert m["precision"] == 0.0 and m["f1"] == 0.0


def test_device_f1_matches_host():
    rng = np.random.default_rng(1)
    y_true = rng.integers(0, 2, 64)
    y_pred = rng.integers(0, 2, 64)
    cm = metrics.standard_confusion_matrix(y_true, y_pred)
    host = metrics.classification_metrics(cm)
    tp, fp, fn, tn = metrics.confusion_counts(jnp.asarray(y_true), jnp.asarray(y_pred))
    acc, prec, rec, f1 = metrics.f1_from_counts(tp, fp, fn, tn)
    assert float(acc) == pytest.approx(host["accuracy"], abs=1e-6)
    assert float(prec) == pytest.approx(host["precision"], abs=1e-6)
    assert float(rec) == pytest.approx(host["recall"], abs=1e-6)
    assert float(f1) == pytest.approx(host["f1"], abs=1e-6)


def test_device_f1_respects_mask():
    y_true = jnp.array([1, 0, 1, 1])
    y_pred = jnp.array([1, 0, 0, 1])
    mask = jnp.array([1, 1, 1, 0])
    tp, fp, fn, tn = metrics.confusion_counts(y_true, y_pred, mask)
    assert (float(tp), float(fp), float(fn), float(tn)) == (1.0, 0.0, 1.0, 1.0)


def test_mae_rmse():
    y, p = np.array([1.0, 2.0, 3.0]), np.array([2.0, 2.0, 5.0])
    assert metrics.mean_absolute_error(y, p) == pytest.approx(1.0)
    assert metrics.root_mean_squared_error(y, p) == pytest.approx(np.sqrt(5 / 3))
    assert float(metrics.masked_mae(jnp.asarray(y), jnp.asarray(p))) == pytest.approx(1.0)
    m = jnp.array([1.0, 1.0, 0.0])
    assert float(metrics.masked_mae(jnp.asarray(y), jnp.asarray(p), m)) == pytest.approx(0.5)
