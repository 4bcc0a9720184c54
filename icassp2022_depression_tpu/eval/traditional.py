"""Traditional (sklearn) baselines — explicitly host-side, not a TPU port.

Reference: ``Classification/AudioTraditionalClassifiers.py`` (RandomForest
n_estimators=50 active, SVM/LR commented) and
``Classification/TextTraditionalClassifiers.py`` (DecisionTree max_depth=20
active), both on the same folds + augmentation with flattened [3*D]
features and NaN->0 metric handling (``AudioTraditionalClassifiers.py:
112-114``).  The regression scripts carry commented SVR/DT/RF/AdaBoost
blocks (``Regression/audio_bilstm_perm.py:268-376``); all variants are
selectable here.
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np

from icassp2022_depression_tpu.data import augment
from icassp2022_depression_tpu.data import folds as folds_lib
from icassp2022_depression_tpu.eval import metrics


def _make_classifier(name: str, seed: int = 0):
    if name == "rf":
        from sklearn.ensemble import RandomForestClassifier
        return RandomForestClassifier(n_estimators=50, random_state=seed)
    if name == "dt":
        from sklearn.tree import DecisionTreeClassifier
        return DecisionTreeClassifier(max_depth=20, random_state=seed)
    if name == "svm":
        from sklearn.svm import SVC
        return SVC(kernel="linear")
    if name == "lr":
        from sklearn.linear_model import LogisticRegression
        return LogisticRegression(max_iter=1000)
    raise ValueError(f"unknown classifier {name!r}")


def _make_regressor(name: str, seed: int = 0):
    if name == "svr":
        from sklearn.svm import SVR
        return SVR(kernel="linear", gamma="auto")
    if name == "dt":
        from sklearn.tree import DecisionTreeRegressor
        return DecisionTreeRegressor(max_depth=100, random_state=seed)
    if name == "rf":
        from sklearn.ensemble import RandomForestRegressor
        return RandomForestRegressor(max_depth=100, random_state=seed)
    if name == "ada":
        from sklearn.ensemble import AdaBoostRegressor
        return AdaBoostRegressor(n_estimators=50, random_state=seed)
    raise ValueError(f"unknown regressor {name!r}")


def classify(features: np.ndarray, targets: np.ndarray,
             train_folds_idx: Sequence[np.ndarray],
             model: str = "rf", seed: int = 0):
    """3-fold traditional classification with the reference's recipe:
    augmented folds, flattened features, NaN-safe mean P/R/F1."""
    dep = np.where(targets == 1)[0]
    non = np.where(targets == 0)[0]
    results: List[dict] = []
    for fold, tr_idx in enumerate(train_folds_idx, start=1):
        (xtr, ytr), (xte, yte) = augment.augment_classification_fold(
            [features], targets, tr_idx, dep, non)
        clf = _make_classifier(model, seed)
        clf.fit(xtr[0].reshape(len(ytr), -1), ytr)
        pred = clf.predict(xte[0].reshape(len(yte), -1))
        cm = metrics.standard_confusion_matrix(yte, pred)
        m = metrics.safe_classification_metrics(cm)
        m["fold"] = fold
        results.append(m)
    summary = metrics.fold_mean(results,
                                ("precision", "recall", "f1", "accuracy"))
    return results, summary


def regress(features: np.ndarray, targets: np.ndarray,
            dep_idxs: np.ndarray, non_idxs: np.ndarray,
            model: str = "svr", seed: int = 0, n_folds: int = 3,
            test_dep: int = 10, test_non: int = 44,
            augment_first_n: int = 14):
    """3-fold traditional regression (the commented sklearn blocks of the
    regression scripts, made runnable).

    Fits on the same *augmented* train split the neural trainer builds —
    first ``augment_first_n`` depressed train speakers expanded to all 6
    permutations — matching the arrays the reference's commented blocks
    operate on (``Regression/audio_bilstm_perm.py:221-231,268-376``; those
    blocks index the grown ``audio_features`` with
    ``train_dep_idxs + train_non_idxs + ...``).  Deliberate deviation: the
    commented SVM block then re-splits that concatenation with a fresh
    ``KFold`` and scores against a commented-out validation set — an
    internally inconsistent fragment — so evaluation here uses the
    trainer's own unaugmented per-fold test split instead."""
    results: List[dict] = []
    for fold in range(n_folds):
        tr_d, tr_n, te_d, te_n = folds_lib.reg_fold_split(
            dep_idxs, non_idxs, fold, test_dep, test_non)
        (xtr, ytr), (xte, yte) = augment.augment_regression_fold(
            [features], targets, tr_d, tr_n, te_d, te_n, augment_first_n)
        reg = _make_regressor(model, seed)
        reg.fit(xtr[0].reshape(len(ytr), -1), ytr)
        pred = reg.predict(xte[0].reshape(len(yte), -1))
        results.append({
            "fold": fold + 1,
            "mae": metrics.mean_absolute_error(yte, pred),
            "rmse": metrics.root_mean_squared_error(yte, pred),
        })
    summary = metrics.fold_mean(results, ("mae", "rmse"))
    return results, summary
