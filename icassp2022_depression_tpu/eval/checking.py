"""Model-checking harness (L5): recompute fold metrics from saved
checkpoints.

Reference counterparts: ``Classification/AudioModelChecking.py``,
``Classification/TextModelChecking.py``, ``Classification/FuseModelChecking.py``,
``Regression/AudioModelChecking.py`` — each re-runs the exact
split+augmentation recipe, loads the fold's checkpoint, and prints per-fold
and mean P/R/F1 (or MAE/RMSE).  Those scripts re-declare the models and
copy the fold logic; here checking reuses the single model/data
definitions, and inference runs as one jitted batch per fold.
"""

from __future__ import annotations

from pathlib import Path
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from icassp2022_depression_tpu import config as C
from icassp2022_depression_tpu.data import augment, folds
from icassp2022_depression_tpu.eval import metrics
from icassp2022_depression_tpu.models import (audio_net, fusion, porting,
                                              text_net)
from icassp2022_depression_tpu.utils import shapes


def _load(ckpt, kind: str, cfg, template):
    """Checkpoint resolution incl. the reference's whole-module ``.pt``
    pickles (``FuseModelChecking.py:100`` torch.loads them; here
    ``porting.load_params`` extracts + maps without running torch code)."""
    return porting.load_params(ckpt, kind, cfg, template)


def _padded_apply(apply_fn, params, *arrays) -> np.ndarray:
    """Apply with the batch padded to a power-of-two bucket, sliced back.

    The clf folds' augmented test sets differ in size (each fold's
    depressed count differs), so unpadded shapes would compile one
    program per fold through the volatile remote compile service; pow2
    bucketing shares one compile across folds (the same policy the
    frontends use, utils/shapes.py).  Padding rows are zeros and are
    sliced away before any metric sees them."""
    n = len(arrays[0])
    bucket = shapes.next_pow2(n)
    if bucket > n:
        arrays = tuple(
            np.concatenate([a, np.zeros((bucket - n,) + a.shape[1:],
                                        a.dtype)]) for a in arrays)
    out = np.asarray(apply_fn(params, *(jnp.asarray(a) for a in arrays)))
    return out[:n]


def _clf_fold_eval(pred_probs: np.ndarray, y: np.ndarray) -> dict:
    y_pred = np.argmax(pred_probs, axis=-1)
    cm = metrics.standard_confusion_matrix(y, y_pred)
    m = metrics.classification_metrics(cm)
    m["confusion_matrix"] = cm.tolist()
    return m


_mean = metrics.fold_mean


def check_branch_clf(model_module, mcfg: C.RNNConfig, features, targets,
                     train_folds_idx, ckpt_paths: Sequence[Path],
                     fold_cfg: C.FoldConfig = C.FoldConfig()):
    """Audio/Text classification checking: per-fold + mean P/R/F1.

    ``ckpt_paths[fold]`` may be a path (loaded with the model's param
    template) or an in-memory param pytree.  Pass the same ``fold_cfg`` as
    training so the recomputed test split (augmentation perm ids) matches
    the trainer's."""
    dep = np.where(np.asarray(targets) == 1)[0]
    non = np.where(np.asarray(targets) == 0)[0]
    kind = "audio" if model_module is audio_net else "text"
    template = model_module.init(jax.random.PRNGKey(0), mcfg)
    apply_fn = jax.jit(lambda p, x: model_module.apply(p, mcfg, x))
    results = []
    for fold, (tr_idx, ckpt) in enumerate(zip(train_folds_idx, ckpt_paths),
                                          start=1):
        _, (xte, yte) = augment.augment_classification_fold(
            [features], targets, tr_idx, dep, non,
            train_perm_ids=fold_cfg.train_perm_ids,
            test_perm_ids=fold_cfg.test_perm_ids)
        params = _load(ckpt, kind, mcfg, template)
        probs = _padded_apply(apply_fn, params, xte[0])
        m = _clf_fold_eval(probs, yte)
        m["fold"] = fold
        results.append(m)
    summary = _mean(results, ("precision", "recall", "f1", "accuracy"))
    return results, summary


def check_audio_clf(features, targets, train_folds_idx, ckpt_paths,
                    mcfg: C.RNNConfig = C.AUDIO_CLF.model,
                    fold_cfg: C.FoldConfig = C.FoldConfig()):
    return check_branch_clf(audio_net, mcfg, features, targets,
                            train_folds_idx, ckpt_paths, fold_cfg)


def check_text_clf(features, targets, train_folds_idx, ckpt_paths,
                   mcfg: C.RNNConfig = C.TEXT_CLF.model,
                   fold_cfg: C.FoldConfig = C.FoldConfig()):
    return check_branch_clf(text_net, mcfg, features, targets,
                            train_folds_idx, ckpt_paths, fold_cfg)


def check_fuse_clf(audio_features, text_features, targets, train_folds_idx,
                   ckpt_paths, fcfg: C.FusionConfig = C.FUSE_CLF,
                   fold_cfg: C.FoldConfig = C.FoldConfig()):
    """Fusion checking (``FuseModelChecking.py:62-105``)."""
    dep = np.where(np.asarray(targets) == 1)[0]
    non = np.where(np.asarray(targets) == 0)[0]
    template = fusion.init(jax.random.PRNGKey(0), fcfg)

    @jax.jit
    def apply_fn(p, xa, xt):
        probs, _ = fusion.apply(p, fcfg, xa, xt, train=False)
        return probs

    results = []
    for fold, (tr_idx, ckpt) in enumerate(zip(train_folds_idx, ckpt_paths),
                                          start=1):
        _, ((xa, xt), yte) = augment.augment_classification_fold(
            [audio_features, text_features], targets, tr_idx, dep, non,
            train_perm_ids=fold_cfg.train_perm_ids,
            test_perm_ids=fold_cfg.test_perm_ids)
        params = _load(ckpt, "fusion", fcfg, template)
        probs = _padded_apply(apply_fn, params, xa, xt)
        m = _clf_fold_eval(probs, yte)
        m["fold"] = fold
        results.append(m)
    return results, _mean(results, ("precision", "recall", "f1", "accuracy"))


def check_branch_reg(model_module, mcfg: C.RNNConfig, features, targets,
                     dep_idxs, non_idxs, ckpt_paths,
                     fold_cfg: C.FoldConfig = C.FoldConfig()):
    """Regression checking: MAE/RMSE on the (unaugmented) test split of each
    fold (``Regression/AudioModelChecking.py:129-155`` checks one hardcoded
    fold; we check all three).

    This also subsumes the reference's single-modality fusion diagnostics
    ``evaluate_audio``/``evaluate_text`` (``Regression/fuse_net.py:458-524``,
    invoked only from commented-out lines ``:591-592``): those feed one
    modality of the fusion pairs to a *branch* model over the same
    ``reg_fold_split`` test indices and print MAE/RMSE — i.e. exactly
    ``check_audio_reg``/``check_text_reg`` with that fold's branch
    checkpoint."""
    kind = "audio" if model_module is audio_net else "text"
    template = model_module.init(jax.random.PRNGKey(0), mcfg)
    apply_fn = jax.jit(lambda p, x: model_module.apply(p, mcfg, x))
    results = []
    for fold, ckpt in enumerate(ckpt_paths):
        _, _, te_d, te_n = folds.reg_fold_split(
            dep_idxs, non_idxs, fold, fold_cfg.reg_test_dep,
            fold_cfg.reg_test_non)
        te = np.concatenate([te_d, te_n]).astype(np.int64)
        params = _load(ckpt, kind, mcfg, template)
        pred = np.asarray(apply_fn(params, jnp.asarray(features[te]))).ravel()
        results.append({
            "fold": fold + 1,
            "mae": metrics.mean_absolute_error(targets[te], pred),
            "rmse": metrics.root_mean_squared_error(targets[te], pred),
        })
    return results, _mean(results, ("mae", "rmse"))


def check_audio_reg(features, targets, dep_idxs, non_idxs, ckpt_paths,
                    mcfg: C.RNNConfig = C.AUDIO_REG.model, **kw):
    return check_branch_reg(audio_net, mcfg, features, targets, dep_idxs,
                            non_idxs, ckpt_paths, **kw)


def check_text_reg(features, targets, dep_idxs, non_idxs, ckpt_paths,
                   mcfg: C.RNNConfig = C.TEXT_REG.model, **kw):
    return check_branch_reg(text_net, mcfg, features, targets, dep_idxs,
                            non_idxs, ckpt_paths, **kw)


def check_fuse_reg(audio_features, text_features, targets, dep_idxs,
                   non_idxs, ckpt_paths, fcfg: C.FusionConfig = C.FUSE_REG,
                   fold_cfg: C.FoldConfig = C.FoldConfig()):
    template = fusion.init(jax.random.PRNGKey(0), fcfg)

    @jax.jit
    def apply_fn(p, xa, xt):
        pred, _ = fusion.apply(p, fcfg, xa, xt, train=False)
        return pred

    results = []
    for fold, ckpt in enumerate(ckpt_paths):
        _, _, te_d, te_n = folds.reg_fold_split(
            dep_idxs, non_idxs, fold, fold_cfg.reg_test_dep,
            fold_cfg.reg_test_non)
        te = np.concatenate([te_d, te_n]).astype(np.int64)
        params = _load(ckpt, "fusion", fcfg, template)
        pred = np.asarray(apply_fn(params, jnp.asarray(audio_features[te]),
                                   jnp.asarray(text_features[te]))).ravel()
        results.append({
            "fold": fold + 1,
            "mae": metrics.mean_absolute_error(targets[te], pred),
            "rmse": metrics.root_mean_squared_error(targets[te], pred),
        })
    return results, _mean(results, ("mae", "rmse"))
