"""DAIC-WOZ downstream training over ragged response sets.

The reference stops at DAIC feature *extraction* (per-question wav2vlad
features + PHQ8 labels, ``DAICFeatureExtarction/feature_extraction.py``);
training on them is left implied for cross-corpus work.  This module closes
the loop TPU-natively: participants have a *variable* number of responses,
so the features are padded to a common response count with a validity mask
(:func:`..frontend.daic.pad_responses`) and the audio GRU model pools over
valid responses only (``time_mask`` — no recompilation per participant,
SURVEY.md §3.5's ragged-batching requirement).

Uses the AVEC2017 train/dev split (not 3-fold CV: DAIC ships predefined
splits), the same gated best-checkpoint selection as the EATD trainers.
"""

from __future__ import annotations

from pathlib import Path
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from icassp2022_depression_tpu import config as C
from icassp2022_depression_tpu.frontend.daic import (
    FlatResponses,
    pad_responses,
)
from icassp2022_depression_tpu.models import audio_net
from icassp2022_depression_tpu.ops.nn import (
    l1_loss,
    masked_cross_entropy_on_probs,
)
from icassp2022_depression_tpu.train import checkpoints, loop, optim

#: capability-extension preset (no reference counterpart): the EATD audio
#: classifier architecture over response sequences.
DAIC_CLF = C.TrainerConfig(
    model=C.RNNConfig(num_classes=2, dropout=0.5, rnn_layers=2,
                      embedding_size=256, hidden_dims=256,
                      bidirectional=False, cell="gru", input_layernorm=True,
                      pooling="mean", head_activation="softmax",
                      init="torch", head_input_dropout=True),
    optimizer=C.OptimizerConfig(name="adamw", learning_rate=1e-4),
    gate=C.GateConfig(f1_floor=0.0, train_acc_frac=0.0),
    batch_size=16, epochs=101, loss="ce", track="classification",
)

DAIC_REG = C.replace(
    DAIC_CLF,
    model=C.replace(DAIC_CLF.model, num_classes=1, input_layernorm=False,
                    pooling="sum", head_activation="relu"),
    optimizer=C.OptimizerConfig(name="adam", learning_rate=1e-4,
                                weight_decay=0.0),
    gate=C.GateConfig(mae_ceiling=100.0, train_mae_ceiling=1e9),
    loss="l1", track="regression",
)


def _fns(tcfg: C.TrainerConfig):
    mcfg = tcfg.model

    def train_loss(params, xs, y, mask, key):
        x, time_mask = xs
        pred = audio_net.apply(params, mcfg, x, train=True, key=key,
                               time_mask=time_mask)
        if tcfg.track == "classification":
            loss = masked_cross_entropy_on_probs(
                pred, y.astype(jnp.int32), mask, mcfg.num_classes)
        else:
            loss = l1_loss(pred.squeeze(-1), y.astype(jnp.float32), mask)
        return loss, pred

    def eval_fn(params, xs):
        x, time_mask = xs
        return audio_net.apply(params, mcfg, x, train=False,
                               time_mask=time_mask)

    return train_loss, eval_fn


def concat_multimodal(audio_features: List[np.ndarray],
                      text_features: List[np.ndarray]) -> List[np.ndarray]:
    """Per-participant [n_i, 1, Da] audio + [n_i, Dt] text response features
    -> [n_i, 1, Da+Dt] multimodal blocks for :func:`train_daic` (set the
    trainer's ``embedding_size`` to Da+Dt).  Completes the DAIC cross-corpus
    multimodal path (the reference extracts audio only)."""
    out = []
    for idx, (a, t) in enumerate(zip(audio_features, text_features)):
        a2 = a[:, 0, :] if a.ndim == 3 else a
        assert len(a2) == len(t), (
            f"participant {idx}: {len(a2)} audio vs {len(t)} text responses "
            "— modalities come from different segmentations (re-extract "
            "with extract_participant_multimodal)")
        out.append(np.concatenate([a2, t], axis=-1)[:, None, :]
                   .astype(np.float32))
    return out


def check_daic(features: List[np.ndarray], labels, ckpt_path,
               tcfg: C.TrainerConfig = DAIC_CLF):
    """Model-checking for DAIC checkpoints (the L5 counterpart the EATD
    tracks get from ``eval/checking.py``): recompute the eval-split
    metrics of a gated-best ``train_daic`` checkpoint.

    Returns the metric dict (P/R/F1/accuracy for clf; MAE/RMSE for reg)
    — reproducing the training-time best exactly when fed the same split
    (cf. the four reference ``*ModelChecking.py`` scripts)."""
    from icassp2022_depression_tpu.eval import metrics

    max_r = max((f.shape[0] for f in features), default=1)
    x, mask = pad_responses(features, max_r)
    y = np.asarray(labels)
    from icassp2022_depression_tpu.models import porting

    template = audio_net.init(jax.random.PRNGKey(0), tcfg.model)
    params = porting.load_params(ckpt_path, "audio", tcfg.model, template)
    _, eval_fn = _fns(tcfg)
    pred = np.asarray(eval_fn(params, (jnp.asarray(x), jnp.asarray(mask))))
    if tcfg.track == "classification":
        cm = metrics.standard_confusion_matrix(y, np.argmax(pred, axis=-1))
        out = metrics.classification_metrics(cm)
        out["confusion_matrix"] = cm.tolist()
        return out
    pred = pred.ravel()
    return {"mae": metrics.mean_absolute_error(y, pred),
            "rmse": metrics.root_mean_squared_error(y, pred)}


def pad_flat_responses_device(resp: FlatResponses, max_responses: int):
    """Device twin of :func:`..frontend.daic.pad_responses`: flat [T, D]
    DEVICE feature rows + per-participant counts -> dense [N, R, D] built
    by an on-device index gather (a zeros sentinel row fills padding
    slots — the same pattern serving's ragged fast path uses) + host mask
    [N, R].  Bit-identical to the host materialisation; features never
    cross the relay."""
    counts = list(resp.counts)
    n, m = len(counts), int(sum(counts))
    idx = np.full((n, max_responses), m, np.int64)       # m -> zeros row
    mask = np.zeros((n, max_responses), np.float32)
    pos = 0
    for i, c in enumerate(counts):
        r = min(c, max_responses)
        idx[i, :r] = np.arange(pos, pos + r)
        mask[i, :r] = 1.0
        pos += c
    flat = jnp.asarray(resp.flat)
    x = jnp.concatenate(
        [flat, jnp.zeros((1, flat.shape[-1]), flat.dtype)])[jnp.asarray(idx)]
    return x, mask


def _max_responses(features) -> int:
    if isinstance(features, FlatResponses):
        return max(features.counts, default=1)
    return max((f.shape[0] for f in features), default=1)


def _resp_matrix(features, max_r: int):
    if isinstance(features, FlatResponses):
        return pad_flat_responses_device(features, max_r)
    return pad_responses(features, max_r)


def train_daic(train_features, train_labels,
               test_features, test_labels,
               tcfg: C.TrainerConfig = DAIC_CLF,
               out_dir: Optional[Path] = None, seed: int = 0,
               meta_extras: Optional[dict] = None):
    """Train on the AVEC2017 train split, gate on the dev split.

    ``*_features``: ragged per-participant ``[n_i, 1, D]`` blocks from
    :func:`..frontend.daic.extract_split`, or a device-resident
    :class:`..frontend.daic.FlatResponses` from
    :func:`..frontend.daic.extract_split_device` (the fused
    extract->train pipeline: the padded ragged batch is then built by an
    on-device gather and features never return to the host; identical
    results either way — ``tests/test_daic_train.py``).
    """
    max_r = max(_max_responses(train_features),
                _max_responses(test_features))
    xtr, mtr = _resp_matrix(train_features, max_r)
    xte, mte = _resp_matrix(test_features, max_r)
    ytr = np.asarray(train_labels)
    yte = np.asarray(test_labels)

    params = audio_net.init(jax.random.PRNGKey(seed), tcfg.model)
    # same dead-block decay exemption as the EATD audio trainers (the
    # attention layer receives no gradients)
    optimizer = optim.build(tcfg.optimizer, params, dead_paths=("attn",))
    opt_state = optimizer.init(params)
    train_loss, eval_fn = _fns(tcfg)
    run = loop.make_fold_runner(train_loss, eval_fn, optimizer, tcfg.track,
                                tcfg.gate, tcfg.epochs)
    data = loop.make_fold_data([xtr, mtr], ytr, [xte, mte], yte,
                               tcfg.batch_size)
    _, _, _, best, logs = run(params, opt_state, data,
                              jax.random.fold_in(jax.random.PRNGKey(seed), 1))
    best = {k: (float(v) if k != "params" else v) for k, v in best.items()}
    result = {"best": best, "logs": jax.device_get(logs)}
    if out_dir is not None and best["epoch"] >= 0:
        metric = best.get("f1", best.get("mae"))
        # "classification"/"regression" -> the documented daic_clf/daic_reg
        # prefixes (track[:3] would give the nonsensical "daic_cla")
        kind = "clf" if tcfg.track == "classification" else "reg"
        name = f"daic_{kind}_{metric:.2f}"
        # embedding_size lets DaicPredictor.from_checkpoint rebuild the
        # exact model config (and detect --multimodal checkpoints, whose
        # input is audio_dim + text_dim)
        meta = {k: v for k, v in best.items() if k != "params"}
        meta["embedding_size"] = tcfg.model.embedding_size
        if meta_extras:
            meta.update(meta_extras)
        checkpoints.save(Path(out_dir) / name, best["params"], meta)
    return result
