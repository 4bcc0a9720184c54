"""Fusion trainer end-to-end on synthetic bimodal data (CPU)."""

import numpy as np
import jax
import pytest

from icassp2022_depression_tpu import config as C
from icassp2022_depression_tpu.data import folds
from icassp2022_depression_tpu.models import audio_net, text_net
from icassp2022_depression_tpu.train import trainers

FCFG = C.FusionConfig(audio_embed_size=16, text_embed_size=24,
                      audio_hidden_dims=8, text_hidden_dims=8,
                      rnn_layers=2, dropout=0.3, num_classes=2)
TCFG = C.replace(
    C.FUSE_CLF_TRAINER,
    optimizer=C.replace(C.FUSE_CLF_TRAINER.optimizer, learning_rate=5e-2),
    epochs=12,
)
AUDIO_CFG = C.replace(C.AUDIO_CLF.model, embedding_size=16, hidden_dims=8)
TEXT_CFG = C.replace(C.TEXT_CLF.model, embedding_size=24, hidden_dims=8)


def test_fuse_clf_end_to_end(tmp_path):
    rng = np.random.default_rng(0)
    n = 24
    targets = (rng.random(n) < 0.4).astype(np.int64)
    sign = np.where(targets[:, None, None] == 1, 1.0, -1.0)
    audio = (0.7 * sign + rng.standard_normal((n, 3, 16))).astype(np.float32)
    text = (0.7 * sign + rng.standard_normal((n, 3, 24))).astype(np.float32)
    train_folds = folds.generate_clf_folds(targets, 3, seed=0)

    branch_params = []
    for fold in range(3):
        ka = jax.random.fold_in(jax.random.PRNGKey(10), fold)
        kt = jax.random.fold_in(jax.random.PRNGKey(20), fold)
        branch_params.append((text_net.init(kt, TEXT_CFG),
                              audio_net.init(ka, AUDIO_CFG)))

    results = trainers.train_fuse_clf(audio, text, targets, train_folds,
                                      branch_params, FCFG, TCFG,
                                      out_dir=tmp_path, seed=0)
    assert len(results) == 3
    for r in results:
        assert np.isfinite(r["logs"]["f1"]).all()
        assert r["logs"]["loss"].shape == (TCFG.epochs - 1,)
    # gated checkpoints written with reference-style names when gate fired
    fired = [r for r in results if r["best"]["epoch"] >= 0]
    for r in fired:
        name = f"fuse_{r['best']['f1']:.2f}_{r['fold']}"
        assert (tmp_path / f"{name}.npz").exists()


def test_clf_fusion_carries_state_across_folds():
    """Reference clf fusion keeps ONE model+optimizer across folds
    (fuse_net_whole.py:413-416): fold 2 must start from fold 1's trained
    fc_final, not a fresh init — verified by comparing against an
    independent-folds run."""
    rng = np.random.default_rng(3)
    n = 18
    targets = (rng.random(n) < 0.4).astype(np.int64)
    sign = np.where(targets[:, None, None] == 1, 1.0, -1.0)
    audio = (0.7 * sign + rng.standard_normal((n, 3, 16))).astype(np.float32)
    text = (0.7 * sign + rng.standard_normal((n, 3, 24))).astype(np.float32)
    train_folds = folds.generate_clf_folds(targets, 3, seed=3)
    branch_params = [(text_net.init(jax.random.fold_in(jax.random.PRNGKey(20), f), TEXT_CFG),
                      audio_net.init(jax.random.fold_in(jax.random.PRNGKey(10), f), AUDIO_CFG))
                     for f in range(3)]
    results = trainers.train_fuse_clf(audio, text, targets, train_folds,
                                      branch_params, FCFG, TCFG, seed=0)
    solo = trainers.train_fuse_clf(audio, text, targets, train_folds[2:],
                                   branch_params[2:], FCFG, TCFG, seed=0)
    # fold 3 inside the 3-fold run starts from folds 1-2's carried state, so
    # its trajectory must differ from training fold 3 in isolation
    assert not np.allclose(results[2]["logs"]["loss"], solo[0]["logs"]["loss"])


def test_fuse_reg_end_to_end():
    rng = np.random.default_rng(1)
    n = 30
    targets = rng.uniform(30, 70, n).astype(np.float32)
    targets[:8] = rng.uniform(55, 70, 8)   # depressed pool for the split
    targets[8:] = rng.uniform(30, 50, n - 8)
    audio = rng.standard_normal((n, 3, 16)).astype(np.float32)
    text = rng.standard_normal((n, 3, 24)).astype(np.float32)
    dep, non = folds.generate_reg_shuffles(targets, seed=0)

    fcfg = C.replace(C.FUSE_REG, audio_embed_size=16, text_embed_size=24,
                     audio_hidden_dims=8, text_hidden_dims=8)
    tcfg = C.replace(
        C.FUSE_REG_TRAINER, epochs=8,
        optimizer=C.replace(C.FUSE_REG_TRAINER.optimizer, learning_rate=1e-2))

    audio_reg_cfg = C.replace(C.AUDIO_REG.model, embedding_size=16,
                              hidden_dims=8)
    text_reg_cfg = C.replace(C.TEXT_REG.model, embedding_size=24,
                             hidden_dims=8)
    branch_params = []
    for fold in range(3):
        branch_params.append((
            text_net.init(jax.random.fold_in(jax.random.PRNGKey(30), fold),
                          text_reg_cfg),
            audio_net.init(jax.random.fold_in(jax.random.PRNGKey(40), fold),
                           audio_reg_cfg)))

    import icassp2022_depression_tpu.train.trainers as T
    fold_cfg = C.FoldConfig(reg_test_dep=2, reg_test_non=7,
                            reg_augment_first_n=3)
    datas = T._reg_fold_datas([audio, text], targets, dep, non,
                              tcfg.batch_size, fold_cfg)
    results = T._run_fusion_folds(fcfg, tcfg, datas, branch_params, 0,
                                  "regression")
    for r in results:
        assert np.isfinite(r["logs"]["mae"]).all()
        assert np.isfinite(r["logs"]["train_mae"]).all()
