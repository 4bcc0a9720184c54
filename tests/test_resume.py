"""Chunked execution + resume must reproduce the single-shot fold run
bit-for-bit (carried PRNG stream, optimizer state, gated best)."""

import numpy as np
import jax
import pytest

from icassp2022_depression_tpu import config as C
from icassp2022_depression_tpu.data import folds
from icassp2022_depression_tpu.models import audio_net
from icassp2022_depression_tpu.train import trainers

CFG = C.replace(
    C.AUDIO_CLF,
    model=C.replace(C.AUDIO_CLF.model, embedding_size=16, hidden_dims=16),
    optimizer=C.replace(C.AUDIO_CLF.optimizer, learning_rate=5e-3),
    epochs=13,
)


def _data(seed=0):
    rng = np.random.default_rng(seed)
    n = 30
    targets = (rng.random(n) < 0.35).astype(np.int64)
    x = (np.where(targets[:, None, None] == 1, .8, -.8) +
         rng.standard_normal((n, 3, 16))).astype(np.float32)
    return x, targets


def test_chunked_equals_single_shot(tmp_path):
    x, y = _data()
    tf_idx = folds.generate_clf_folds(y, 3, seed=0)[:1]
    single = trainers.train_audio_clf(x, y, tf_idx, CFG, seed=3)[0]
    datas = trainers._clf_fold_datas([x], y, tf_idx, CFG.batch_size)
    chunked = trainers._run_folds(audio_net, CFG, datas, seed=3,
                                  chunk_epochs=5,
                                  resume_dir=tmp_path,
                                  task_name="audio_clf")[0]
    np.testing.assert_array_equal(single["logs"]["f1"], chunked["logs"]["f1"])
    np.testing.assert_array_equal(single["logs"]["loss"],
                                  chunked["logs"]["loss"])
    assert single["best"]["f1"] == chunked["best"]["f1"]
    assert single["best"]["epoch"] == chunked["best"]["epoch"]
    # resume bundle exists
    assert (tmp_path / "audio_clf_fold1.npz").exists()
    assert (tmp_path / "audio_clf_fold1_logs.npz").exists()


def test_resume_after_interruption(tmp_path):
    x, y = _data(1)
    tf_idx = folds.generate_clf_folds(y, 3, seed=1)[:1]
    datas = trainers._clf_fold_datas([x], y, tf_idx, CFG.batch_size)

    # run only the first 5 epochs (simulated interruption: total=5)
    cfg_partial = C.replace(CFG, epochs=6)
    trainers._run_folds(audio_net, cfg_partial, datas, seed=7,
                        chunk_epochs=5, resume_dir=tmp_path,
                        task_name="t")
    # "restart": full run resumes from the bundle and completes 12 epochs
    resumed = trainers._run_folds(audio_net, CFG, datas, seed=7,
                                  chunk_epochs=5, resume_dir=tmp_path,
                                  task_name="t")[0]
    # reference: uninterrupted full run
    full = trainers._run_folds(audio_net, CFG, datas, seed=7)[0]
    np.testing.assert_array_equal(full["logs"]["f1"], resumed["logs"]["f1"])
    assert full["best"]["f1"] == resumed["best"]["f1"]


def test_vmapped_chunked_equals_single_shot(tmp_path):
    """Scale-out recovery: the vmapped (all-folds-as-one-program) path
    chunks + resumes through one stacked-fold bundle, bit-exact vs the
    single-shot vmapped run."""
    x, y = _data(3)
    tf_idx = folds.generate_clf_folds(y, 3, seed=3)
    single = trainers.train_audio_clf(x, y, tf_idx, CFG, seed=5,
                                      vmap_folds=True)
    datas = trainers._clf_fold_datas([x], y, tf_idx, CFG.batch_size)
    chunked = trainers._run_folds(audio_net, CFG, datas, seed=5,
                                  chunk_epochs=5, resume_dir=tmp_path,
                                  task_name="a", vmap_folds=True)
    for s, c in zip(single, chunked):
        np.testing.assert_array_equal(s["logs"]["f1"], c["logs"]["f1"])
        np.testing.assert_array_equal(s["logs"]["loss"], c["logs"]["loss"])
        assert s["best"]["f1"] == c["best"]["f1"]
        assert s["best"]["epoch"] == c["best"]["epoch"]
    assert (tmp_path / "a_folds.npz").exists()
    assert (tmp_path / "a_folds_logs.npz").exists()


def test_vmapped_resume_after_interruption(tmp_path):
    """Kill-and-resume on the vmapped path: a truncated run leaves the
    stacked bundle; the restarted full run completes from it and matches
    the uninterrupted run bit-for-bit."""
    x, y = _data(4)
    tf_idx = folds.generate_clf_folds(y, 3, seed=4)
    datas = trainers._clf_fold_datas([x], y, tf_idx, CFG.batch_size)

    cfg_partial = C.replace(CFG, epochs=6)   # "killed" after 5 epochs
    trainers._run_folds(audio_net, cfg_partial, datas, seed=11,
                        chunk_epochs=5, resume_dir=tmp_path,
                        task_name="t", vmap_folds=True)
    resumed = trainers._run_folds(audio_net, CFG, datas, seed=11,
                                  chunk_epochs=5, resume_dir=tmp_path,
                                  task_name="t", vmap_folds=True)
    full = trainers._run_folds(audio_net, CFG, datas, seed=11,
                               vmap_folds=True)
    for f, r in zip(full, resumed):
        np.testing.assert_array_equal(f["logs"]["f1"], r["logs"]["f1"])
        assert f["best"]["f1"] == r["best"]["f1"]
        assert f["best"]["epoch"] == r["best"]["epoch"]


def test_fold_parallel_resume_after_interruption(tmp_path):
    """Same kill-and-resume, with the stacked fold axis sharded over the
    (virtual) fold mesh: the bundle round-trips through host npz and is
    re-sharded on restart."""
    x, y = _data(5)
    tf_idx = folds.generate_clf_folds(y, 3, seed=5)
    datas = trainers._clf_fold_datas([x], y, tf_idx, CFG.batch_size)

    cfg_partial = C.replace(CFG, epochs=6)
    trainers._run_folds(audio_net, cfg_partial, datas, seed=13,
                        chunk_epochs=5, resume_dir=tmp_path,
                        task_name="p", fold_parallel=True)
    resumed = trainers._run_folds(audio_net, CFG, datas, seed=13,
                                  chunk_epochs=5, resume_dir=tmp_path,
                                  task_name="p", fold_parallel=True)
    full = trainers._run_folds(audio_net, CFG, datas, seed=13,
                               fold_parallel=True)
    for f, r in zip(full, resumed):
        np.testing.assert_array_equal(f["logs"]["f1"], r["logs"]["f1"])
        assert f["best"]["f1"] == r["best"]["f1"]


def test_resume_truncates_overrun_logs_sidecar(tmp_path):
    """Crash consistency: the state bundle's epoch_done is the commit
    point — if a crash left the logs sidecar AHEAD of it (logs are written
    first), resume must truncate the overrun rows instead of duplicating
    epochs in the merged logs."""
    x, y = _data(6)
    tf_idx = folds.generate_clf_folds(y, 3, seed=6)[:1]
    datas = trainers._clf_fold_datas([x], y, tf_idx, CFG.batch_size)

    cfg_partial = C.replace(CFG, epochs=6)   # 5 epochs done, bundle at 5
    trainers._run_folds(audio_net, cfg_partial, datas, seed=17,
                        chunk_epochs=5, resume_dir=tmp_path, task_name="t")
    # simulate the crash window: logs sidecar ran ahead by 2 junk epochs
    logs_path = tmp_path / "t_fold1_logs.npz"
    overrun = {k: np.concatenate([v, np.full((2,) + v.shape[1:], 77.0,
                                             v.dtype)])
               for k, v in np.load(logs_path).items()}
    np.savez(logs_path, **overrun)

    resumed = trainers._run_folds(audio_net, CFG, datas, seed=17,
                                  chunk_epochs=5, resume_dir=tmp_path,
                                  task_name="t")[0]
    full = trainers._run_folds(audio_net, CFG, datas, seed=17)[0]
    assert len(resumed["logs"]["f1"]) == CFG.epochs - 1   # no duplicates
    np.testing.assert_array_equal(full["logs"]["f1"], resumed["logs"]["f1"])


def test_resume_noop_when_complete(tmp_path):
    x, y = _data(2)
    tf_idx = folds.generate_clf_folds(y, 3, seed=2)[:1]
    datas = trainers._clf_fold_datas([x], y, tf_idx, CFG.batch_size)
    first = trainers._run_folds(audio_net, CFG, datas, seed=9,
                                chunk_epochs=4, resume_dir=tmp_path,
                                task_name="t")[0]
    again = trainers._run_folds(audio_net, CFG, datas, seed=9,
                                chunk_epochs=4, resume_dir=tmp_path,
                                task_name="t")[0]
    np.testing.assert_array_equal(first["logs"]["f1"], again["logs"]["f1"])
    assert first["best"]["f1"] == again["best"]["f1"]
