"""Device-resident training data path (the fused extract->train pipeline).

When the pristine [N, 3, D] feature arrays are already DEVICE arrays
(``frontend.audio.extract_batch(device=True)`` output), the trainers
materialise every fold's augmented splits by ON-DEVICE gathers driven by
host-side index plans (``data.augment.SplitPlan``) instead of host NumPy
materialisation + re-upload.  These tests pin:

* the device-built ``FoldData`` is BIT-IDENTICAL to the host-built one
  (clf and reg recipes, unimodal and lockstep-fusion arrays);
* the public trainers produce identical results either way.
"""

import jax
import jax.numpy as jnp
import numpy as np

from icassp2022_depression_tpu import config as C
from icassp2022_depression_tpu.data import folds
from icassp2022_depression_tpu.train import trainers

CFG = C.replace(
    C.AUDIO_CLF,
    model=C.replace(C.AUDIO_CLF.model, embedding_size=16, hidden_dims=16),
    optimizer=C.replace(C.AUDIO_CLF.optimizer, learning_rate=5e-3),
    epochs=8,
)


def _clf_corpus(seed=0, n=30, dim=16):
    rng = np.random.default_rng(seed)
    y = (rng.random(n) < 0.35).astype(np.int64)
    x = (np.where(y[:, None, None] == 1, .8, -.8) +
         rng.standard_normal((n, 3, dim))).astype(np.float32)
    return x, y


def _assert_fold_datas_equal(host_datas, dev_datas):
    assert len(host_datas) == len(dev_datas)
    for h, d in zip(host_datas, dev_datas):
        for name, hv, dv in zip(h._fields, h, d):
            hv = jax.tree_util.tree_leaves(hv)
            dv = jax.tree_util.tree_leaves(dv)
            for a, b in zip(hv, dv):
                np.testing.assert_array_equal(
                    np.asarray(a), np.asarray(b),
                    err_msg=f"FoldData field {name} differs")
                assert a.dtype == b.dtype, name


def test_clf_fold_datas_device_path_bit_identical():
    x, y = _clf_corpus()
    tf_idx = folds.generate_clf_folds(y, 3, seed=0)
    host = trainers._clf_fold_datas([x], y, tf_idx, CFG.batch_size)
    dev = trainers._clf_fold_datas([jnp.asarray(x)], y, tf_idx,
                                   CFG.batch_size)
    _assert_fold_datas_equal(host, dev)


def test_clf_fold_datas_device_path_fusion_lockstep():
    x, y = _clf_corpus(seed=1)
    rng = np.random.default_rng(2)
    xt = rng.standard_normal((len(y), 3, 24)).astype(np.float32)
    tf_idx = folds.generate_clf_folds(y, 3, seed=0)
    host = trainers._clf_fold_datas([x, xt], y, tf_idx, 2)
    dev = trainers._clf_fold_datas([jnp.asarray(x), jnp.asarray(xt)], y,
                                   tf_idx, 2)
    _assert_fold_datas_equal(host, dev)


def test_reg_fold_datas_device_path_bit_identical():
    rng = np.random.default_rng(3)
    n = 40
    scores = (40.0 + 20.0 * (rng.random(n) < 0.3)
              + rng.standard_normal(n)).astype(np.float32)
    x = rng.standard_normal((n, 3, 16)).astype(np.float32)
    dep, non = folds.generate_reg_shuffles(scores, seed=0)
    fc = C.replace(C.FoldConfig(), reg_test_dep=3, reg_test_non=8,
                   reg_augment_first_n=4)
    host = trainers._reg_fold_datas([x], scores, dep, non, 2, fc)
    dev = trainers._reg_fold_datas([jnp.asarray(x)], scores, dep, non, 2,
                                   fc)
    _assert_fold_datas_equal(host, dev)


def test_reg_fold_datas_device_path_fusion_lockstep():
    """Regression recipe with TWO lockstep arrays (the pipeline --corpus
    reg-fusion path: device audio + host text) — device-built FoldData
    must equal the host-built one bit-for-bit."""
    rng = np.random.default_rng(6)
    n = 40
    scores = (40.0 + 20.0 * (rng.random(n) < 0.3)
              + rng.standard_normal(n)).astype(np.float32)
    x = rng.standard_normal((n, 3, 16)).astype(np.float32)
    xt = rng.standard_normal((n, 3, 24)).astype(np.float32)
    dep, non = folds.generate_reg_shuffles(scores, seed=0)
    fc = C.replace(C.FoldConfig(), reg_test_dep=3, reg_test_non=8,
                   reg_augment_first_n=4)
    host = trainers._reg_fold_datas([x, xt], scores, dep, non, 2, fc)
    dev = trainers._reg_fold_datas([jnp.asarray(x), xt], scores, dep, non,
                                   2, fc)
    _assert_fold_datas_equal(host, dev)


def test_train_audio_clf_device_features_match_host():
    """The public trainer run end-to-end on device-resident features must
    reproduce the host-features run exactly (same compiled program, same
    inputs bit-for-bit)."""
    x, y = _clf_corpus(seed=4)
    tf_idx = folds.generate_clf_folds(y, 3, seed=0)
    host = trainers.train_audio_clf(x, y, tf_idx, CFG, seed=7)
    dev = trainers.train_audio_clf(jnp.asarray(x), y, tf_idx, CFG, seed=7)
    for h, d in zip(host, dev):
        np.testing.assert_array_equal(h["logs"]["loss"], d["logs"]["loss"])
        np.testing.assert_array_equal(h["logs"]["f1"], d["logs"]["f1"])
        assert h["best"]["f1"] == d["best"]["f1"]
        assert h["best"]["epoch"] == d["best"]["epoch"]


def test_device_features_compose_with_vmap_folds():
    """Fused-pipeline fold data (on-device gathers) feeding the VMAPPED
    all-folds program must be bit-identical to the HOST-materialised data
    through the same vmapped program — pins that ``loop.stack_fold_data``
    composes with device-built FoldData.  (vmapped-vs-serial differs by
    f32 reduction order by design — ``tests/test_vmap_folds.py`` covers
    that with tolerances.)"""
    x, y = _clf_corpus(seed=5)
    tf_idx = folds.generate_clf_folds(y, 3, seed=0)
    host = trainers.train_audio_clf(x, y, tf_idx, CFG, seed=3,
                                    vmap_folds=True)
    dev = trainers.train_audio_clf(jnp.asarray(x), y, tf_idx, CFG, seed=3,
                                   vmap_folds=True)
    for h, d in zip(host, dev):
        np.testing.assert_array_equal(h["logs"]["loss"], d["logs"]["loss"])
        assert h["best"]["f1"] == d["best"]["f1"]
        assert h["best"]["epoch"] == d["best"]["epoch"]
