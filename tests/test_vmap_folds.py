"""Cross-fold vmap training must reproduce the serial per-fold results."""

import numpy as np
import pytest

from icassp2022_depression_tpu import config as C
from icassp2022_depression_tpu.data import folds
from icassp2022_depression_tpu.models import audio_net
from icassp2022_depression_tpu.train import trainers

CFG = C.replace(
    C.AUDIO_CLF,
    model=C.replace(C.AUDIO_CLF.model, embedding_size=16, hidden_dims=16),
    optimizer=C.replace(C.AUDIO_CLF.optimizer, learning_rate=5e-3),
    epochs=12,
)


def test_vmapped_folds_match_serial():
    rng = np.random.default_rng(0)
    n = 30
    y = (rng.random(n) < 0.35).astype(np.int64)
    x = (np.where(y[:, None, None] == 1, .8, -.8) +
         rng.standard_normal((n, 3, 16))).astype(np.float32)
    tf_idx = folds.generate_clf_folds(y, 3, seed=0)
    datas = trainers._clf_fold_datas([x], y, tf_idx, CFG.batch_size)

    serial = trainers._run_folds(audio_net, CFG, datas, seed=5)
    vmapped = trainers._run_folds(audio_net, CFG, datas, seed=5,
                                  vmap_folds=True)
    assert len(serial) == len(vmapped) == 3
    for s, v in zip(serial, vmapped):
        np.testing.assert_allclose(v["logs"]["loss"], s["logs"]["loss"],
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(v["logs"]["f1"], s["logs"]["f1"],
                                   atol=1e-5)
        assert v["best"]["f1"] == pytest.approx(s["best"]["f1"], abs=1e-5)
        assert v["best"]["epoch"] == s["best"]["epoch"]
