import numpy as np
import jax

from icassp2022_depression_tpu import config as C
from icassp2022_depression_tpu.eval import cross_corpus
from icassp2022_depression_tpu.models import audio_net

CFG = C.replace(C.AUDIO_CLF.model, embedding_size=8, hidden_dims=8)


def test_windows_of_3():
    r = np.arange(7 * 4, dtype=np.float32).reshape(7, 4)
    w = cross_corpus.windows_of_3(r)
    assert w.shape == (3, 3, 4)
    np.testing.assert_array_equal(w[0], r[:3])
    # tail padded by repeating the last response
    np.testing.assert_array_equal(w[2][1], r[6])
    np.testing.assert_array_equal(w[2][2], r[6])
    # ragged-block layout [n, 1, D] accepted
    w2 = cross_corpus.windows_of_3(r[:, None, :])
    np.testing.assert_array_equal(w, w2)
    assert cross_corpus.windows_of_3(np.zeros((0, 4))).shape == (0, 3, 4)


def test_evaluate_clf_and_reg():
    params = audio_net.init(jax.random.PRNGKey(0), CFG)
    rng = np.random.default_rng(0)
    feats = [rng.standard_normal((int(rng.integers(1, 9)), 1, 8)).astype(np.float32)
             for _ in range(6)]
    labels = [0, 1, 0, 1, 1, 0]
    m = cross_corpus.evaluate_clf(params, feats, labels, CFG)
    assert set(m) >= {"f1", "precision", "recall", "accuracy", "predictions"}
    assert len(m["predictions"]) == 6

    reg_cfg = C.replace(C.AUDIO_REG.model, embedding_size=8, hidden_dims=8)
    reg_params = audio_net.init(jax.random.PRNGKey(1), reg_cfg)
    scores = [3.0, 15.0, 5.0, 20.0, 12.0, 1.0]
    r = cross_corpus.evaluate_reg(reg_params, feats, scores, reg_cfg)
    assert np.isfinite(r["mae"]) and np.isfinite(r["mae_calibrated"])
    assert r["mae_calibrated"] <= r["mae"] + 1e-6
