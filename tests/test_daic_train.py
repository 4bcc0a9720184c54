"""DAIC downstream training over ragged responses (CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from icassp2022_depression_tpu import config as C
from icassp2022_depression_tpu.models import audio_net
from icassp2022_depression_tpu.train import daic


def _ragged(n, rng, dep_frac=0.4, d=16):
    feats, labels = [], []
    for _ in range(n):
        dep = rng.random() < dep_frac
        r = int(rng.integers(2, 7))
        base = 0.8 if dep else -0.8
        feats.append((base + rng.standard_normal((r, 1, d))).astype(np.float32))
        labels.append(int(dep))
    return feats, labels


def test_daic_clf_trains_on_ragged():
    rng = np.random.default_rng(0)
    tr_f, tr_y = _ragged(24, rng)
    te_f, te_y = _ragged(10, rng)
    tcfg = C.replace(
        daic.DAIC_CLF,
        model=C.replace(daic.DAIC_CLF.model, embedding_size=16,
                        hidden_dims=16),
        optimizer=C.replace(daic.DAIC_CLF.optimizer, learning_rate=3e-2),
        epochs=31, batch_size=8)
    result = daic.train_daic(tr_f, tr_y, te_f, te_y, tcfg, seed=0)
    assert result["logs"]["f1"].shape == (30,)
    assert result["best"]["f1"] > 0.5  # separable synthetic data


def test_masked_pooling_ignores_padding():
    cfg = C.replace(daic.DAIC_CLF.model, embedding_size=8, hidden_dims=8)
    params = audio_net.init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(1)
    x_short = rng.standard_normal((1, 3, 8)).astype(np.float32)
    x_padded = np.concatenate(
        [x_short, 99.0 * np.ones((1, 4, 8), np.float32)], axis=1)
    mask = np.array([[1, 1, 1, 0, 0, 0, 0]], np.float32)
    a = audio_net.apply(params, cfg, jnp.asarray(x_short))
    b = audio_net.apply(params, cfg, jnp.asarray(x_padded),
                        time_mask=jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
