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


def test_daic_text_modality_and_multimodal():
    """Response transcripts -> embeddings -> concat with audio features ->
    the masked-pooling trainer runs on the joint representation."""
    from icassp2022_depression_tpu.frontend import daic as daic_fe
    from icassp2022_depression_tpu.models import elmo

    transcript = [
        {"start_time": 0.0, "stop_time": 0.5, "speaker": "Ellie",
         "value": "how are you"},
        {"start_time": 0.6, "stop_time": 1.0, "speaker": "Participant",
         "value": "fine thanks"},
        {"start_time": 1.1, "stop_time": 1.4, "speaker": "Participant",
         "value": "really"},
        {"start_time": 2.0, "stop_time": 2.5, "speaker": "Ellie",
         "value": "how did you sleep"},
        {"start_time": 2.6, "stop_time": 3.0, "speaker": "Participant",
         "value": "scrubbed_entry"},
        {"start_time": 3.1, "stop_time": 3.5, "speaker": "Participant",
         "value": "not great"},
        {"start_time": 4.0, "stop_time": 4.2, "speaker": "Ellie",
         "value": "i think i have asked everything for now"},
    ]
    wave = np.arange(16000 * 5, dtype=np.float64)
    signals, texts = daic_fe.segment_responses(
        transcript, wave, 16000, ["how are you", "how did you sleep"],
        with_text=True)
    assert texts == ["fine thanks really", "not great"]
    assert len(signals) == 2

    # multimodal concat feeds the trainer
    rng = np.random.default_rng(1)
    audio = [rng.standard_normal((2, 1, 8)).astype(np.float32)]
    cfg = elmo.ElmoConfig(vocab_size=64, embed_dim=8, hidden=4, layers=1,
                          output_dim=8)
    params = elmo.init(jax.random.PRNGKey(0), cfg)
    from icassp2022_depression_tpu.frontend import text as text_fe
    text = [text_fe.embed_sentences(params,
                                    [text_fe.tokenize(t) for t in texts],
                                    cfg)]
    mm = daic.concat_multimodal(audio, text)
    assert mm[0].shape == (2, 1, 16)


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
