"""Serving API: end-to-end raw-input prediction for every task."""

import numpy as np
import jax
import pytest

from icassp2022_depression_tpu import config as C, serve
from icassp2022_depression_tpu.models import audio_net, elmo, fusion, text_net
from icassp2022_depression_tpu.train import checkpoints


def _speaker(rng, seconds=0.3, sr=16000):
    wavs = [np.round(rng.standard_normal(int(sr * seconds)) * 2000)
            for _ in range(3)]
    texts = ["我 今天 很 好", "还 可以", "有点 累"]
    return wavs, [sr] * 3, texts


def test_audio_clf_predictor_end_to_end():
    params = audio_net.init(jax.random.PRNGKey(0), C.AUDIO_CLF.model)
    p = serve.Predictor(params, "audio_clf")
    rng = np.random.default_rng(0)
    wavs, srs, _ = _speaker(rng)
    r = p.predict_speaker(waveforms=wavs, sample_rates=srs)
    assert set(r) == {"label", "depressed", "probs"}
    assert r["label"] in (0, 1) and len(r["probs"]) == 2
    assert abs(sum(r["probs"]) - 1.0) < 1e-5


def test_fusion_predictor_batch_and_checkpoint_roundtrip(tmp_path):
    params = fusion.init(jax.random.PRNGKey(1), C.FUSE_CLF)
    path = tmp_path / "fuse_0.70_1"
    checkpoints.save(path, params)
    p = serve.Predictor.from_checkpoint(path, "fuse_clf")
    rng = np.random.default_rng(1)
    speakers = [_speaker(rng) for _ in range(3)]
    results = p.predict_batch(
        waveforms_per_speaker=[s[0] for s in speakers],
        sample_rates=[s[1] for s in speakers],
        texts_per_speaker=[s[2] for s in speakers])
    assert len(results) == 3
    for r in results:
        assert r["label"] in (0, 1)


def test_reg_predictor_scores():
    params = audio_net.init(jax.random.PRNGKey(2), C.AUDIO_REG.model)
    p = serve.Predictor(params, "audio_reg")
    rng = np.random.default_rng(2)
    wavs, srs, _ = _speaker(rng)
    r = p.predict_speaker(waveforms=wavs, sample_rates=srs)
    assert "sds_score" in r and r["sds_score"] >= 0.0


def test_text_predictor():
    params = text_net.init(jax.random.PRNGKey(3), C.TEXT_CLF.model)
    p = serve.Predictor(params, "text_clf")
    rng = np.random.default_rng(3)
    _, _, texts = _speaker(rng)
    r = p.predict_speaker(texts=texts)
    assert r["label"] in (0, 1)


def test_serving_features_reproduce_training_extraction(tmp_path):
    """With the speaker's corpus ordinal base, serving features must equal
    the training-time extract_eatd features; without it they are
    batch-position independent."""
    from icassp2022_depression_tpu.data import eatd
    from icassp2022_depression_tpu.frontend import audio as afe

    eatd.make_synthetic_corpus(tmp_path, n_data=3, n_validation=0,
                               seconds=0.25, seed=0)
    train_feats, _, _, _ = afe.extract_eatd(tmp_path, C.FrontendConfig())
    params = audio_net.init(jax.random.PRNGKey(0), C.AUDIO_CLF.model)
    p = serve.Predictor(params, "audio_clf")
    sp = eatd.load_speaker(tmp_path, "Data", 2, read_text=False)
    # corpus position of Data/2 is index 1 -> ordinal base 3
    f = p.audio_features([sp.waveforms], [sp.sample_rates],
                         ordinal_bases=[3])
    np.testing.assert_allclose(f[0], train_feats[1, :, 0, :], atol=1e-5)
    # default ordinals: same speaker gets identical features at any batch
    # position
    other = eatd.load_speaker(tmp_path, "Data", 1, read_text=False)
    alone = p.audio_features([sp.waveforms], [sp.sample_rates])
    batched = p.audio_features([other.waveforms, sp.waveforms],
                               [other.sample_rates, sp.sample_rates])
    np.testing.assert_allclose(batched[1], alone[0], atol=1e-6)


def test_ported_torch_model_serves():
    import torch
    import torch.nn as tnn
    torch.manual_seed(0)

    class M(tnn.Module):
        def __init__(self):
            super().__init__()
            self.attention_layer = tnn.Sequential(tnn.Linear(256, 256),
                                                  tnn.ReLU(inplace=True))
            self.lstm_net_audio = tnn.GRU(256, 256, num_layers=2,
                                          batch_first=True)
            self.ln = tnn.LayerNorm(256)
            self.fc_audio = tnn.Sequential(
                tnn.Dropout(0.5), tnn.Linear(256, 256), tnn.ReLU(),
                tnn.Dropout(0.5), tnn.Linear(256, 2), tnn.Softmax(dim=1))

    sd = {k: v.detach().numpy() for k, v in M().state_dict().items()}
    p = serve.Predictor.from_torch_state_dict(sd, "audio_clf")
    rng = np.random.default_rng(4)
    wavs, srs, _ = _speaker(rng)
    r = p.predict_speaker(waveforms=wavs, sample_rates=srs)
    assert r["label"] in (0, 1)
