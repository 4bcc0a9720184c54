"""Porting torch state dicts: a reference-architecture torch model's
forward must match our model under the ported params."""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn as tnn

from icassp2022_depression_tpu import config as C
from icassp2022_depression_tpu.models import audio_net, porting, text_net


class _TorchAudioClf(tnn.Module):
    """Reference AudioBiLSTM layout (audio_gru_whole.py:24-108 key names)."""

    def __init__(self, d=32, h=16):
        super().__init__()
        self.attention_layer = tnn.Sequential(tnn.Linear(h, h),
                                              tnn.ReLU(inplace=True))
        self.lstm_net_audio = tnn.GRU(d, h, num_layers=2, batch_first=True)
        self.ln = tnn.LayerNorm(d)
        self.fc_audio = tnn.Sequential(
            tnn.Dropout(0.5), tnn.Linear(h, h), tnn.ReLU(),
            tnn.Dropout(0.5), tnn.Linear(h, 2), tnn.Softmax(dim=1))

    def forward(self, x):
        x = self.ln(x)
        x, _ = self.lstm_net_audio(x)
        return self.fc_audio(x.mean(dim=1))


class _TorchTextClf(tnn.Module):
    """Reference TextBiLSTM layout (text_bilstm_whole.py key names)."""

    def __init__(self, d=24, h=8):
        super().__init__()
        self.attention_layer = tnn.Sequential(tnn.Linear(h, h),
                                              tnn.ReLU(inplace=True))
        self.lstm_net = tnn.LSTM(d, h, num_layers=2, bidirectional=True)
        self.fc_out = tnn.Sequential(
            tnn.Linear(h, h), tnn.ReLU(), tnn.Dropout(0.5),
            tnn.Linear(h, 2), tnn.Softmax(dim=1))
        self.ln1 = tnn.LayerNorm(d)
        self.ln2 = tnn.LayerNorm(h)

    def forward(self, x):
        xt = x.permute(1, 0, 2)
        out, (h_n, _) = self.lstm_net(xt)
        out = out.permute(1, 0, 2)
        h_n = h_n.permute(1, 0, 2)
        half = out.shape[-1] // 2
        h = out[..., :half] + out[..., half:]
        q = h_n.sum(dim=1, keepdim=True)
        aw = torch.relu(self.attention_layer[0](q))
        scores = torch.softmax(torch.bmm(aw, torch.tanh(h).transpose(1, 2)),
                               dim=-1)
        ctx = torch.bmm(scores, h).squeeze(1)
        return self.fc_out(ctx)


def _sd(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


def test_audio_clf_port_matches_torch_forward():
    torch.manual_seed(0)
    m = _TorchAudioClf()
    cfg = C.replace(C.AUDIO_CLF.model, embedding_size=32, hidden_dims=16)
    params = porting.audio_net_from_state_dict(_sd(m), cfg)
    x = np.random.default_rng(0).standard_normal((5, 3, 32)).astype(np.float32)
    m.eval()
    with torch.no_grad():
        want = m(torch.from_numpy(x)).numpy()
    got = np.asarray(audio_net.apply(params, cfg, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_text_clf_port_matches_torch_forward():
    torch.manual_seed(1)
    m = _TorchTextClf()
    cfg = C.replace(C.TEXT_CLF.model, embedding_size=24, hidden_dims=8)
    params = porting.text_net_from_state_dict(_sd(m), cfg)
    x = np.random.default_rng(1).standard_normal((4, 3, 24)).astype(np.float32)
    m.eval()
    with torch.no_grad():
        want = m(torch.from_numpy(x)).numpy()
    got = np.asarray(text_net.apply(params, cfg, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_missing_key_raises_with_context():
    import pytest
    cfg = C.replace(C.AUDIO_CLF.model, embedding_size=8, hidden_dims=8)
    with pytest.raises(KeyError, match="lstm_net_audio"):
        porting.audio_net_from_state_dict({"bogus": np.zeros(1)}, cfg)
