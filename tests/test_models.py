"""Model forwards verified against torch-composed oracles (eval mode)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn as tnn

from icassp2022_depression_tpu import config
from icassp2022_depression_tpu.models import audio_net, fusion, losses, text_net


def _np(x):
    return np.asarray(jax.device_get(x))


def _to_torch_rnn(module, params, bidirectional):
    for layer, entry in enumerate(params):
        for suffix, p in (("", entry["fwd"]),) + (
                (("_reverse", entry["bwd"]),) if bidirectional else ()):
            getattr(module, f"weight_ih_l{layer}{suffix}").data = torch.from_numpy(_np(p["w_ih"]))
            getattr(module, f"weight_hh_l{layer}{suffix}").data = torch.from_numpy(_np(p["w_hh"]))
            getattr(module, f"bias_ih_l{layer}{suffix}").data = torch.from_numpy(_np(p["b_ih"]))
            getattr(module, f"bias_hh_l{layer}{suffix}").data = torch.from_numpy(_np(p["b_hh"]))


def _to_torch_linear(module, p):
    module.weight.data = torch.from_numpy(_np(p["w"]))
    if module.bias is not None:
        module.bias.data = torch.from_numpy(_np(p["b"]))


def _torch_attention(attn_linear, lstm_out, h_n):
    half = lstm_out.shape[-1] // 2
    h = lstm_out[..., :half] + lstm_out[..., half:]
    q = h_n.sum(dim=1, keepdim=True)
    aw = torch.relu(attn_linear(q))
    m = torch.tanh(h)
    scores = torch.softmax(torch.bmm(aw, m.transpose(1, 2)), dim=-1)
    return torch.bmm(scores, h).squeeze(1)


def test_audio_clf_forward_matches_torch():
    cfg = config.AUDIO_CLF.model
    params = audio_net.init(jax.random.PRNGKey(0), cfg)
    x = np.random.default_rng(0).standard_normal((5, 3, 256)).astype(np.float32)

    ln = tnn.LayerNorm(256)
    gru = tnn.GRU(256, 256, num_layers=2, batch_first=True)
    fc1 = tnn.Linear(256, 256)
    fc2 = tnn.Linear(256, 2)
    ln.weight.data = torch.from_numpy(_np(params["ln"]["w"]))
    ln.bias.data = torch.from_numpy(_np(params["ln"]["b"]))
    _to_torch_rnn(gru, params["rnn"], False)
    _to_torch_linear(fc1, params["fc1"])
    _to_torch_linear(fc2, params["fc2"])
    with torch.no_grad():
        h, _ = gru(ln(torch.from_numpy(x)))
        want = torch.softmax(fc2(torch.relu(fc1(h.mean(dim=1)))), dim=1).numpy()

    got = _np(audio_net.apply(params, cfg, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-5)
    np.testing.assert_allclose(got.sum(axis=1), 1.0, atol=1e-5)


def test_audio_reg_forward_matches_torch():
    cfg = config.AUDIO_REG.model
    params = audio_net.init(jax.random.PRNGKey(1), cfg)
    assert "ln" not in params  # reg variant has no input LayerNorm
    x = np.random.default_rng(1).standard_normal((4, 3, 256)).astype(np.float32)

    gru = tnn.GRU(256, 256, num_layers=2, batch_first=True)
    fc1 = tnn.Linear(256, 256)
    fc2 = tnn.Linear(256, 1)
    _to_torch_rnn(gru, params["rnn"], False)
    _to_torch_linear(fc1, params["fc1"])
    _to_torch_linear(fc2, params["fc2"])
    with torch.no_grad():
        h, _ = gru(torch.from_numpy(x))
        want = torch.relu(fc2(torch.relu(fc1(h.sum(dim=1))))).numpy()

    got = _np(audio_net.apply(params, cfg, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-4)
    assert (got >= 0).all()


def test_text_clf_forward_matches_torch():
    cfg = config.TEXT_CLF.model
    params = text_net.init(jax.random.PRNGKey(2), cfg)
    x = np.random.default_rng(2).standard_normal((3, 3, 1024)).astype(np.float32)

    lstm = tnn.LSTM(1024, 128, num_layers=2, bidirectional=True)
    attn = tnn.Linear(128, 128)
    fc1 = tnn.Linear(128, 128)
    fc2 = tnn.Linear(128, 2)
    _to_torch_rnn(lstm, params["rnn"], True)
    _to_torch_linear(attn, params["attn"])
    _to_torch_linear(fc1, params["fc1"])
    _to_torch_linear(fc2, params["fc2"])
    with torch.no_grad():
        xt = torch.from_numpy(x).permute(1, 0, 2)
        out, (h_n, _) = lstm(xt)
        out = out.permute(1, 0, 2)
        h_n = h_n.permute(1, 0, 2)
        ctx = _torch_attention(attn, out, h_n)
        want = torch.softmax(fc2(torch.relu(fc1(ctx))), dim=1).numpy()

    got = _np(text_net.apply(params, cfg, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_text_clf_xavier_init_zero_biases():
    params = text_net.init(jax.random.PRNGKey(3), config.TEXT_CLF.model)
    assert float(jnp.abs(params["fc1"]["b"]).sum()) == 0.0
    assert float(jnp.abs(params["rnn"][0]["fwd"]["b_ih"]).sum()) == 0.0
    # unused LayerNorms exist with default init
    np.testing.assert_allclose(_np(params["ln1"]["w"]), 1.0)


def test_fusion_clf_forward_matches_torch():
    cfg = config.FUSE_CLF
    params = fusion.init(jax.random.PRNGKey(4), cfg)
    rng = np.random.default_rng(4)
    xa = rng.standard_normal((3, 3, 256)).astype(np.float32)
    xt = rng.standard_normal((3, 3, 1024)).astype(np.float32)

    lstm = tnn.LSTM(1024, 128, num_layers=2, bidirectional=True)
    attn = tnn.Linear(128, 128)
    tfc = tnn.Linear(128, 128)
    gru = tnn.GRU(256, 256, num_layers=2, batch_first=True)
    afc = tnn.Linear(256, 256)
    ln = tnn.LayerNorm(256)
    fc_final = tnn.Linear(384, 2, bias=False)
    _to_torch_rnn(lstm, params["text"]["rnn"], True)
    _to_torch_linear(attn, params["text"]["attn"])
    _to_torch_linear(tfc, params["text"]["fc"])
    _to_torch_rnn(gru, params["audio"]["rnn"], False)
    _to_torch_linear(afc, params["audio"]["fc"])
    ln.weight.data = torch.from_numpy(_np(params["audio"]["ln"]["w"]))
    ln.bias.data = torch.from_numpy(_np(params["audio"]["ln"]["b"]))
    fc_final.weight.data = torch.from_numpy(_np(params["fc_final"]["w"]))

    with torch.no_grad():
        out, (h_n, _) = lstm(torch.from_numpy(xt).permute(1, 0, 2))
        ctx = _torch_attention(attn, out.permute(1, 0, 2), h_n.permute(1, 0, 2))
        tf = torch.relu(tfc(ctx))
        ha, _ = gru(ln(torch.from_numpy(xa)))
        af = torch.relu(afc(ha.sum(dim=1)))
        want = torch.softmax(fc_final(torch.cat([tf, af], dim=1)), dim=1).numpy()

    got, (tf_j, af_j) = fusion.apply(params, cfg, jnp.asarray(xa), jnp.asarray(xt))
    np.testing.assert_allclose(_np(got), want, atol=1e-4)
    np.testing.assert_allclose(_np(tf_j), tf.numpy(), atol=1e-4)


def test_fusion_gradients_reach_only_fc_final():
    cfg = config.FUSE_CLF
    params = fusion.init(jax.random.PRNGKey(5), cfg)
    rng = np.random.default_rng(5)
    xa = jnp.asarray(rng.standard_normal((4, 3, 256)).astype(np.float32))
    xt = jnp.asarray(rng.standard_normal((4, 3, 1024)).astype(np.float32))
    y = jnp.array([0, 1, 1, 0])

    def loss_fn(p):
        tf, af = fusion.pretrained_feature(p, cfg, xa, xt)
        return losses.myloss_ce(tf, af, y, p["fc_final"]["w"],
                                cfg.text_hidden_dims)

    g = jax.grad(loss_fn)(params)
    assert float(jnp.abs(g["fc_final"]["w"]).sum()) > 0
    for sub in ("text", "audio"):
        leaves = jax.tree_util.tree_leaves(g[sub])
        assert all(float(jnp.abs(l).sum()) == 0.0 for l in leaves)
    assert float(jnp.abs(g["modal_attn"]["w"]).sum()) == 0.0


def test_init_from_branches_track_semantics():
    cfg_clf = config.FUSE_CLF
    cfg_reg = config.FUSE_REG
    f_clf = fusion.init(jax.random.PRNGKey(6), cfg_clf)
    f_reg = fusion.init(jax.random.PRNGKey(7), cfg_reg)
    t = text_net.init(jax.random.PRNGKey(8), config.TEXT_CLF.model)
    a = audio_net.init(jax.random.PRNGKey(9), config.AUDIO_CLF.model)

    p = fusion.init_from_branches(f_clf, cfg_clf, t, a, track="classification")
    np.testing.assert_array_equal(_np(p["text"]["rnn"][0]["fwd"]["w_ih"]),
                                  _np(t["rnn"][0]["fwd"]["w_ih"]))
    np.testing.assert_array_equal(_np(p["audio"]["fc"]["w"]), _np(a["fc1"]["w"]))
    np.testing.assert_array_equal(_np(p["audio"]["ln"]["w"]), _np(a["ln"]["w"]))
    # clf: text fc is NOT transferred (reference key mismatch) — stays fresh
    np.testing.assert_array_equal(_np(p["text"]["fc"]["w"]),
                                  _np(f_clf["text"]["fc"]["w"]))
    assert not np.allclose(_np(p["text"]["fc"]["w"]), _np(t["fc1"]["w"]))

    a_reg = audio_net.init(jax.random.PRNGKey(10), config.AUDIO_REG.model)
    t_reg = text_net.init(jax.random.PRNGKey(11), config.TEXT_REG.model)
    p2 = fusion.init_from_branches(f_reg, cfg_reg, t_reg, a_reg, track="regression")
    # reg: text fc IS transferred
    np.testing.assert_array_equal(_np(p2["text"]["fc"]["w"]), _np(t_reg["fc1"]["w"]))
    # fc_final always stays fresh
    np.testing.assert_array_equal(_np(p2["fc_final"]["w"]), _np(f_reg["fc_final"]["w"]))


def test_myloss_ce_matches_torch():
    rng = np.random.default_rng(6)
    tf = rng.standard_normal((4, 128)).astype(np.float32)
    af = rng.standard_normal((4, 256)).astype(np.float32)
    w = rng.standard_normal((2, 384)).astype(np.float32)
    y = np.array([0, 1, 1, 0])
    want = (tnn.functional.cross_entropy(
                torch.from_numpy(tf @ w[:, :128].T), torch.from_numpy(y)) +
            tnn.functional.cross_entropy(
                torch.from_numpy(af @ w[:, 128:].T), torch.from_numpy(y))).item()
    got = float(losses.myloss_ce(jnp.asarray(tf), jnp.asarray(af),
                                 jnp.asarray(y), jnp.asarray(w), 128))
    assert got == pytest.approx(want, abs=1e-5)


def test_myloss_smooth_l1_matches_torch():
    rng = np.random.default_rng(7)
    tf = rng.standard_normal((4, 128)).astype(np.float32)
    af = rng.standard_normal((4, 256)).astype(np.float32)
    w = rng.standard_normal((1, 384)).astype(np.float32)
    y = rng.uniform(30, 70, 4).astype(np.float32)
    pt = torch.from_numpy(tf @ w[:, :128].T)
    pa = torch.from_numpy(af @ w[:, 128:].T)
    t = torch.from_numpy(y).view_as(pt)
    want = (tnn.functional.smooth_l1_loss(pt, t) +
            tnn.functional.smooth_l1_loss(pa, t)).item()
    got = float(losses.myloss_smooth_l1(jnp.asarray(tf), jnp.asarray(af),
                                        jnp.asarray(y), jnp.asarray(w), 128))
    assert got == pytest.approx(want, abs=1e-4)


def test_ce_on_probs_double_softmax_matches_torch():
    from icassp2022_depression_tpu.ops.nn import cross_entropy_on_probs
    rng = np.random.default_rng(8)
    logits = rng.standard_normal((6, 2)).astype(np.float32)
    probs = torch.softmax(torch.from_numpy(logits), dim=1)
    y = np.array([0, 1, 0, 1, 1, 0])
    want = tnn.functional.cross_entropy(probs, torch.from_numpy(y)).item()
    got = float(cross_entropy_on_probs(
        jnp.asarray(probs.numpy()), jnp.asarray(y), 2))
    assert got == pytest.approx(want, abs=1e-6)
