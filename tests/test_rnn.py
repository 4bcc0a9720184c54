"""GRU/LSTM kernels verified against PyTorch's nn.GRU/nn.LSTM as oracles."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from icassp2022_depression_tpu.ops import rnn


def _port_torch_rnn(module, num_layers, bidirectional):
    """Copy torch RNN weights into our params pytree."""
    sd = {k: v.detach().numpy() for k, v in module.state_dict().items()}
    params = []
    for layer in range(num_layers):
        entry = {"fwd": {
            "w_ih": jnp.asarray(sd[f"weight_ih_l{layer}"]),
            "w_hh": jnp.asarray(sd[f"weight_hh_l{layer}"]),
            "b_ih": jnp.asarray(sd[f"bias_ih_l{layer}"]),
            "b_hh": jnp.asarray(sd[f"bias_hh_l{layer}"]),
        }}
        if bidirectional:
            entry["bwd"] = {
                "w_ih": jnp.asarray(sd[f"weight_ih_l{layer}_reverse"]),
                "w_hh": jnp.asarray(sd[f"weight_hh_l{layer}_reverse"]),
                "b_ih": jnp.asarray(sd[f"bias_ih_l{layer}_reverse"]),
                "b_hh": jnp.asarray(sd[f"bias_hh_l{layer}_reverse"]),
            }
        params.append(entry)
    return params


@pytest.mark.parametrize("num_layers,bidirectional",
                         [(1, False), (2, False), (2, True)])
def test_gru_matches_torch(num_layers, bidirectional):
    torch.manual_seed(0)
    b, t, d, h = 4, 3, 16, 8
    m = torch.nn.GRU(d, h, num_layers=num_layers, batch_first=True,
                     bidirectional=bidirectional)
    params = _port_torch_rnn(m, num_layers, bidirectional)
    x = np.random.default_rng(0).standard_normal((b, t, d)).astype(np.float32)
    with torch.no_grad():
        y_t, h_t = m(torch.from_numpy(x))
    y_j, hn_j, _ = rnn.rnn(params, jnp.asarray(x), "gru")
    np.testing.assert_allclose(np.asarray(y_j), y_t.numpy(), atol=1e-5)
    # torch h_n: [L*D, B, H]; ours: [B, L*D, H]
    np.testing.assert_allclose(
        np.asarray(hn_j), h_t.numpy().transpose(1, 0, 2), atol=1e-5)


@pytest.mark.parametrize("num_layers,bidirectional",
                         [(1, False), (2, True)])
def test_lstm_matches_torch(num_layers, bidirectional):
    torch.manual_seed(1)
    b, t, d, h = 4, 3, 16, 8
    m = torch.nn.LSTM(d, h, num_layers=num_layers, batch_first=True,
                      bidirectional=bidirectional)
    params = _port_torch_rnn(m, num_layers, bidirectional)
    x = np.random.default_rng(1).standard_normal((b, t, d)).astype(np.float32)
    with torch.no_grad():
        y_t, (h_t, c_t) = m(torch.from_numpy(x))
    y_j, hn_j, cn_j = rnn.rnn(params, jnp.asarray(x), "lstm")
    np.testing.assert_allclose(np.asarray(y_j), y_t.numpy(), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(hn_j), h_t.numpy().transpose(1, 0, 2), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(cn_j), c_t.numpy().transpose(1, 0, 2), atol=1e-5)


def test_init_params_shapes():
    key = jax.random.PRNGKey(0)
    params = rnn.init_params(key, "lstm", input_size=1024, hidden=128,
                             num_layers=2, bidirectional=True, init="xavier")
    assert len(params) == 2
    assert params[0]["fwd"]["w_ih"].shape == (512, 1024)
    assert params[1]["fwd"]["w_ih"].shape == (512, 256)  # input = 2*H
    assert params[1]["bwd"]["w_hh"].shape == (512, 128)
    # xavier init zeroes biases
    assert float(jnp.abs(params[0]["fwd"]["b_ih"]).sum()) == 0.0


def test_gru_grads_flow():
    key = jax.random.PRNGKey(2)
    params = rnn.init_params(key, "gru", 16, 8, 2, False)
    x = jax.random.normal(jax.random.PRNGKey(3), (4, 3, 16))

    def loss(p):
        y, _, _ = rnn.rnn(p, x, "gru")
        return jnp.sum(y ** 2)

    g = jax.grad(loss)(params)
    flat = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(leaf)).all() for leaf in flat)
    assert any(float(jnp.abs(leaf).sum()) > 0 for leaf in flat)


def test_interlayer_dropout_train_vs_eval():
    key = jax.random.PRNGKey(4)
    params = rnn.init_params(key, "gru", 16, 8, 2, False)
    x = jax.random.normal(jax.random.PRNGKey(5), (4, 3, 16))
    y_eval, _, _ = rnn.rnn(params, x, "gru", dropout=0.5, train=False)
    y_train, _, _ = rnn.rnn(params, x, "gru", dropout=0.5, train=True,
                            key=jax.random.PRNGKey(6))
    assert not np.allclose(np.asarray(y_eval), np.asarray(y_train))
    # eval path is deterministic
    y_eval2, _, _ = rnn.rnn(params, x, "gru", dropout=0.5, train=False)
    np.testing.assert_array_equal(np.asarray(y_eval), np.asarray(y_eval2))
