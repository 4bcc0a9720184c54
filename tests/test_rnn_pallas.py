"""Fused Pallas GRU kernel vs the lax.scan path (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from icassp2022_depression_tpu.ops import rnn, rnn_pallas


@pytest.mark.parametrize("b,t,d,h", [(4, 3, 16, 8), (2, 7, 8, 8)])
def test_pallas_gru_forward_matches_scan(b, t, d, h):
    p = rnn.init_params(jax.random.PRNGKey(0), "gru", d, h, 1, False)[0]["fwd"]
    x = jax.random.normal(jax.random.PRNGKey(1), (b, t, d))
    ys_scan, h_scan, _ = rnn._run_direction(p, x, "gru", False)
    ys_pal, h_pal = rnn_pallas.gru_layer(p, x)
    np.testing.assert_allclose(np.asarray(ys_pal), np.asarray(ys_scan),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(h_pal), np.asarray(h_scan),
                               atol=1e-5)


def test_pallas_gru_reverse_matches_scan():
    p = rnn.init_params(jax.random.PRNGKey(2), "gru", 16, 8, 1, False)[0]["fwd"]
    x = jax.random.normal(jax.random.PRNGKey(3), (4, 5, 16))
    ys_scan, _, _ = rnn._run_direction(p, x, "gru", True)
    ys_pal, _ = rnn_pallas.gru_layer(p, x, reverse=True)
    np.testing.assert_allclose(np.asarray(ys_pal), np.asarray(ys_scan),
                               atol=1e-5)


def test_pallas_gru_gradients_match_scan():
    p = rnn.init_params(jax.random.PRNGKey(4), "gru", 16, 8, 1, False)[0]["fwd"]
    x = jax.random.normal(jax.random.PRNGKey(5), (4, 6, 16))

    def loss_scan(p, x):
        ys, _, _ = rnn._run_direction(p, x, "gru", False)
        return jnp.sum(jnp.sin(ys))

    def loss_pal(p, x):
        ys, _ = rnn_pallas.gru_layer(p, x)
        return jnp.sum(jnp.sin(ys))

    g1 = jax.grad(loss_scan)(p, x)
    g2 = jax.grad(loss_pal)(p, x)
    for k in g1:
        np.testing.assert_allclose(np.asarray(g2[k]), np.asarray(g1[k]),
                                   atol=1e-4, err_msg=k)
    # input gradients too
    gx1 = jax.grad(loss_scan, argnums=1)(p, x)
    gx2 = jax.grad(loss_pal, argnums=1)(p, x)
    np.testing.assert_allclose(np.asarray(gx2), np.asarray(gx1), atol=1e-4)


@pytest.mark.parametrize("b,t,d,h", [(4, 3, 16, 8), (2, 7, 8, 8)])
def test_pallas_lstm_forward_matches_scan(b, t, d, h):
    p = rnn.init_params(jax.random.PRNGKey(10), "lstm", d, h, 1, False)[0]["fwd"]
    x = jax.random.normal(jax.random.PRNGKey(11), (b, t, d))
    ys_scan, h_scan, c_scan = rnn._run_direction(p, x, "lstm", False)
    ys_pal, h_pal, c_pal = rnn_pallas.lstm_layer(p, x)
    np.testing.assert_allclose(np.asarray(ys_pal), np.asarray(ys_scan),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(h_pal), np.asarray(h_scan),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(c_pal), np.asarray(c_scan),
                               atol=1e-5)


def test_pallas_lstm_gradients_match_scan():
    p = rnn.init_params(jax.random.PRNGKey(12), "lstm", 16, 8, 1, False)[0]["fwd"]
    x = jax.random.normal(jax.random.PRNGKey(13), (4, 6, 16))

    def loss_scan(p, x):
        ys, _, _ = rnn._run_direction(p, x, "lstm", False)
        return jnp.sum(jnp.sin(ys))

    def loss_pal(p, x):
        ys, _, _ = rnn_pallas.lstm_layer(p, x)
        return jnp.sum(jnp.sin(ys))

    g1 = jax.grad(loss_scan)(p, x)
    g2 = jax.grad(loss_pal)(p, x)
    for k in g1:
        np.testing.assert_allclose(np.asarray(g2[k]), np.asarray(g1[k]),
                                   atol=1e-4, err_msg=k)
    gx1 = jax.grad(loss_scan, argnums=1)(p, x)
    gx2 = jax.grad(loss_pal, argnums=1)(p, x)
    np.testing.assert_allclose(np.asarray(gx2), np.asarray(gx1), atol=1e-4)


def test_pallas_bilstm_backend_in_rnn_api():
    params = rnn.init_params(jax.random.PRNGKey(14), "lstm", 16, 8, 2, True)
    x = jax.random.normal(jax.random.PRNGKey(15), (4, 3, 16))
    y_scan, hn_scan, cn_scan = rnn.rnn(params, x, "lstm")
    y_pal, hn_pal, cn_pal = rnn.rnn(params, x, "lstm", backend="pallas")
    np.testing.assert_allclose(np.asarray(y_pal), np.asarray(y_scan),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(hn_pal), np.asarray(hn_scan),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(cn_pal), np.asarray(cn_scan),
                               atol=1e-5)


@pytest.mark.parametrize("t", [37, 64])
def test_streamed_gru_matches_scan(t):
    p = rnn.init_params(jax.random.PRNGKey(20), "gru", 16, 8, 1, False)[0]["fwd"]
    x = jax.random.normal(jax.random.PRNGKey(21), (4, t, 16))
    ys_scan, h_scan, _ = rnn._run_direction(p, x, "gru", False)
    ys_st, h_st = rnn_pallas.gru_layer_streamed(p, x, chunk=8)
    np.testing.assert_allclose(np.asarray(ys_st), np.asarray(ys_scan),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(h_st), np.asarray(h_scan),
                               atol=1e-5)
    # reverse
    ys_r, _ = rnn_pallas.gru_layer_streamed(p, x, reverse=True, chunk=8)
    ys_rs, _, _ = rnn._run_direction(p, x, "gru", True)
    np.testing.assert_allclose(np.asarray(ys_r), np.asarray(ys_rs),
                               atol=1e-5)


def test_streamed_gru_gradients_match_scan():
    p = rnn.init_params(jax.random.PRNGKey(22), "gru", 16, 8, 1, False)[0]["fwd"]
    x = jax.random.normal(jax.random.PRNGKey(23), (4, 37, 16))

    def loss_scan(p, x):
        ys, _, _ = rnn._run_direction(p, x, "gru", False)
        return jnp.sum(jnp.sin(ys))

    def loss_st(p, x):
        ys, _ = rnn_pallas.gru_layer_streamed(p, x, chunk=8)
        return jnp.sum(jnp.sin(ys))

    g1 = jax.grad(loss_scan)(p, x)
    g2 = jax.grad(loss_st)(p, x)
    for k in g1:
        np.testing.assert_allclose(np.asarray(g2[k]), np.asarray(g1[k]),
                                   atol=5e-4, err_msg=k)
    gx1 = jax.grad(loss_scan, argnums=1)(p, x)
    gx2 = jax.grad(loss_st, argnums=1)(p, x)
    np.testing.assert_allclose(np.asarray(gx2), np.asarray(gx1), atol=1e-4)


def test_streamed_lstm_matches_scan():
    p = rnn.init_params(jax.random.PRNGKey(30), "lstm", 16, 8, 1, False)[0]["fwd"]
    x = jax.random.normal(jax.random.PRNGKey(31), (4, 37, 16))
    ys_scan, h_scan, c_scan = rnn._run_direction(p, x, "lstm", False)
    ys_st, h_st, c_st = rnn_pallas.lstm_layer_streamed(p, x, chunk=8)
    np.testing.assert_allclose(np.asarray(ys_st), np.asarray(ys_scan),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(h_st), np.asarray(h_scan),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(c_st), np.asarray(c_scan),
                               atol=1e-5)
    ys_r, _, _ = rnn_pallas.lstm_layer_streamed(p, x, reverse=True, chunk=8)
    ys_rs, _, _ = rnn._run_direction(p, x, "lstm", True)
    np.testing.assert_allclose(np.asarray(ys_r), np.asarray(ys_rs),
                               atol=1e-5)


def test_streamed_lstm_gradients_match_scan():
    p = rnn.init_params(jax.random.PRNGKey(32), "lstm", 16, 8, 1, False)[0]["fwd"]
    x = jax.random.normal(jax.random.PRNGKey(33), (4, 37, 16))

    def loss_scan(p, x):
        ys, _, _ = rnn._run_direction(p, x, "lstm", False)
        return jnp.sum(jnp.sin(ys))

    def loss_st(p, x):
        ys, _, _ = rnn_pallas.lstm_layer_streamed(p, x, chunk=8)
        return jnp.sum(jnp.sin(ys))

    g1 = jax.grad(loss_scan)(p, x)
    g2 = jax.grad(loss_st)(p, x)
    for k in g1:
        np.testing.assert_allclose(np.asarray(g2[k]), np.asarray(g1[k]),
                                   atol=5e-4, err_msg=k)
    gx1 = jax.grad(loss_scan, argnums=1)(p, x)
    gx2 = jax.grad(loss_st, argnums=1)(p, x)
    np.testing.assert_allclose(np.asarray(gx2), np.asarray(gx1), atol=1e-4)


def test_lstm_cell_state_cotangent_propagates():
    """Gradients through the cell-state outputs (c_last / cs) must flow —
    both fused and streamed LSTM VJPs."""
    p = rnn.init_params(jax.random.PRNGKey(40), "lstm", 8, 8, 1, False)[0]["fwd"]
    x = jax.random.normal(jax.random.PRNGKey(41), (2, 9, 8))

    def loss_scan(p):
        _, _, c_last = rnn._run_direction(p, x, "lstm", False)
        return jnp.sum(c_last ** 2)

    def loss_fused(p):
        _, _, c_last = rnn_pallas.lstm_layer(p, x)
        return jnp.sum(c_last ** 2)

    def loss_streamed(p):
        _, _, c_last = rnn_pallas.lstm_layer_streamed(p, x, chunk=8)
        return jnp.sum(c_last ** 2)

    g_ref = jax.grad(loss_scan)(p)
    for name, fn in (("fused", loss_fused), ("streamed", loss_streamed)):
        g = jax.grad(fn)(p)
        for k in g_ref:
            np.testing.assert_allclose(np.asarray(g[k]), np.asarray(g_ref[k]),
                                       atol=5e-4, err_msg=f"{name}/{k}")


def test_pallas_backend_in_rnn_api():
    params = rnn.init_params(jax.random.PRNGKey(6), "gru", 16, 8, 2, False)
    x = jax.random.normal(jax.random.PRNGKey(7), (4, 3, 16))
    y_scan, hn_scan, _ = rnn.rnn(params, x, "gru")
    y_pal, hn_pal, _ = rnn.rnn(params, x, "gru", backend="pallas")
    np.testing.assert_allclose(np.asarray(y_pal), np.asarray(y_scan),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(hn_pal), np.asarray(hn_scan),
                               atol=1e-5)


# ---------------------------------------------------------------------------
# Streaming LSTMP (ELMo biLM cell)
# ---------------------------------------------------------------------------


def _lstmp_params(key, d, c, p_dim):
    return rnn.init_lstmp(key, d, c, p_dim)


@pytest.mark.parametrize("slab", [None, 8])
@pytest.mark.parametrize("reverse", [False, True])
def test_streamed_lstmp_matches_scan(slab, reverse):
    p = _lstmp_params(jax.random.PRNGKey(0), 12, 16, 8)
    # scale up so the +-3 cell/proj clips actually bind
    p = {k: v * 3.0 for k, v in p.items()}
    p["w_p"] = p["w_p"] * 5.0
    p["b"] = jnp.ones_like(p["b"])
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 6, 12)) * 2.0
    ys_s, h_s, c_s = rnn.lstmp_layer(p, x, reverse=reverse, backend="xla")
    ys_p, h_p, c_p = rnn_pallas.lstmp_layer_streamed(p, x, reverse=reverse,
                                                     slab=slab)
    np.testing.assert_allclose(np.asarray(ys_p), np.asarray(ys_s), atol=1e-5)
    np.testing.assert_allclose(np.asarray(h_p), np.asarray(h_s), atol=1e-5)
    np.testing.assert_allclose(np.asarray(c_p), np.asarray(c_s), atol=1e-5)
    # clips must actually have fired for this to test the masks
    assert float(jnp.max(jnp.abs(ys_s))) == pytest.approx(3.0)


def test_streamed_lstmp_no_clip_matches_scan():
    p = _lstmp_params(jax.random.PRNGKey(2), 8, 8, 8)
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 5, 8))
    ys_s, _, c_s = rnn.lstmp_layer(p, x, cell_clip=0.0, proj_clip=0.0,
                                   backend="xla")
    ys_p, _, c_p = rnn_pallas.lstmp_layer_streamed(p, x, cell_clip=0.0,
                                                   proj_clip=0.0)
    np.testing.assert_allclose(np.asarray(ys_p), np.asarray(ys_s), atol=1e-5)
    np.testing.assert_allclose(np.asarray(c_p), np.asarray(c_s), atol=1e-5)


@pytest.mark.parametrize("slab", [None, 4])
def test_streamed_lstmp_gradients_match_scan(slab):
    p = _lstmp_params(jax.random.PRNGKey(4), 12, 16, 8)
    p = {k: v * 2.0 for k, v in p.items()}
    x = jax.random.normal(jax.random.PRNGKey(5), (3, 7, 12)) * 1.5

    def loss(layer_fn, p, x):
        ys, h_last, c_last = layer_fn(p, x)
        return (jnp.sum(jnp.sin(ys)) + jnp.sum(c_last * 0.3) +
                jnp.sum(h_last))

    scan_fn = lambda p, x: rnn.lstmp_layer(p, x, backend="xla")
    pal_fn = lambda p, x: rnn_pallas.lstmp_layer_streamed(p, x, slab=slab)
    g1 = jax.grad(lambda p, x: loss(scan_fn, p, x))(p, x)
    g2 = jax.grad(lambda p, x: loss(pal_fn, p, x))(p, x)
    for k in g1:
        np.testing.assert_allclose(np.asarray(g2[k]), np.asarray(g1[k]),
                                   atol=1e-4, err_msg=k)
    gx1 = jax.grad(lambda p, x: loss(scan_fn, p, x), argnums=1)(p, x)
    gx2 = jax.grad(lambda p, x: loss(pal_fn, p, x), argnums=1)(p, x)
    np.testing.assert_allclose(np.asarray(gx2), np.asarray(gx1), atol=1e-4)


def test_streamed_lstmp_reverse_gradients_match_scan():
    p = _lstmp_params(jax.random.PRNGKey(6), 8, 8, 8)
    x = jax.random.normal(jax.random.PRNGKey(7), (2, 5, 8))

    def loss(layer_fn, p, x):
        ys, _, _ = layer_fn(p, x)
        return jnp.sum(ys ** 2)

    g1 = jax.grad(lambda p, x: loss(
        lambda p, x: rnn.lstmp_layer(p, x, reverse=True, backend="xla"),
        p, x))(p, x)
    g2 = jax.grad(lambda p, x: loss(
        lambda p, x: rnn_pallas.lstmp_layer_streamed(p, x, reverse=True),
        p, x))(p, x)
    for k in g1:
        np.testing.assert_allclose(np.asarray(g2[k]), np.asarray(g1[k]),
                                   atol=1e-4, err_msg=k)


def test_lstmp_auto_guard_vmem_fit():
    """The auto-dispatch falls back to scan when the batch-scaled VMEM
    scratches would not fit (CLAUDE.md backend-auto invariant)."""
    assert rnn._lstmp_pallas_fits(64, 4096, 512)       # zhs extraction
    assert not rnn._lstmp_pallas_fits(2048, 4096, 512)  # scratches >32 MB
