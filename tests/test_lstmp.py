"""LSTM-with-projection (ELMo cell) vs an independent NumPy oracle, and the
ELMo-faithful stacked encoder."""

import numpy as np
import jax
import jax.numpy as jnp

from icassp2022_depression_tpu.models import elmo
from icassp2022_depression_tpu.ops import rnn as rnn_ops


def _oracle(p, x, cell_clip=3.0, proj_clip=3.0):
    w_x = np.asarray(p["w_x"]); w_h = np.asarray(p["w_h"])
    b = np.asarray(p["b"]); w_p = np.asarray(p["w_p"])
    c_dim = w_x.shape[0] // 4
    p_dim = w_p.shape[0]
    bsz, t, _ = x.shape
    h = np.zeros((bsz, p_dim), np.float32)
    c = np.zeros((bsz, c_dim), np.float32)
    out = np.zeros((bsz, t, p_dim), np.float32)

    def sig(v):
        return 1.0 / (1.0 + np.exp(-v))

    for step in range(t):
        gp = x[:, step] @ w_x.T + h @ w_h.T + b
        i = sig(gp[:, :c_dim])
        f = sig(gp[:, c_dim:2 * c_dim])
        g = np.tanh(gp[:, 2 * c_dim:3 * c_dim])
        o = sig(gp[:, 3 * c_dim:])
        c = np.clip(f * c + i * g, -cell_clip, cell_clip)
        h = np.clip((o * np.tanh(c)) @ w_p.T, -proj_clip, proj_clip)
        out[:, step] = h
    return out


def test_lstmp_matches_oracle():
    key = jax.random.PRNGKey(0)
    p = rnn_ops.init_lstmp(key, input_size=12, cell=20, proj=8)
    x = np.random.default_rng(0).standard_normal((3, 5, 12)).astype(np.float32)
    # scale up so clipping actually engages
    p = jax.tree_util.tree_map(lambda a: a * 3.0, p)
    got, h_last, c_last = rnn_ops.lstmp_layer(p, jnp.asarray(x))
    want = _oracle(p, x)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)
    np.testing.assert_allclose(np.asarray(h_last), want[:, -1], atol=1e-5)
    assert float(jnp.abs(c_last).max()) <= 3.0  # cell clip engaged


def test_lstmp_encoder_shapes_and_padding():
    cfg = elmo.ElmoLstmpConfig(vocab_size=64, input_dim=8, cell_size=16,
                               proj_size=8, layers=2)
    params = elmo.init_lstmp_encoder(jax.random.PRNGKey(1), cfg)
    ids = jnp.asarray(np.array([[3, 9, 4, 0, 0]], np.int32))
    rep, pooled = elmo.encode_lstmp(params, ids, jnp.asarray([3]), cfg)
    assert rep.shape == (1, 5, 16) and pooled.shape == (1, 16)
    # padding invariance
    _, p2 = elmo.encode_lstmp(params, ids[:, :3], jnp.asarray([3]), cfg)
    np.testing.assert_allclose(np.asarray(pooled), np.asarray(p2), atol=1e-5)


def test_from_elmoformanylangs_mapping():
    cfg = elmo.ElmoLstmpConfig(vocab_size=32, input_dim=8, cell_size=12,
                               proj_size=8, layers=2)
    rng = np.random.default_rng(2)
    sd = {}
    for d in ("forward", "backward"):
        for k in range(2):
            in_dim = 8
            sd[f"encoder.{d}_layer_{k}.input_linearity.weight"] = \
                rng.standard_normal((48, in_dim)).astype(np.float32)
            sd[f"encoder.{d}_layer_{k}.state_linearity.weight"] = \
                rng.standard_normal((48, 8)).astype(np.float32)
            sd[f"encoder.{d}_layer_{k}.state_linearity.bias"] = \
                rng.standard_normal(48).astype(np.float32)
            sd[f"encoder.{d}_layer_{k}.state_projection.weight"] = \
                rng.standard_normal((8, 12)).astype(np.float32)
    emb = rng.standard_normal((32, 8)).astype(np.float32)
    params = elmo.from_elmoformanylangs(sd, cfg, word_embedding=emb)
    np.testing.assert_array_equal(
        np.asarray(params["layers"][1]["bwd"]["w_p"]),
        sd["encoder.backward_layer_1.state_projection.weight"])
    ids = jnp.asarray(np.array([[1, 2, 3]], np.int32))
    rep, pooled = elmo.encode_lstmp(params, ids, jnp.asarray([3]), cfg)
    assert np.isfinite(np.asarray(pooled)).all()
