"""Tensor-parallel LSTMP biLM vs the serial scan on the virtual mesh.

The TP layer shards the 4C gate dimension and the memory cell over the
``model`` axis with one psum per step at the projection; results must
match the serial ``ops/rnn.py::lstmp_layer`` scan up to psum reduction
order (exact f32 on CPU up to summation order -> 1e-5)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from icassp2022_depression_tpu.models import elmo
from icassp2022_depression_tpu.ops import rnn as rnn_ops
from icassp2022_depression_tpu.parallel import elmo_tp, mesh as mesh_mod

CELL, PROJ, DIN = 256, 64, 64


@pytest.fixture(scope="module")
def tp_mesh():
    if len(jax.devices()) < 4:
        pytest.skip("needs >= 4 devices")
    return mesh_mod.make_mesh(4, model_parallel=4)


def test_lstmp_layer_tp_matches_serial(tp_mesh):
    p = rnn_ops.init_lstmp(jax.random.PRNGKey(0), DIN, CELL, PROJ)
    x = jax.random.normal(jax.random.PRNGKey(1), (5, 12, DIN))
    ys_s, h_s, c_s = rnn_ops.lstmp_layer(p, x, backend="xla")
    p_tp = elmo_tp.shard_lstmp_params(tp_mesh, p)
    ys_t, h_t, c_t = elmo_tp.lstmp_layer_tp(tp_mesh, p_tp, x)
    np.testing.assert_allclose(np.asarray(ys_t), np.asarray(ys_s),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(h_t), np.asarray(h_s), atol=1e-5)
    np.testing.assert_allclose(np.asarray(c_t), np.asarray(c_s), atol=1e-5)


def test_lstmp_layer_tp_reverse_and_clips(tp_mesh):
    p = rnn_ops.init_lstmp(jax.random.PRNGKey(2), DIN, CELL, PROJ)
    # scale up so the +-3 clips actually bind
    p = jax.tree_util.tree_map(lambda a: a * 3.0, p)
    x = jax.random.normal(jax.random.PRNGKey(3), (3, 9, DIN)) * 2.0
    ys_s, h_s, c_s = rnn_ops.lstmp_layer(p, x, reverse=True, backend="xla")
    p_tp = elmo_tp.shard_lstmp_params(tp_mesh, p)
    ys_t, h_t, c_t = elmo_tp.lstmp_layer_tp(tp_mesh, p_tp, x, reverse=True)
    assert float(jnp.abs(jnp.asarray(ys_s)).max()) <= 3.0  # clips bound
    np.testing.assert_allclose(np.asarray(ys_t), np.asarray(ys_s),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(c_t), np.asarray(c_s), atol=1e-5)


def test_encode_lstmp_tp_matches_serial(tp_mesh):
    cfg = elmo.ElmoLstmpConfig(input_dim=DIN, cell_size=CELL,
                               proj_size=DIN, layers=2)
    params = elmo.init_lstmp_encoder(jax.random.PRNGKey(4), cfg)
    params = {"layers": params["layers"]}
    reps = jax.random.normal(jax.random.PRNGKey(5), (4, 10, DIN))
    lengths = jnp.asarray([10, 7, 4, 2])
    rep_s, pooled_s = elmo.encode_lstmp_from_reps(params, reps, lengths,
                                                  cfg)
    params_tp = elmo_tp.shard_encoder_params(tp_mesh, params)
    rep_t, pooled_t = elmo_tp.encode_lstmp_from_reps_tp(
        tp_mesh, params_tp, reps, lengths, cfg)
    np.testing.assert_allclose(np.asarray(pooled_t), np.asarray(pooled_s),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(rep_t), np.asarray(rep_s),
                               atol=1e-4)
