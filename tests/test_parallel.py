"""Multi-device tests on the 8-device virtual CPU mesh: sharded training
must produce the same numbers as single-device training."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from icassp2022_depression_tpu import config as C
from icassp2022_depression_tpu.models import audio_net
from icassp2022_depression_tpu.ops.nn import masked_cross_entropy_on_probs
from icassp2022_depression_tpu.parallel import collectives, mesh as mesh_lib
from icassp2022_depression_tpu.train import loop, optim

CFG = C.replace(C.AUDIO_CLF.model, embedding_size=16, hidden_dims=16)
OPT = C.replace(C.AUDIO_CLF.optimizer, learning_rate=1e-3)


def _fns():
    def train_loss(params, xs, y, mask, key):
        pred = audio_net.apply(params, CFG, xs[0], train=True, key=key)
        return masked_cross_entropy_on_probs(pred, y.astype(jnp.int32), mask,
                                             CFG.num_classes), pred

    def eval_fn(params, xs):
        return audio_net.apply(params, CFG, xs[0], train=False)

    return train_loss, eval_fn


def test_mesh_shapes():
    assert len(jax.devices()) == 8, "conftest must provide 8 CPU devices"
    m = mesh_lib.make_mesh(8)
    assert m.shape == {"data": 8, "model": 1}
    m2 = mesh_lib.make_mesh(8, model_parallel=2)
    assert m2.shape == {"data": 4, "model": 2}


def test_dp_step_matches_single_device():
    m = mesh_lib.make_mesh(8)
    params = audio_net.init(jax.random.PRNGKey(0), CFG)
    optimizer = optim.build(OPT, params)
    opt_state = optimizer.init(params)
    train_loss, _ = _fns()

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((16, 3, 16)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, 2, 16))
    mask = jnp.ones(16, jnp.float32)
    key = jax.random.PRNGKey(1)

    # NOTE: dropout draws differ between sharded/unsharded programs, so
    # compare with dropout disabled (train path minus randomness)
    cfg_nodrop = C.replace(CFG, dropout=0.0)

    def loss_nodrop(params, xs, yb, mb, k):
        pred = audio_net.apply(params, cfg_nodrop, xs[0], train=False)
        return masked_cross_entropy_on_probs(pred, yb.astype(jnp.int32), mb,
                                             CFG.num_classes), pred

    step = collectives.dp_train_step(loss_nodrop, optimizer, m)
    p_dp, s_dp, loss_dp, pred_dp = step(params, opt_state, key, (x,), y, mask)

    (loss_ref, _), grads = jax.value_and_grad(loss_nodrop, has_aux=True)(
        params, (x,), y, mask, key)
    import optax
    updates, s_ref = optimizer.update(grads, opt_state, params)
    p_ref = optax.apply_updates(params, updates)

    assert float(loss_dp) == pytest.approx(float(loss_ref), abs=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p_dp),
                    jax.tree_util.tree_leaves(p_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_sharded_fold_runner_matches_unsharded():
    """The full compiled fold program under jit-with-shardings on the
    8-device mesh must reproduce the single-device run exactly."""
    m = mesh_lib.make_mesh(8)
    rng = np.random.default_rng(1)
    n = 40
    y = (rng.random(n) < 0.4).astype(np.int64)
    x = (np.where(y[:, None, None] == 1, .5, -.5) +
         rng.standard_normal((n, 3, 16))).astype(np.float32)
    xtr, ytr = x[:32], y[:32]
    xte, yte = x[32:], y[32:]

    data = loop.make_fold_data([xtr], ytr, [xte], yte, batch_size=8)
    params = audio_net.init(jax.random.PRNGKey(2), CFG)
    optimizer = optim.build(OPT, params)
    opt_state = optimizer.init(params)
    train_loss, eval_fn = _fns()
    gate = C.AUDIO_CLF.gate
    run = loop.make_fold_runner(train_loss, eval_fn, optimizer,
                                "classification", gate, epochs=6, jit=False)
    key = jax.random.PRNGKey(3)

    # single device
    _, _, _, best_1, logs_1 = jax.jit(run)(params, opt_state, data, key)

    # sharded: batch rows over 'data', params/opt replicated
    shardings = mesh_lib.fold_data_shardings(m, data)
    data_sharded = loop.FoldData(
        train_x=tuple(jax.device_put(a, s) for a, s in
                      zip(data.train_x, shardings.train_x)),
        train_y=jax.device_put(data.train_y, shardings.train_y),
        train_mask=jax.device_put(data.train_mask, shardings.train_mask),
        test_x=tuple(jax.device_put(a, s) for a, s in
                     zip(data.test_x, shardings.test_x)),
        test_y=jax.device_put(data.test_y, shardings.test_y),
        test_mask=jax.device_put(data.test_mask, shardings.test_mask))
    _, _, _, best_8, logs_8 = jax.jit(run)(params, opt_state, data_sharded, key)

    np.testing.assert_allclose(np.asarray(logs_1["f1"]),
                               np.asarray(logs_8["f1"]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(logs_1["loss"]),
                               np.asarray(logs_8["loss"]), atol=1e-4)
    assert float(best_1["f1"]) == pytest.approx(float(best_8["f1"]), abs=1e-5)


def test_dp_step_dropout_differs_per_shard():
    """The replicated PRNG key must be folded with the shard index, or all
    shards draw identical dropout masks (fixed in collectives.dp_train_step)."""
    m = mesh_lib.make_mesh(8)
    cfg_drop = C.replace(CFG, dropout=0.9)  # aggressive dropout -> visible
    params = audio_net.init(jax.random.PRNGKey(0), cfg_drop)
    optimizer = optim.build(OPT, params)
    opt_state = optimizer.init(params)

    def loss_drop(p, xs, yb, mb, k):
        pred = audio_net.apply(p, cfg_drop, xs[0], train=True, key=k)
        from icassp2022_depression_tpu.ops.nn import (
            masked_cross_entropy_on_probs,
        )
        return masked_cross_entropy_on_probs(pred, yb.astype(jnp.int32), mb,
                                             2), pred

    step = collectives.dp_train_step(loss_drop, optimizer, m)
    # identical inputs on every shard: if keys were shared, per-shard preds
    # would be identical too
    x = jnp.tile(jnp.asarray(np.random.default_rng(0)
                             .standard_normal((1, 3, 16))
                             .astype(np.float32)), (16, 1, 1))
    y = jnp.zeros(16, jnp.int32)
    mask = jnp.ones(16, jnp.float32)
    _, _, _, pred = step(params, opt_state, jax.random.PRNGKey(7),
                         (x,), y, mask)
    pred = np.asarray(pred).reshape(8, 2, 2)  # [shards, rows, classes]
    # at least one pair of shards must differ (independent dropout draws)
    diffs = [not np.allclose(pred[i], pred[0]) for i in range(1, 8)]
    assert any(diffs), "all shards drew identical dropout masks"


def test_param_shardings_tp_spec():
    m = mesh_lib.make_mesh(8, model_parallel=2)
    params = audio_net.init(jax.random.PRNGKey(0), CFG)
    shardings = mesh_lib.param_shardings(m, params)
    s = shardings["rnn"][0]["fwd"]["w_ih"]
    assert s.spec == jax.sharding.PartitionSpec("model", None)
    assert shardings["ln"]["w"].spec == jax.sharding.PartitionSpec()
    # placing params with TP shardings must succeed on the mesh
    placed = jax.tree_util.tree_map(jax.device_put, params, shardings)
    out = audio_net.apply(placed, CFG, jnp.zeros((8, 3, 16)))
    assert out.shape == (8, 2)


def test_dp_train_step_fully_masked_batch_is_noop():
    """The exact-no-op invariant holds in the DP shard_map step too: a
    fully-masked (padding) batch must not move params, advance the Adam
    step count, or apply decoupled weight decay."""
    import optax

    from icassp2022_depression_tpu.parallel import collectives, mesh as mesh_mod

    m = mesh_mod.make_mesh(4, model_parallel=1)

    def loss_fn(p, xs, y, mask, key):
        pred = xs @ p["w"]
        per = (pred.squeeze(-1) - y) ** 2
        return jnp.sum(per * mask) / jnp.maximum(jnp.sum(mask), 1.0), pred

    opt = optax.adamw(1e-2, weight_decay=1e-2)
    params = {"w": jnp.ones((8, 1))}
    opt_state = opt.init(params)
    step = collectives.dp_train_step(loss_fn, opt, m)
    xs = jnp.ones((8, 8))
    y = jnp.zeros((8,))
    key = jax.random.PRNGKey(0)

    p2, os2, loss, _ = step(params, opt_state, key, xs, y,
                            jnp.zeros((8,)))   # all-masked
    np.testing.assert_array_equal(np.asarray(p2["w"]),
                                  np.asarray(params["w"]))
    assert int(jax.tree_util.tree_leaves(
        [s for s in jax.tree_util.tree_leaves(os2)
         if np.asarray(s).ndim == 0])[0]) == 0  # Adam count unmoved
    assert float(loss) == 0.0
    # a real batch does move them
    p3, os3, loss3, _ = step(params, opt_state, key, xs, y,
                             jnp.ones((8,)))
    assert not np.array_equal(np.asarray(p3["w"]), np.asarray(params["w"]))
