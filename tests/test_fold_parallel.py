"""Fold-parallel execution: 3 folds sharded over 3 devices must match the
serial per-fold results."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from icassp2022_depression_tpu import config as C
from icassp2022_depression_tpu.data import folds
from icassp2022_depression_tpu.models import audio_net
from icassp2022_depression_tpu.parallel import distributed
from icassp2022_depression_tpu.train import loop, optim, trainers

CFG = C.replace(
    C.AUDIO_CLF,
    model=C.replace(C.AUDIO_CLF.model, embedding_size=16, hidden_dims=16),
    optimizer=C.replace(C.AUDIO_CLF.optimizer, learning_rate=5e-3),
    epochs=10,
)


def test_fold_sharded_matches_serial():
    rng = np.random.default_rng(0)
    n = 30
    y = (rng.random(n) < 0.35).astype(np.int64)
    x = (np.where(y[:, None, None] == 1, .8, -.8) +
         rng.standard_normal((n, 3, 16))).astype(np.float32)
    tf_idx = folds.generate_clf_folds(y, 3, seed=0)
    datas = trainers._clf_fold_datas([x], y, tf_idx, CFG.batch_size)

    serial = trainers._run_folds(audio_net, CFG, datas, seed=2)

    # fold-parallel: stacked fold axis sharded over a 3-device mesh
    mesh = distributed.fold_mesh(3)
    params_list = [audio_net.init(
        jax.random.fold_in(jax.random.PRNGKey(2), i), CFG.model)
        for i in range(1, 4)]
    optimizer = optim.build(CFG.optimizer, params_list[0])
    opt_list = [optimizer.init(p) for p in params_list]
    stack = lambda *ls: jnp.stack(ls)
    sp = distributed.shard_over_folds(
        mesh, jax.tree_util.tree_map(stack, *params_list))
    so = distributed.shard_over_folds(
        mesh, jax.tree_util.tree_map(stack, *opt_list))
    sd = distributed.shard_over_folds(mesh, loop.stack_fold_data(datas))
    keys = distributed.shard_over_folds(
        mesh, jnp.stack([jax.random.fold_in(jax.random.PRNGKey(1002), i)
                         for i in range(1, 4)]))

    train_loss, eval_fn = trainers._branch_fns(audio_net, CFG.model, CFG)
    run = loop.make_multi_fold_runner(train_loss, eval_fn, optimizer,
                                      CFG.track, CFG.gate, CFG.epochs)
    _, _, _, best, logs = run(sp, so, sd, keys)
    best, logs = jax.device_get((best, logs))

    for i, s in enumerate(serial):
        np.testing.assert_allclose(logs["f1"][i], s["logs"]["f1"], atol=1e-5)
        np.testing.assert_allclose(logs["loss"][i], s["logs"]["loss"],
                                   rtol=1e-4, atol=1e-4)
        assert float(best["f1"][i]) == pytest.approx(s["best"]["f1"],
                                                     abs=1e-5)


def test_initialize_single_process_noop(monkeypatch):
    monkeypatch.setenv("JAX_NUM_PROCESSES", "1")
    distributed.initialize()  # must not raise or attempt coordination


def test_fold_by_data_2d_mesh_matches_serial():
    """3 folds x 2-way in-fold DP on a (fold, data) mesh through the
    public trainer API must equal the serial results (6 of the 8 virtual
    devices)."""
    rng = np.random.default_rng(4)
    n = 30
    y = (rng.random(n) < 0.35).astype(np.int64)
    x = (np.where(y[:, None, None] == 1, .8, -.8) +
         rng.standard_normal((n, 3, 16))).astype(np.float32)
    tf_idx = folds.generate_clf_folds(y, 3, seed=0)

    serial = trainers.train_audio_clf(x, y, tf_idx, CFG, seed=7)
    sharded = trainers.train_audio_clf(x, y, tf_idx, CFG, seed=7,
                                       vmap_folds=True, fold_parallel=True,
                                       data_parallel=2)
    for s, v in zip(serial, sharded):
        np.testing.assert_allclose(v["logs"]["f1"], s["logs"]["f1"],
                                   atol=1e-5)
        np.testing.assert_allclose(v["logs"]["loss"], s["logs"]["loss"],
                                   rtol=1e-4, atol=1e-4)
        assert float(v["best"]["f1"]) == pytest.approx(s["best"]["f1"],
                                                       abs=1e-5)


def test_fold_data_mesh_shape():
    mesh = distributed.fold_data_mesh(3, 2)
    assert dict(mesh.shape) == {"fold": 3, "data": 2}
    with pytest.raises(AssertionError):
        distributed.fold_data_mesh(3, 3)   # 9 > 8 virtual devices
