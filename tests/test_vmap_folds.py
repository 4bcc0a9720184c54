"""Cross-fold vmap training must reproduce the serial per-fold results."""

import numpy as np
import pytest

from icassp2022_depression_tpu import config as C
from icassp2022_depression_tpu.data import folds
from icassp2022_depression_tpu.models import audio_net
from icassp2022_depression_tpu.train import trainers

CFG = C.replace(
    C.AUDIO_CLF,
    model=C.replace(C.AUDIO_CLF.model, embedding_size=16, hidden_dims=16),
    optimizer=C.replace(C.AUDIO_CLF.optimizer, learning_rate=5e-3),
    epochs=12,
)


def test_vmapped_folds_match_serial():
    rng = np.random.default_rng(0)
    n = 30
    y = (rng.random(n) < 0.35).astype(np.int64)
    x = (np.where(y[:, None, None] == 1, .8, -.8) +
         rng.standard_normal((n, 3, 16))).astype(np.float32)
    tf_idx = folds.generate_clf_folds(y, 3, seed=0)
    datas = trainers._clf_fold_datas([x], y, tf_idx, CFG.batch_size)

    serial = trainers._run_folds(audio_net, CFG, datas, seed=5)
    vmapped = trainers._run_folds(audio_net, CFG, datas, seed=5,
                                  vmap_folds=True)
    assert len(serial) == len(vmapped) == 3
    for s, v in zip(serial, vmapped):
        np.testing.assert_allclose(v["logs"]["loss"], s["logs"]["loss"],
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(v["logs"]["f1"], s["logs"]["f1"],
                                   atol=1e-5)
        assert v["best"]["f1"] == pytest.approx(s["best"]["f1"], abs=1e-5)
        assert v["best"]["epoch"] == s["best"]["epoch"]


def test_fold_parallel_through_public_trainer(tmp_path):
    """vmapped + fold-sharded (one device per fold on the 8-device mesh)
    through the PUBLIC trainer API must equal the serial results."""
    rng = np.random.default_rng(1)
    n = 30
    y = (rng.random(n) < 0.35).astype(np.int64)
    x = (np.where(y[:, None, None] == 1, .8, -.8) +
         rng.standard_normal((n, 3, 16))).astype(np.float32)
    tf_idx = folds.generate_clf_folds(y, 3, seed=0)

    serial = trainers.train_audio_clf(x, y, tf_idx, CFG, seed=3)
    sharded = trainers.train_audio_clf(x, y, tf_idx, CFG, seed=3,
                                       vmap_folds=True, fold_parallel=True,
                                       out_dir=tmp_path)
    for s, v in zip(serial, sharded):
        np.testing.assert_allclose(v["logs"]["f1"], s["logs"]["f1"],
                                   atol=1e-5)
        assert v["best"]["f1"] == pytest.approx(s["best"]["f1"], abs=1e-5)
        assert v["best"]["epoch"] == s["best"]["epoch"]
    # gated-save artifacts work on the fold-parallel path too
    gated = [r for r in sharded if r["best"]["epoch"] >= 0]
    assert len(list(tmp_path.glob("train_idxs_*.npy"))) == len(gated)


def test_fuse_reg_vmap_matches_serial():
    import jax

    from icassp2022_depression_tpu.models import audio_net, text_net

    rng = np.random.default_rng(2)
    n = 30
    scores = (40 + 20 * (rng.random(n) < 0.3) +
              rng.standard_normal(n)).astype(np.float32)
    xa = rng.standard_normal((n, 3, 16)).astype(np.float32)
    xt = rng.standard_normal((n, 3, 24)).astype(np.float32)
    dep, non = folds.generate_reg_shuffles(scores, seed=0)

    fcfg = C.replace(C.FUSE_REG, audio_embed_size=16, text_embed_size=24,
                     audio_hidden_dims=8, text_hidden_dims=8)
    tcfg = C.replace(
        C.FUSE_REG_TRAINER, epochs=8,
        optimizer=C.replace(C.FUSE_REG_TRAINER.optimizer,
                            learning_rate=1e-2))
    acfg = C.replace(C.AUDIO_REG.model, embedding_size=16, hidden_dims=8)
    tecfg = C.replace(C.TEXT_REG.model, embedding_size=24, hidden_dims=8)
    branch = []
    for fold in range(3):
        ka = jax.random.fold_in(jax.random.PRNGKey(10), fold)
        kt = jax.random.fold_in(jax.random.PRNGKey(20), fold)
        branch.append((text_net.init(kt, tecfg), audio_net.init(ka, acfg)))

    kw = dict(fcfg=fcfg, tcfg=tcfg, seed=4,
              fold_cfg=C.FoldConfig(reg_test_dep=2, reg_test_non=7,
                                    reg_augment_first_n=3))
    serial = trainers.train_fuse_reg(xa, xt, scores, dep, non, branch, **kw)
    vmapped = trainers.train_fuse_reg(xa, xt, scores, dep, non, branch,
                                      vmap_folds=True, **kw)
    for s, v in zip(serial, vmapped):
        np.testing.assert_allclose(v["logs"]["mae"], s["logs"]["mae"],
                                   rtol=1e-4, atol=1e-4)
        assert v["best"]["mae"] == pytest.approx(s["best"]["mae"],
                                                 abs=1e-4)


def test_fuse_clf_vmap_raises():
    import jax

    from icassp2022_depression_tpu.models import audio_net, text_net

    rng = np.random.default_rng(3)
    n = 24
    y = (rng.random(n) < 0.4).astype(np.int64)
    xa = rng.standard_normal((n, 3, 16)).astype(np.float32)
    xt = rng.standard_normal((n, 3, 24)).astype(np.float32)
    tf_idx = folds.generate_clf_folds(y, 3, seed=0)
    fcfg = C.replace(C.FUSE_CLF, audio_embed_size=16, text_embed_size=24,
                     audio_hidden_dims=8, text_hidden_dims=8)
    acfg = C.replace(C.AUDIO_CLF.model, embedding_size=16, hidden_dims=8)
    tecfg = C.replace(C.TEXT_CLF.model, embedding_size=24, hidden_dims=8)
    branch = [(text_net.init(jax.random.PRNGKey(i), tecfg),
               audio_net.init(jax.random.PRNGKey(10 + i), acfg))
              for i in range(3)]
    with pytest.raises(ValueError, match="sequential"):
        trainers.train_fuse_clf(xa, xt, y, tf_idx, branch, fcfg=fcfg,
                                vmap_folds=True)


def test_cli_fold_flags_parse():
    from icassp2022_depression_tpu import cli

    p = cli.build_parser()
    a = p.parse_args(["train", "--task", "audio_clf", "--root", "/tmp/x",
                      "--fold-parallel"])
    assert a.fold_parallel and not a.vmap_folds
    a = p.parse_args(["pipeline", "--track", "reg", "--root", "/tmp/x",
                      "--vmap-folds"])
    assert a.vmap_folds
