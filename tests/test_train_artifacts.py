"""Gated-save artifacts: winning train-idx dumps + self-describing
sidecars, round-tripped into the checking harness.

The reference re-saves the fold's train indices on gate fire
(``Classification/audio_gru_whole.py:240``) and downstream scripts load
those exact files (``:261-263``); this pins the same ecosystem here:
``train`` emits ``train_idxs_{f1:.2f}_{fold}.npy`` next to the gated
checkpoint and ``check --idx-files`` consumes them.
"""

from pathlib import Path

import numpy as np

from icassp2022_depression_tpu import config as C
from icassp2022_depression_tpu.data import folds
from icassp2022_depression_tpu.eval import checking
from icassp2022_depression_tpu.train import checkpoints, trainers

TCFG = C.replace(
    C.AUDIO_CLF,
    model=C.replace(C.AUDIO_CLF.model, embedding_size=16, hidden_dims=8),
    optimizer=C.replace(C.AUDIO_CLF.optimizer, learning_rate=5e-2),
    epochs=15,
)


def _separable(n=24, d=16, seed=0):
    rng = np.random.default_rng(seed)
    targets = (rng.random(n) < 0.4).astype(np.int64)
    sign = np.where(targets[:, None, None] == 1, 1.0, -1.0)
    x = (0.8 * sign + rng.standard_normal((n, 3, d))).astype(np.float32)
    return x, targets


def test_gated_save_emits_idx_artifacts_and_sidecar(tmp_path):
    x, y = _separable()
    train_folds = folds.generate_clf_folds(y, 3, seed=0)
    results = trainers.train_audio_clf(x, y, train_folds, TCFG,
                                       out_dir=tmp_path, seed=0)
    gated = [r for r in results if r["best"]["epoch"] >= 0]
    assert gated, "gate never fired on separable data"

    idx_files = sorted(tmp_path.glob("train_idxs_*.npy"))
    assert len(idx_files) == len(gated)
    ckpts = sorted(tmp_path.glob("*.npz"))
    assert len(ckpts) == len(gated)

    for r in gated:
        f1, fold = r["best"]["f1"], r["fold"]
        path = tmp_path / f"train_idxs_{f1:.2f}_{fold}.npy"
        assert path.exists()
        np.testing.assert_array_equal(folds.load_index_file(path),
                                      train_folds[fold - 1])
        # sidecar is self-describing: task/seed/fold/train_idx + metrics
        ckpt = next(p for p in ckpts if p.stem.endswith(f"_{r['fold']}"))
        meta = checkpoints.load_meta(str(ckpt))
        assert meta["task"] == "audio_clf"
        assert meta["seed"] == 0
        assert meta["fold"] in (1, 2, 3)
        assert "f1" in meta and "train_idx" in meta
        np.testing.assert_array_equal(
            np.asarray(meta["train_idx"]),
            train_folds[meta["fold"] - 1])


def test_emitted_idx_files_round_trip_into_checking(tmp_path):
    """check --idx-files consumes exactly what train emitted."""
    x, y = _separable()
    train_folds = folds.generate_clf_folds(y, 3, seed=0)
    results = trainers.train_audio_clf(x, y, train_folds, TCFG,
                                       out_dir=tmp_path, seed=0)
    gated = [r for r in results if r["best"]["epoch"] >= 0]
    idx_files = sorted(tmp_path.glob("train_idxs_*.npy"),
                       key=lambda p: int(p.stem.rsplit("_", 1)[1]))
    ckpts = sorted(tmp_path.glob("*.npz"),
                   key=lambda p: int(p.stem.rsplit("_", 1)[1]))
    loaded_folds = [folds.load_index_file(p) for p in idx_files]
    res, summary = checking.check_audio_clf(
        x, y, loaded_folds, [Path(str(p)[:-4]) for p in ckpts],
        mcfg=TCFG.model)
    assert len(res) == len(gated)
    # the recomputed best-epoch F1 matches what training recorded
    for r_chk, r_tr in zip(res, sorted(gated, key=lambda r: r["fold"])):
        assert abs(r_chk["f1"] - r_tr["best"]["f1"]) < 1e-6


def test_text_embedder_provenance_flows_to_checkpoint(tmp_path):
    """extract-text records which embedder produced the features; the
    trained checkpoint sidecar carries it (a text model is only servable
    with the same embedder)."""
    import json

    from icassp2022_depression_tpu.data import eatd
    from icassp2022_depression_tpu.frontend import text as text_fe

    corpus = tmp_path / "corpus"
    eatd.make_synthetic_corpus(corpus, n_data=2, n_validation=0,
                               seconds=0.2)
    out = tmp_path / "TextWhole"
    text_fe.extract_eatd(corpus, out_dir=out, elmo_weights=None)
    meta = json.loads((out / "extraction_meta.json").read_text())
    assert meta["embedder"].startswith("prng:")
    assert meta["output_dim"] == 1024

    x, y = _separable(d=16)
    tf = folds.generate_clf_folds(y, 3, seed=0)
    tcfg = C.replace(
        C.TEXT_CLF, epochs=10,
        model=C.replace(C.TEXT_CLF.model, embedding_size=16, hidden_dims=8),
        optimizer=C.replace(C.TEXT_CLF.optimizer, learning_rate=5e-2))
    results = trainers.train_text_clf(
        x, y, tf, tcfg, out_dir=tmp_path / "m", seed=0,
        meta_extras={"text_embedder": meta["embedder"]})
    gated = [r for r in results if r["best"]["epoch"] >= 0]
    if gated:  # gate may or may not fire; when it does, provenance lands
        ckpt = next((tmp_path / "m").glob("*.npz"))
        side = checkpoints.load_meta(str(ckpt))
        assert side["text_embedder"].startswith("prng:")
