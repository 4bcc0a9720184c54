"""CLI smoke tests (fast host-side paths; heavy training paths are covered
by the trainer tests and TPU drives)."""

import json

import numpy as np
import pytest

from icassp2022_depression_tpu import cli
from icassp2022_depression_tpu.data import eatd


def test_parser_subcommands():
    p = cli.build_parser()
    for cmd in ("synth-corpus", "extract-audio", "extract-text",
                "extract-daic", "train", "pipeline", "check", "baselines"):
        args = None
        # each subcommand parses with its required args present
    args = p.parse_args(["synth-corpus", "--root", "/tmp/x"])
    assert args.cmd == "synth-corpus" and args.n_data == 20
    args = p.parse_args(["train", "--task", "audio_clf", "--root", "/tmp/x",
                         "--resume-dir", "/tmp/r"])
    assert args.chunk_epochs == 25
    with pytest.raises(SystemExit):
        p.parse_args(["train", "--task", "bogus", "--root", "/tmp/x"])


def test_synth_corpus_command(tmp_path, capsys):
    rc = cli.main(["synth-corpus", "--root", str(tmp_path / "c"),
                   "--n-data", "3", "--n-validation", "1",
                   "--seconds", "0.1"])
    assert rc == 0
    speakers = list(eatd.iter_speakers(tmp_path / "c"))
    assert len(speakers) == 4


def test_baselines_command(tmp_path, capsys):
    root = tmp_path / "c"
    # synthesize features directly (skip the TPU extraction path)
    rng = np.random.default_rng(0)
    n = 20
    y = (rng.random(n) < 0.4).astype(np.int64)
    x = (np.where(y[:, None, None, None] == 1, .5, -.5) +
         rng.standard_normal((n, 3, 1, 16))).astype(np.float32)
    out = root / "Features" / "AudioWhole"
    out.mkdir(parents=True)
    np.savez(out / "whole_samples_clf_256.npz", x)
    np.savez(out / "whole_labels_clf_256.npz", y)
    rc = cli.main(["baselines", "--task", "audio_clf", "--root", str(root),
                   "--model", "dt"])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "f1" in summary


def test_parity_command_parses():
    p = cli.build_parser()
    a = p.parse_args(["parity", "--root", "/tmp/x", "--idx-files",
                      "a.npy", "b.npy", "c.npy"])
    assert a.fn is cli.cmd_parity and len(a.idx_files) == 3
    a = p.parse_args(["parity", "--root", "/tmp/x", "--corpus", "/tmp/x"])
    assert a.corpus == "/tmp/x" and a.segmenter == "auto"
    assert a.elmo_weights == "auto"
    assert set(cli.PARITY_BANDS) == {"audio_f1", "text_f1", "fuse_f1",
                                     "audio_mae", "text_mae"}


def _in_band_report():
    """A report whose every metric mean lands inside PARITY_BANDS."""
    return {
        "audio_f1": [0.60, 0.65, 0.66],   # mean .637 in [0.60, 0.67]
        "text_f1": [0.62, 0.64, 0.66],    # mean .64  in [0.62, 0.67]
        "fuse_f1": [0.64, 0.66, 0.68],    # mean .66  in [0.62, 0.69]
        "audio_mae": [7.9, 8.1, 8.0],     # mean 8.0  <= 8.38 + .5
        "text_mae": [8.0, 8.2, 8.1],      # mean 8.1  <= 8.46 + .5
    }


def test_check_parity_bands_pass_and_fail():
    rc, rows = cli.check_parity_bands(_in_band_report())
    assert rc == 0
    assert len(rows) == 5 and all(r[-1] for r in rows)
    # F1 out of band low, MAE out of band high -> rc 1, rows flagged
    bad = dict(_in_band_report(), audio_f1=[0.30, 0.35, 0.32],
               text_mae=[12.0, 11.0, 13.0])
    rc, rows = cli.check_parity_bands(bad)
    assert rc == 1
    flags = {k: ok for k, _, _, _, ok in rows}
    assert not flags["audio_f1"] and not flags["text_mae"]
    assert flags["text_f1"] and flags["fuse_f1"] and flags["audio_mae"]
    # tolerance edges: F1 +/-0.05, MAE +0.5 beyond the band still passes
    edge = dict(_in_band_report(), fuse_f1=[0.735, 0.74, 0.745],
                audio_mae=[8.88, 8.88, 8.88])
    rc, rows = cli.check_parity_bands(edge)
    assert rc == 0
    # missing metrics are skipped, not failed (partial reports stay usable)
    rc, rows = cli.check_parity_bands({"audio_f1": [0.63, 0.64, 0.65]})
    assert rc == 0 and len(rows) == 1


def test_parity_from_report_cli_both_exit_codes(tmp_path, capsys):
    """The full CLI surface of the acceptance gate: in-band report ->
    PASS + exit 0; out-of-band -> flagged rows + exit 1 (the code the
    driver consumes)."""
    good = tmp_path / "good.json"
    good.write_text(json.dumps(_in_band_report()))
    rc = cli.main(["parity", "--from-report", str(good)])
    out = capsys.readouterr().out
    assert rc == 0
    assert "PARITY: PASS" in out and "FLAG" not in out

    bad = tmp_path / "bad.json"
    bad.write_text(json.dumps(dict(_in_band_report(),
                                   fuse_f1=[0.2, 0.25, 0.3])))
    rc = cli.main(["parity", "--from-report", str(bad)])
    out = capsys.readouterr().out
    assert rc == 1
    assert "PARITY: FAIL" in out and out.count("| FLAG |") == 1


def test_parity_report_markdown_golden():
    """Golden format check: the acceptance table is the BASELINE.md
    markdown layout row-for-row — per-fold values + mean in the
    reference's own style, source citations, PASS/FLAG per banded row,
    info/— for floor-only and unmeasured rows."""
    report = dict(_in_band_report(), audio_f1=[0.30, 0.35, 0.32],
                  fuse_mae=[8.0, 8.1, 7.9])
    del report["text_mae"]
    got = cli.parity_report_markdown(report)
    want = "\n".join([
        "| Metric | This build | Reference | Source (file:line) | Status |",
        "|---|---|---|---|---|",
        "| Audio GRU clf F1, 3 folds | 0.30 / 0.35 / 0.32 (mean ≈ 0.323) "
        "| 0.67 / 0.67 / 0.63 (mean ≈ 0.657); 0.63 / 0.65 / 0.60 "
        "(mean ≈ 0.627) | Classification/fuse_net_whole.py:525; "
        "FuseModelChecking.py:11 | FLAG |",
        "| Text BiLSTM clf F1, 3 folds | 0.62 / 0.64 / 0.66 "
        "(mean ≈ 0.640) | 0.64 / 0.66 / 0.62 (mean ≈ 0.640); "
        "0.67 / 0.66 / 0.66 (mean ≈ 0.663) | "
        "Classification/fuse_net_whole.py:524; FuseModelChecking.py:10 "
        "| PASS |",
        "| Fusion clf F1, 3 folds | 0.64 / 0.66 / 0.68 (mean ≈ 0.660) "
        "| 0.69 / 0.68 / 0.62 (mean ≈ 0.663) | "
        "Classification/FuseModelChecking.py:12 | PASS |",
        "| Audio reg SDS MAE, 3 folds | 7.90 / 8.10 / 8.00 "
        "(mean ≈ 8.000) | 7.60 / 8.38 / 8.25 (mean ≈ 8.077) | "
        "Regression/fuse_net.py:34 | PASS |",
        "| Text reg SDS MAE, 3 folds | (not measured) | "
        "7.75 / 8.46 / 8.01 (mean ≈ 8.073) | Regression/fuse_net.py:33 "
        "| — |",
        "| Fusion reg SDS MAE (save floor < 8.2) | 8.00 / 8.10 / 7.90 "
        "(mean ≈ 8.000) | save floor < 8.2, no published folds | "
        "Regression/fuse_net.py:448 | info |",
    ])
    assert got == want


def test_parity_requires_root_or_report():
    with pytest.raises(SystemExit):
        cli.main(["parity"])


def test_train_on_vggish_features(tmp_path, monkeypatch):
    """extract-audio --embedder vggish -> train --audio-dim 128: the
    alternative-embedder loop closes from the CLI (features load at the
    _128 dim and the model input layer is widened to match)."""
    import json

    import numpy as np

    from icassp2022_depression_tpu import cli
    from icassp2022_depression_tpu import config as C
    from icassp2022_depression_tpu.data import eatd

    eatd.make_synthetic_corpus(tmp_path, n_data=6, n_validation=2,
                               seconds=0.4, seed=7)
    assert cli.main(["extract-audio", "--root", str(tmp_path),
                     "--embedder", "vggish"]) == 0
    monkeypatch.setattr(C, "AUDIO_CLF", C.replace(C.AUDIO_CLF, epochs=3))
    rc = cli.main(["train", "--task", "audio_clf", "--root", str(tmp_path),
                   "--audio-dim", "128", "--seed", "0"])
    assert rc == 0
    logs = (tmp_path / "Model" / "audio_clf_metrics.jsonl").read_text()
    assert logs.strip()  # fold logs were written


def test_train_fused_from_corpus(tmp_path, monkeypatch):
    """train --corpus: the fused extract->train pipeline from the CLI —
    device-resident wav2vlad features straight into the trainer, no
    features npz ever written, and the run must equal training on the
    same features extracted through the persisted-npz path."""
    from icassp2022_depression_tpu import cli
    from icassp2022_depression_tpu import config as C
    from icassp2022_depression_tpu.data import eatd

    eatd.make_synthetic_corpus(tmp_path, n_data=6, n_validation=2,
                               seconds=0.4, seed=3)
    monkeypatch.setattr(C, "AUDIO_CLF", C.replace(C.AUDIO_CLF, epochs=3))
    rc = cli.main(["train", "--task", "audio_clf", "--root", str(tmp_path),
                   "--corpus", str(tmp_path), "--seed", "0"])
    assert rc == 0
    assert not (tmp_path / "Features").exists()  # no npz artifacts
    fused_logs = (tmp_path / "Model" /
                  "audio_clf_metrics.jsonl").read_text()
    assert fused_logs.strip()

    # same corpus through extract-audio -> train must log identical folds
    other = tmp_path / "two_step"
    eatd.make_synthetic_corpus(other, n_data=6, n_validation=2,
                               seconds=0.4, seed=3)
    assert cli.main(["extract-audio", "--root", str(other)]) == 0
    rc = cli.main(["train", "--task", "audio_clf", "--root", str(other),
                   "--seed", "0"])
    assert rc == 0
    import json

    def records(text):
        return [{k: v for k, v in json.loads(ln).items() if k != "time"}
                for ln in text.strip().splitlines()]

    two_step_logs = (other / "Model" /
                     "audio_clf_metrics.jsonl").read_text()
    assert records(two_step_logs) == records(fused_logs)

    # guardrail: non-256 dims reject --corpus on audio tasks
    import pytest
    with pytest.raises(SystemExit):
        cli.main(["train", "--task", "audio_reg", "--root", str(tmp_path),
                  "--corpus", str(tmp_path), "--audio-dim", "128"])


def test_train_fused_text_from_corpus(tmp_path, monkeypatch):
    """train --task text_clf --corpus: the fused TEXT pipeline —
    device-resident embeddings straight into the trainer, no npz, equal
    to the two-step extract-text -> train run, with embedder provenance
    carried into the checkpoint sidecar."""
    from icassp2022_depression_tpu import cli
    from icassp2022_depression_tpu import config as C
    from icassp2022_depression_tpu.data import eatd
    from icassp2022_depression_tpu.train import checkpoints

    monkeypatch.setattr(C, "TEXT_CLF", C.replace(
        C.TEXT_CLF, epochs=4,
        gate=C.GateConfig(f1_floor=-1.0, train_acc_frac=0.0)))

    def records(root):
        return [{k: v for k, v in json.loads(ln).items() if k != "time"}
                for ln in (root / "Model" / "text_clf_metrics.jsonl")
                .read_text().strip().splitlines()]

    fused_root = tmp_path / "fused"
    eatd.make_synthetic_corpus(fused_root, n_data=6, n_validation=2,
                               seconds=0.2, seed=9)
    assert cli.main(["train", "--task", "text_clf", "--root",
                     str(fused_root), "--corpus", str(fused_root),
                     "--seed", "0"]) == 0
    assert not (fused_root / "Features").exists()

    two_root = tmp_path / "two_step"
    eatd.make_synthetic_corpus(two_root, n_data=6, n_validation=2,
                               seconds=0.2, seed=9)
    assert cli.main(["extract-text", "--root", str(two_root)]) == 0
    assert cli.main(["train", "--task", "text_clf", "--root",
                     str(two_root), "--seed", "0"]) == 0
    assert records(two_root) == records(fused_root)

    # provenance: fused checkpoints carry the embedder id like the
    # sidecar-threaded two-step path (floor=-1 gate -> ckpts MUST exist)
    text_dir = fused_root / "Model" / "ClassificationWhole" / "Text"
    ck = [p for p in sorted(text_dir.glob("*.npz"))
          if not p.name.startswith("train_idxs")]
    assert ck
    meta = checkpoints.load_meta(str(ck[0]))
    assert meta.get("text_embedder")

    # check --corpus closes the no-npz loop for TEXT checkpoints too
    def fold_of(p):
        return int(p.stem.rsplit("_", 1)[1])

    idx = sorted(text_dir.glob("train_idxs_*.npy"), key=fold_of)
    ck = sorted(ck, key=fold_of)
    assert cli.main(["check", "--task", "text_clf", "--root",
                     str(fused_root), "--corpus", str(fused_root),
                     "--ckpts", *(str(p)[:-4] for p in ck),
                     "--idx-files", *(str(p) for p in idx)]) == 0
    assert not (fused_root / "Features").exists()


def test_predict_cli_vggish_embedder(tmp_path, capsys):
    """predict --audio-embedder vggish serves a 128-d checkpoint on
    vggish features from the CLI."""
    import json

    import jax

    from icassp2022_depression_tpu import cli
    from icassp2022_depression_tpu import config as C
    from icassp2022_depression_tpu.data import eatd
    from icassp2022_depression_tpu.models import audio_net
    from icassp2022_depression_tpu.train import checkpoints

    eatd.make_synthetic_corpus(tmp_path, n_data=2, n_validation=0,
                               seconds=1.2, seed=11)
    mcfg = C.replace(C.AUDIO_CLF.model, embedding_size=128)
    ckpt = tmp_path / "gru_vggish_0.70_1"
    checkpoints.save(ckpt, audio_net.init(jax.random.PRNGKey(0), mcfg))
    rc = cli.main(["predict", "--task", "audio_clf", "--root",
                   str(tmp_path), "--ckpt", str(ckpt), "--speaker",
                   "Data/1", "--audio-embedder", "vggish"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["label"] in (0, 1)


def test_pipeline_fused_corpus_matches_two_step(tmp_path, monkeypatch,
                                                capsys):
    """pipeline --corpus (FULLY fused: both modalities device-resident)
    must print the same per-task fold summary as the two-step
    extract-audio + extract-text -> pipeline run, with zero persisted
    feature artifacts on the fused path."""
    from icassp2022_depression_tpu import config as C

    for name in ("AUDIO_CLF", "TEXT_CLF"):
        base = getattr(C, name)
        monkeypatch.setattr(C, name, C.replace(base, epochs=3))
    base = C.FUSE_CLF_TRAINER
    monkeypatch.setattr(C, "FUSE_CLF_TRAINER", C.replace(base, epochs=3))

    def run(root, fused):
        eatd.make_synthetic_corpus(root, n_data=6, n_validation=2,
                                   seconds=0.4, seed=11)
        argv = ["pipeline", "--track", "clf", "--root", str(root),
                "--seed", "0"]
        if fused:
            argv += ["--corpus", str(root)]
        else:
            assert cli.main(["extract-audio", "--root", str(root)]) == 0
            assert cli.main(["extract-text", "--root", str(root)]) == 0
        assert cli.main(argv) == 0
        return json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    fused = run(tmp_path / "fused", fused=True)
    assert not (tmp_path / "fused" / "Features").exists()
    two_step = run(tmp_path / "two_step", fused=False)
    assert fused == two_step


def test_check_corpus_closes_the_no_npz_loop(tmp_path, monkeypatch,
                                             capsys):
    """train --corpus -> check --corpus: the whole train+check loop runs
    straight from a raw corpus with no Features/ npz ever written, and
    checking reproduces the training-time best F1 exactly (same fused
    extraction math/ordinals both times)."""
    from icassp2022_depression_tpu import config as C

    eatd.make_synthetic_corpus(tmp_path, n_data=6, n_validation=2,
                               seconds=0.4, seed=3)
    monkeypatch.setattr(C, "AUDIO_CLF", C.replace(
        C.AUDIO_CLF, epochs=6,
        optimizer=C.replace(C.AUDIO_CLF.optimizer, learning_rate=3e-2),
        gate=C.GateConfig(f1_floor=-1.0, train_acc_frac=0.0)))
    assert cli.main(["train", "--task", "audio_clf", "--root",
                     str(tmp_path), "--corpus", str(tmp_path),
                     "--seed", "0"]) == 0
    capsys.readouterr()
    model_dir = tmp_path / "Model" / "ClassificationWhole" / "Audio"

    def fold_of(p):
        return int(p.stem.rsplit("_", 1)[1])

    idx = sorted(model_dir.glob("train_idxs_*.npy"), key=fold_of)
    ckpts = sorted((p for p in model_dir.glob("*.npz")
                    if not p.name.startswith("train_idxs")), key=fold_of)
    assert len(ckpts) == 3 and len(idx) == 3
    assert not (tmp_path / "Features").exists()

    rc = cli.main(["check", "--task", "audio_clf", "--root", str(tmp_path),
                   "--corpus", str(tmp_path),
                   "--ckpts", *(str(p)[:-4] for p in ckpts),
                   "--idx-files", *(str(p) for p in idx)])
    assert rc == 0
    out = [json.loads(l) for l in capsys.readouterr().out.strip()
           .splitlines()]
    trained = {}
    for line in (tmp_path / "Model" /
                 "audio_clf_metrics.jsonl").read_text().splitlines():
        rec = json.loads(line)
        if rec.get("event") == "fold_best":
            trained[rec["fold"]] = rec["f1"]
    checked = {r["fold"]: r["f1"] for r in out if "fold" in r}
    assert checked.keys() == trained.keys()
    for fold, f1 in checked.items():
        if np.isnan(f1):
            # a 0/0-degenerate fold admitted only by this test's floor=-1
            # gate: host checking propagates the reference's nan
            # (eval/metrics.py classification_metrics), the device gate
            # guards to 0.0 — both mean "no positive predictions"
            assert trained[fold] == 0.0
        else:
            assert abs(f1 - trained[fold]) < 1e-6
    # the metric-reproduction claim needs at least one non-degenerate fold
    assert any(not np.isnan(f1) for f1 in checked.values())
    assert not (tmp_path / "Features").exists()


def test_doctor_command(capsys):
    """`doctor` prints one JSON report line; the probe runs on whatever
    backend is live (CPU here) and the static facts are always present."""
    rc = cli.main(["doctor", "--probe-mb", "0.25", "--reps", "2"])
    assert rc == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["backend"] == "cpu" and len(rep["devices"]) == 8
    assert rep["relay"]["reps"] == 2 and rep["relay"]["up_mb_s"] > 0
    assert rep["compile_cache"]["dir"]

    rc = cli.main(["doctor", "--no-probe"])
    assert rc == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "relay" not in rep and rep["torch"]


def test_warmup_command_audio_buckets_only(capsys):
    """`warmup --skip-text --skip-train` compiles the audio length-bucket
    programs and reports one JSON line per stage plus a `done` total."""
    rc = cli.main(["warmup", "--skip-text", "--skip-train",
                   "--min-seconds", "0.25", "--max-seconds", "0.5"])
    assert rc == 0
    lines = [json.loads(l) for l in capsys.readouterr().out.strip()
             .splitlines() if l.startswith("{")]
    stages = {l["warmup"]: l for l in lines if "warmup" in l}
    assert stages["audio_buckets"]["buckets"] == 2
    assert stages["done"]["total_s"] >= stages["audio_buckets"]["seconds"]


def test_synthetic_corpus_duration_range(tmp_path):
    """seconds=(lo, hi) draws per-utterance durations uniformly so warmup
    touches several extraction length buckets; a scalar stays exact."""
    eatd.make_synthetic_corpus(tmp_path, n_data=4, n_validation=0,
                               seconds=(0.1, 0.4), seed=0)
    lengths = {len(w) for s in eatd.iter_speakers(tmp_path, splits=("Data",))
               for w in s.waveforms}
    assert len(lengths) > 1
    assert all(16000 * 0.1 <= n <= 16000 * 0.4 for n in lengths)
