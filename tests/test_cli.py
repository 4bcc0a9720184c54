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
    assert set(cli.PARITY_BANDS) == {"audio_f1", "text_f1", "fuse_f1",
                                     "audio_mae", "text_mae"}
