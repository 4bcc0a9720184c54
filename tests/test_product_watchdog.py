"""Product-path relay-wedge watchdog (utils/watchdog.py).

bench.py has self-healed from wedged relay connections since round 3;
these tests cover the same recovery for the product CLI: a fused
`train --corpus` run that wedges mid-training is killed after the stall
window and re-run unattended, continuing from the chunked resume bundle.
The wedge is simulated with ICASSP_INJECT_STALL_ONCE (the first process
to hit the trainers' chunk-commit point blocks forever; the marker file
lets every later attempt run clean).
"""

import sys

import pytest

from icassp2022_depression_tpu import cli
from icassp2022_depression_tpu.data import eatd
from icassp2022_depression_tpu.utils import watchdog


def test_watched_subcommands_carry_the_flags():
    p = cli.build_parser()
    args = p.parse_args(["train", "--task", "audio_clf", "--root", "/tmp/x",
                         "--no-watchdog"])
    assert args.watchdog is False and args.watchdog_stall_s is None
    args = p.parse_args(["pipeline", "--track", "clf", "--root", "/tmp/x",
                         "--watchdog-stall-s", "30"])
    assert args.watchdog is True and args.watchdog_stall_s == 30.0
    # short, host-side commands are not supervised and have no flag
    with pytest.raises(SystemExit):
        p.parse_args(["synth-corpus", "--root", "/tmp/x", "--no-watchdog"])


def test_inprocess_main_never_supervises(tmp_path, monkeypatch):
    """cli.main() without watchdog_entry runs the command directly even
    though the parsed default is watchdog=True — tests/notebooks must
    never fork supervised children."""
    def boom(*a, **k):  # pragma: no cover
        raise AssertionError("supervise() called from in-process main")
    monkeypatch.setattr(watchdog, "supervise", boom)
    rc = cli.main(["synth-corpus", "--root", str(tmp_path / "c"),
                   "--n-data", "1", "--n-validation", "0",
                   "--seconds", "0.1"])
    assert rc == 0


def test_entry_child_marker_disables_supervision(tmp_path, monkeypatch):
    """A watchdog child (ICASSP_WATCHDOG_CHILD=1) must run directly even
    through the watchdog entry point — no recursive supervision."""
    def boom(*a, **k):  # pragma: no cover
        raise AssertionError("child re-supervised")
    monkeypatch.setattr(watchdog, "supervise", boom)
    monkeypatch.setenv(watchdog.CHILD_ENV, "1")
    rc = cli.main(["synth-corpus", "--root", str(tmp_path / "c"),
                   "--n-data", "1", "--n-validation", "0",
                   "--seconds", "0.1"], watchdog_entry=True)
    assert rc == 0


def test_nonzero_exit_is_not_retried(tmp_path, monkeypatch, capfd):
    """Product failures are deterministic and meaningful — only stalls
    are retried (the wedge failure mode is a stall, never a crash)."""
    monkeypatch.setenv("ICASSP_FORCE_PLATFORM", "cpu")
    rc = watchdog.supervise(["train", "--task", "audio_clf",
                             "--root", str(tmp_path / "nonexistent")],
                            stall_s=120, attempts=2)
    out, err = capfd.readouterr()
    assert rc != 0
    assert "watchdog" not in err  # no retry banner: one attempt only


def test_injected_stall_fused_run_completes_unattended(tmp_path,
                                                       monkeypatch, capfd):
    """End-to-end: a fused `train --corpus` run wedges after its first
    committed chunk; the watchdog kills it after the stall window and the
    re-run finishes from the resume bundle with no human in the loop."""
    root = tmp_path / "corpus"
    eatd.make_synthetic_corpus(root, n_data=5, n_validation=3,
                               seconds=0.3, seed=0)
    marker = tmp_path / "stall_once"
    monkeypatch.setenv("ICASSP_INJECT_STALL_ONCE", str(marker))
    monkeypatch.setenv("ICASSP_FORCE_PLATFORM", "cpu")
    rc = watchdog.supervise(
        ["train", "--task", "audio_clf", "--root", str(root),
         "--corpus", str(root), "--model-dir", str(tmp_path / "m"),
         "--resume-dir", str(tmp_path / "r"), "--chunk-epochs", "100"],
        stall_s=90, attempts=3)
    out, err = capfd.readouterr()
    assert marker.exists()                      # the wedge really fired
    assert rc == 0, err
    assert "watchdog" in err and "killed" in err    # it really recovered
    # the successful attempt resumed PAST the first committed chunk
    # rather than redoing it: its first heartbeat is the second chunk
    assert "epochs 100/169" in err and "epochs 169/169" in err
    assert out.count("fold ") >= 3              # all folds reported
