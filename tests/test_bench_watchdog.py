"""bench.py's relay-wedge watchdog: stalled children are killed and
retried in a fresh process; healthy children stream through untouched.

The axon relay occasionally wedges a connection indefinitely (a blocking
device call sleeping at ~0% CPU); the watchdog is what keeps the driver's
end-of-round `python bench.py` from hanging with it.
"""

import sys

import pytest

import bench


def test_watchdog_passes_healthy_child_through(capfd, monkeypatch):
    monkeypatch.setenv("ICASSP_BENCH_ATTEMPTS", "2")
    monkeypatch.setenv("ICASSP_BENCH_STALL_S", "30")
    rc = bench.run_with_stall_watchdog(
        [sys.executable, "-c", 'print(\'{"metric": "x", "value": 1}\')'])
    out, err = capfd.readouterr()
    assert rc == 0
    assert out.strip().splitlines()[-1] == '{"metric": "x", "value": 1}'
    assert "stalled" not in err


def test_watchdog_kills_stalled_child_and_retries(capfd, monkeypatch):
    monkeypatch.setenv("ICASSP_BENCH_ATTEMPTS", "2")
    monkeypatch.setenv("ICASSP_BENCH_STALL_S", "1")
    rc = bench.run_with_stall_watchdog(
        [sys.executable, "-c",
         "import time; print('started', flush=True); time.sleep(600)"])
    out, err = capfd.readouterr()
    assert rc == 1
    assert out.count("started") == 2      # both attempts streamed
    assert err.count("stalled") == 2      # both attempts flagged


def test_watchdog_retry_succeeds_after_one_failure(capfd, monkeypatch,
                                                   tmp_path):
    """First attempt fails (rc != 0), second succeeds — the retry exists
    precisely because an identical command succeeds on a fresh relay
    connection."""
    marker = tmp_path / "attempted"
    script = (
        "import pathlib, sys\n"
        f"m = pathlib.Path({str(marker)!r})\n"
        "if m.exists():\n"
        "    print('ok-second-attempt')\n"
        "else:\n"
        "    m.touch(); sys.exit(3)\n"
    )
    monkeypatch.setenv("ICASSP_BENCH_ATTEMPTS", "2")
    monkeypatch.setenv("ICASSP_BENCH_STALL_S", "30")
    rc = bench.run_with_stall_watchdog([sys.executable, "-c", script])
    out, err = capfd.readouterr()
    assert rc == 0
    assert "ok-second-attempt" in out
    assert "failed rc=3" in err
