"""Relay-wedge stall watchdog for the long-running product commands.

The host<->device relay occasionally WEDGES a blocking device call
indefinitely (observed: a fetch sleeping at ~0% CPU for 20+ min while the
identical command succeeds in minutes from a fresh process).  A wedged
process cannot unblock itself, so recovery has to come from OUTSIDE:
``bench.py`` has run its measurement in a supervised child since round 3;
this module gives the product CLI (``train``/``pipeline``/``train-daic``/
``extract-*``/``check*``/``warmup``) the same self-healing — previously
the recovery story for those was a manual runbook (kill, rerun, resume).

``supervise(argv)`` re-execs the CLI as a child process with
``ICASSP_WATCHDOG_CHILD=1`` (so the child never re-supervises) and
watches BOTH its stdout and stderr: any line on either stream resets the
stall clock, and every line is echoed through to the matching parent
stream immediately, so piping/log-capture behaviour is unchanged.  If no
line arrives for ``stall_s`` seconds (``ICASSP_WATCHDOG_S``, default
900 — cold compiles through the remote service legitimately take
minutes), the child is killed and the identical command re-run in a
fresh process (fresh relay connection), up to ``ICASSP_WATCHDOG_ATTEMPTS``
(default 3) attempts total.

Unlike the bench watchdog, a child that EXITS with a nonzero code is NOT
retried: product failures (bad args, missing corpus, failed parity gate)
are deterministic and meaningful, and the wedge failure mode is a stall,
never a crash.  Exit codes pass through unchanged.

Restart-idempotence is the product's existing story: training continues
bit-exactly from the chunked resume bundle when ``--resume-dir`` is set
(``train/trainers.py::_execute_fold``; the reference always restarts
from scratch — SURVEY.md §5), extraction skips already-manifested work,
and everything else simply re-runs from the top.

Test hook: ``ICASSP_INJECT_STALL_ONCE=<marker-path>`` makes the FIRST
attempt simulate a wedge (sleep forever) at the trainers' per-chunk
commit point; the marker file makes subsequent attempts run clean.  See
``tests/test_product_watchdog.py``.
"""

from __future__ import annotations

import os
import selectors
import subprocess
import sys
import time

#: subcommands that talk to the TPU for minutes and therefore run under
#: the watchdog by default (--no-watchdog opts out per invocation)
WATCHED_COMMANDS = frozenset({
    "train", "pipeline", "train-daic", "check", "check-daic",
    "extract-audio", "extract-text", "extract-daic", "warmup",
})

CHILD_ENV = "ICASSP_WATCHDOG_CHILD"


def maybe_inject_stall() -> None:
    """Test-only wedge simulation (no-op unless ICASSP_INJECT_STALL_ONCE
    is set): the first process to reach this point creates the marker
    file and then blocks forever — exactly what a wedged relay fetch
    looks like from outside (no output, ~0% CPU).  Later processes see
    the marker and continue untouched."""
    marker = os.environ.get("ICASSP_INJECT_STALL_ONCE")
    if not marker:
        return
    try:
        fd = os.open(marker, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    except FileExistsError:
        return
    os.close(fd)
    while True:  # pragma: no cover — killed from outside
        time.sleep(3600)


def supervise(argv: list[str], stall_s: float | None = None,
              attempts: int | None = None) -> int:
    """Run ``python -m icassp2022_depression_tpu.cli *argv`` under the
    stall watchdog; returns the child's exit code (or 1 if every attempt
    stalled)."""
    if attempts is None:
        attempts = int(os.environ.get("ICASSP_WATCHDOG_ATTEMPTS", "3"))
    if stall_s is None:
        stall_s = float(os.environ.get("ICASSP_WATCHDOG_S", "900"))
    env = dict(os.environ, **{CHILD_ENV: "1", "PYTHONUNBUFFERED": "1"})
    cmd = [sys.executable, "-m", "icassp2022_depression_tpu.cli", *argv]
    for attempt in range(1, attempts + 1):
        proc = subprocess.Popen(cmd, stdout=subprocess.PIPE,
                                stderr=subprocess.PIPE, text=True,
                                bufsize=1, env=env)
        sel = selectors.DefaultSelector()
        sel.register(proc.stdout, selectors.EVENT_READ, sys.stdout)
        sel.register(proc.stderr, selectors.EVENT_READ, sys.stderr)
        last_line = time.time()
        stalled = False
        try:
            open_streams = 2
            while True:
                ready = sel.select(timeout=10)
                for key, _ in ready:
                    line = key.fileobj.readline()
                    if line:
                        print(line, end="", file=key.data, flush=True)
                        last_line = time.time()
                    else:  # EOF on this stream
                        sel.unregister(key.fileobj)
                        open_streams -= 1
                if open_streams == 0 or (not ready
                                         and proc.poll() is not None):
                    break
                if time.time() - last_line > stall_s:
                    stalled = True
                    proc.kill()
                    break
        except KeyboardInterrupt:
            proc.kill()
            proc.wait()
            raise
        rc = proc.wait()
        if not stalled:
            return rc
        print(f"# watchdog: attempt {attempt}/{attempts} produced no "
              f"output for {stall_s:.0f}s (wedged relay connection?) — "
              "killed"
              + ("; retrying the identical command in a fresh process "
                 "(training continues from the chunked resume bundle if "
                 "--resume-dir is set)" if attempt < attempts else ""),
              file=sys.stderr, flush=True)
    return 1
