"""TRUE multi-process distributed validation (scripts/multihost_dryrun.py).

Unlike the in-process 8-virtual-device mesh the rest of the suite uses,
this spawns separate OS processes that coordinate through the product's
``parallel/distributed.initialize`` (jax.distributed over TCP + Gloo CPU
collectives) and run a cross-process data-parallel training step, which
must reproduce the single-process step bit-for-bit."""

import json
import subprocess
import sys
from pathlib import Path

import pytest

SCRIPT = Path(__file__).resolve().parent.parent / "scripts" / \
    "multihost_dryrun.py"


def test_two_process_dp_step_matches_serial():
    # bounded by subprocess.run(timeout=280); pytest-timeout not installed
    proc = subprocess.run([sys.executable, str(SCRIPT)],
                          capture_output=True, text=True, timeout=280)
    if proc.returncode != 0 and "no gloo" in (proc.stdout + proc.stderr):
        pytest.skip("CPU Gloo collectives unavailable in this jaxlib")
    assert proc.returncode == 0, proc.stderr[-2000:]
    result = json.loads(proc.stdout.strip().splitlines()[-1])
    assert result["multihost"] == "ok"
    assert result["nprocs"] == 2 and result["devices_total"] == 4
    # same tolerances as the script's own acceptance: Gloo cross-process
    # reduction order need not be bit-identical to the single-process
    # XLA collective
    assert abs(result["loss"] - result["ref_loss"]) < 1e-5
    assert abs(result["param_l1"] - result["ref_param_l1"]) < 1e-4
