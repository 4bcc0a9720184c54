"""Driver entry points must keep compiling (API-drift insurance)."""

import sys
from pathlib import Path

import jax

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __graft_entry__ as graft  # noqa: E402


def test_entry_compiles():
    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (8, 2)


def test_dryrun_multichip_virtual_mesh():
    graft.dryrun_multichip(2)
    graft.dryrun_multichip(8)
