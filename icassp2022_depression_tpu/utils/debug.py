"""Numeric sanitizers and invariant checks.

The reference's closest hazard is silent in-place feature-array growth
(SURVEY.md §5 "race detection"); this framework's data pipeline is
functional/immutable by construction, and this module adds the active
sanitizers: NaN debugging, finite-tree assertions, and shape/dtype
invariant checks (chex) usable inside jitted code.
"""

from __future__ import annotations

import contextlib

import chex
import jax
import jax.numpy as jnp
import numpy as np


@contextlib.contextmanager
def nan_debug(enable: bool = True):
    """Enable ``jax_debug_nans`` for the enclosed region: any NaN produced
    by a jitted computation raises with a traceback to the culprit op."""
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", enable)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


def assert_tree_finite(tree, name: str = "tree"):
    """Host-side: every leaf finite, else ValueError naming the leaf path.

    ONE ``device_get`` for the whole tree — a per-leaf fetch would pay
    the relay's ~0.45 s round-trip latency per leaf (~40 leaves of a
    model+opt tree = ~18 s per call)."""
    host_tree = jax.device_get(tree)
    flat = jax.tree_util.tree_flatten_with_path(host_tree)[0]
    for path, leaf in flat:
        arr = np.asarray(leaf)
        if not np.isfinite(arr).all():
            keys = "/".join(str(getattr(p, "key", p)) for p in path)
            raise ValueError(
                f"non-finite values in {name}/{keys}: "
                f"{np.sum(~np.isfinite(arr))} of {arr.size}")


def assert_batch_shapes(x: jnp.ndarray, y: jnp.ndarray,
                        mask: jnp.ndarray | None = None):
    """Trace-time invariants for a training batch (usable under jit)."""
    chex.assert_rank(x, 3)
    chex.assert_rank(y, 1)
    chex.assert_equal_shape_prefix([x, y], 1)
    if mask is not None:
        chex.assert_equal_shape([y, mask])


def tree_norms(tree) -> dict:
    """Per-leaf L2 norms (host) — quick observability for divergence.

    One ``device_get`` for the whole tree (see :func:`assert_tree_finite`
    for the relay-latency rationale)."""
    host_tree = jax.device_get(tree)
    flat = jax.tree_util.tree_flatten_with_path(host_tree)[0]
    out = {}
    for path, leaf in flat:
        keys = "/".join(str(getattr(p, "key", p)) for p in path)
        out[keys] = float(np.linalg.norm(np.asarray(leaf).ravel()))
    return out
