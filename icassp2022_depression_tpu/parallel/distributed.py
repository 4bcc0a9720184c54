"""Multi-process / multi-host initialisation and fold-parallel execution.

The reference is strictly single-process (SURVEY.md §0).  Scaling this
workload across chips has two natural axes:

1. **fold parallelism** — the 3 evaluation folds are independent training
   programs over identically-shaped data; sharding the stacked fold axis of
   the vmapped whole-fold program over the mesh runs them concurrently
   (wall-clock of 3 folds ≈ 1 fold).  This composes with the in-fold DP/TP
   shardings of :mod:`.mesh` on a 2D mesh.
2. **data/tensor parallelism** within a fold (:mod:`.mesh`,
   :mod:`.collectives`).

:func:`initialize` wraps ``jax.distributed.initialize`` for real multi-host
pods (coordinator discovery via env vars); on a single host it is a no-op,
and the CPU ``xla_force_host_platform_device_count`` mesh stands in for a
pod in tests.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Initialise jax.distributed when running multi-process (one process
    per host, as on a TPU pod).  All arguments default from the standard
    environment (``JAX_COORDINATOR_ADDRESS`` etc.); single-process callers
    can skip this entirely."""
    if num_processes is None:
        num_processes = int(os.environ.get("JAX_NUM_PROCESSES", "1"))
    if num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address
        or os.environ.get("JAX_COORDINATOR_ADDRESS"),
        num_processes=num_processes,
        process_id=process_id
        if process_id is not None else int(os.environ.get("JAX_PROCESS_ID", "0")),
    )


def fold_mesh(n_folds: int, devices=None) -> Mesh:
    """1D mesh over the fold axis (one device — or device group — per fold)."""
    if devices is None:
        devices = jax.devices()
    assert len(devices) >= n_folds, \
        f"need >= {n_folds} devices for fold parallelism, have {len(devices)}"
    import numpy as np

    return Mesh(np.asarray(devices[:n_folds]), ("fold",))


def shard_over_folds(mesh: Mesh, tree):
    """Place a stacked-fold pytree (leading fold axis on every leaf) with
    the fold axis sharded across the mesh (remaining axes replicated — on
    a 2D fold x data mesh this replicates each fold's leaf within its
    data group, the right placement for params/opt state/keys)."""
    sharding = NamedSharding(mesh, P("fold"))
    return jax.tree_util.tree_map(
        lambda leaf: jax.device_put(leaf, sharding), tree)


def fold_data_mesh(n_folds: int, data_parallel: int, devices=None) -> Mesh:
    """2D ``(fold, data)`` mesh: one device group per fold, ``data_parallel``
    devices per group for in-fold batch parallelism."""
    if devices is None:
        devices = jax.devices()
    need = n_folds * data_parallel
    assert len(devices) >= need, \
        f"need >= {need} devices for {n_folds} folds x {data_parallel} DP"
    import numpy as np

    grid = np.asarray(devices[:need]).reshape(n_folds, data_parallel)
    return Mesh(grid, ("fold", "data"))


def shard_stacked_fold_data(mesh: Mesh, data):
    """Shardings for a STACKED :class:`~..train.loop.FoldData` on a
    ``(fold, data)`` mesh: train arrays [F, NB, B, ...] shard F over
    ``fold`` and the within-batch axis B over ``data``; test arrays
    [F, N, ...] shard F and N."""
    dp = mesh.shape["data"]
    b = data.train_y.shape[2]
    n = data.test_y.shape[1]
    assert b % dp == 0, \
        f"in-fold batch size {b} not divisible by data_parallel={dp}"
    assert n % dp == 0, \
        f"padded test size {n} not divisible by data_parallel={dp}"
    tr = NamedSharding(mesh, P("fold", None, "data"))
    te = NamedSharding(mesh, P("fold", "data"))

    def put(x, s):
        return jax.device_put(x, s)

    return type(data)(
        train_x=tuple(put(a, tr) for a in data.train_x),
        train_y=put(data.train_y, tr),
        train_mask=put(data.train_mask, tr),
        test_x=tuple(put(a, te) for a in data.test_x),
        test_y=put(data.test_y, te),
        test_mask=put(data.test_mask, te))
