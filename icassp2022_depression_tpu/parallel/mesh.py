"""Device mesh + sharding helpers.

The reference is single-process CPU with no distribution of any kind
(SURVEY.md §0/§5); this module is the framework's first-class scale-out
story, designed the XLA way: annotate shardings on a
``jax.sharding.Mesh`` and let the compiler insert collectives over ICI.

Two axes:

* ``data`` — batch-dimension data parallelism (the natural parallelism for
  this workload: augmented speaker batches; gradients all-reduce
  automatically under ``jit`` from the sharding annotations);
* ``model`` — tensor parallelism over the RNN/Linear gate dimension
  (weights are row-sharded ``[G*H, D]``; each shard computes its slice of
  the gates and activations re-gather where needed).

Use :func:`make_mesh` with real TPU devices, or on CPU with
``XLA_FLAGS=--xla_force_host_platform_device_count=N`` for a virtual mesh
(the test/dry-run substitute for a pod).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, model_parallel: int = 1,
              devices=None) -> Mesh:
    """2D ``(data, model)`` mesh; ``model_parallel=1`` gives pure DP."""
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = np.asarray(devices[:n_devices])
    assert n_devices % model_parallel == 0, \
        f"{n_devices} devices not divisible by model_parallel={model_parallel}"
    grid = devices.reshape(n_devices // model_parallel, model_parallel)
    return Mesh(grid, ("data", "model"))


def batch_sharding(mesh: Mesh, batch_axis: int = 0) -> NamedSharding:
    """Shard a batch array's leading (or given) axis over the data axis."""
    spec = [None] * (batch_axis + 1)
    spec[batch_axis] = "data"
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _param_spec(path, leaf, model_size: int) -> P:
    """Tensor-parallel placement for a param leaf: the RNN *gate* matrices
    (w_ih/w_hh, [G*H, ...]) and their biases are row-sharded over ``model``
    when divisible; everything else — including tiny head weights like
    [num_classes, H], which are rarely divisible and not worth sharding —
    is replicated."""
    names = [str(e.key) for e in path if isinstance(e, jax.tree_util.DictKey)]
    leafname = names[-1] if names else ""
    if leafname in ("w_ih", "w_hh") and leaf.ndim == 2 and \
            leaf.shape[0] % model_size == 0:
        return P("model", None)
    if leafname in ("b_ih", "b_hh") and leaf.ndim == 1 and \
            leaf.shape[0] % model_size == 0:
        return P("model")
    return P()


def param_shardings(mesh: Mesh, params):
    """NamedSharding tree for a model param tree (TP over the model axis).

    With ``model`` axis of size 1 this degenerates to replication, so the
    same annotations serve pure-DP and DP+TP meshes.
    """
    model_size = mesh.shape.get("model", 1)
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(
            mesh, _param_spec(path, leaf, model_size)),
        params)


def fold_data_shardings(mesh: Mesh, data):
    """Shardings for a :class:`~icassp2022_depression_tpu.train.loop.FoldData`:
    train arrays [NB, B, ...] shard B (axis 1) over ``data``; test arrays
    [N, ...] shard axis 0."""
    from icassp2022_depression_tpu.train.loop import FoldData

    def tr(x):
        return NamedSharding(mesh, P(None, "data"))

    def te(x):
        return NamedSharding(mesh, P("data"))

    return FoldData(
        train_x=tuple(tr(a) for a in data.train_x),
        train_y=tr(data.train_y), train_mask=tr(data.train_mask),
        test_x=tuple(te(a) for a in data.test_x),
        test_y=te(data.test_y), test_mask=te(data.test_mask))
