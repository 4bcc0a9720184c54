"""Explicit-collective data-parallel training step (``shard_map`` + psum).

The jit-with-shardings path in :mod:`.mesh` lets XLA derive the gradient
all-reduce; this module spells the same computation with explicit
``shard_map`` and ``psum`` for cases where manual control of the collective
schedule matters (and as the documented pattern for scaling the framework's
training loops over ICI).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P


def dp_train_step(train_loss_fn, optimizer, mesh: Mesh):
    """Build a data-parallel step: batch rows sharded over ``data``, params
    replicated, gradients psum-reduced across shards before the (replicated)
    optimizer update.

    ``train_loss_fn(params, xs_tuple, y, mask, key) -> (loss, pred)`` must
    compute a masked *sum*-compatible mean: we rescale per-shard losses by
    their valid count so the psum'd gradient equals the global-batch
    gradient exactly (the reference's mean-over-batch semantics).
    """

    def shard_step(params, opt_state, key, xs, y, mask):
        # independent dropout per shard: the replicated key must be folded
        # with the shard index, otherwise every shard draws the same masks
        key = jax.random.fold_in(key, jax.lax.axis_index("data"))

        def local_loss(p):
            loss, pred = train_loss_fn(p, xs, y, mask, key)
            n_local = jnp.sum(mask)
            n_global = jax.lax.psum(n_local, "data")
            # local mean * local_n / global_n sums to the global mean
            scale = jnp.where(n_global > 0, n_local / jnp.maximum(n_global, 1.0), 0.0)
            return loss * scale, pred

        (loss, pred), grads = jax.value_and_grad(local_loss, has_aux=True)(params)
        grads = jax.lax.psum(grads, "data")
        loss = jax.lax.psum(loss, "data")
        updates, new_opt_state = optimizer.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        # same exact-no-op guard as train/loop.py's batch_step: a
        # fully-masked (padding) batch must not advance the Adam step
        # count or apply decoupled weight decay
        has_valid = jax.lax.psum(jnp.sum(mask), "data") > 0
        sel = lambda a, b: jax.tree_util.tree_map(  # noqa: E731
            lambda x, y: jnp.where(has_valid, x, y), a, b)
        params = sel(new_params, params)
        opt_state = sel(new_opt_state, opt_state)
        loss = jnp.where(has_valid, loss, 0.0)
        return params, opt_state, loss, pred

    xs_spec = P("data")
    step = jax.shard_map(
        shard_step, mesh=mesh,
        in_specs=(P(), P(), P(), xs_spec, P("data"), P("data")),
        out_specs=(P(), P(), P(), P("data")),
        check_vma=False)
    return jax.jit(step)


def psum_metrics(tree, axis_name: str = "data"):
    """Reduce a metric pytree across the data axis (inside shard_map)."""
    return jax.tree_util.tree_map(
        functools.partial(jax.lax.psum, axis_name=axis_name), tree)
