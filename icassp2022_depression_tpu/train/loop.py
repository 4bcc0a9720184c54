"""Whole-fold training as a single compiled XLA program.

The reference trains with a Python step loop: 100-170 epochs x minibatch
slices, evaluating on the full test split every epoch and torch-saving
whenever the metric gate fires (``Classification/audio_gru_whole.py:161-245,
316-318``).  On TPU that structure would round-trip host<->device every
step.

Here the *entire fold* — every epoch, every minibatch, per-epoch full-batch
eval, and the metric-gated best-checkpoint selection — is one
``lax.scan``-over-epochs program compiled once and dispatched once:

* minibatches are pre-padded to static shapes ``[n_batches, B, ...]`` with
  validity masks (the reference's ragged last slice becomes a masked batch);
* the reference does not reshuffle between epochs (fixed row order,
  consecutive slices — ``audio_gru_whole.py:170-175``), so the batched
  arrays are constants across the epoch scan;
* "save best" becomes an on-device pytree ``jnp.where`` select against the
  gate condition, reproducing the thresholds exactly (f1/train-acc floors
  for classification, MAE ceilings for regression);
* dropout PRNG keys are split per batch from a fold key — fully
  deterministic and resumable.

The per-epoch metric log is returned to the host for observability.
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from icassp2022_depression_tpu.config import GateConfig
from icassp2022_depression_tpu.eval import metrics as M


class FoldData(NamedTuple):
    """Device-ready fold tensors.  ``train_x``/``test_x`` are tuples of
    arrays (length 1 for unimodal, 2 for fusion), batched as
    ``[n_batches, B, ...]`` for train and flat ``[N, ...]`` for test."""

    train_x: tuple
    train_y: jnp.ndarray       # [NB, B]
    train_mask: jnp.ndarray    # [NB, B]
    test_x: tuple
    test_y: jnp.ndarray        # [N]
    test_mask: jnp.ndarray     # [N]


def batchify(xs: Sequence[np.ndarray], y: np.ndarray, batch_size: int,
             total_rows: int | None = None):
    """Pad row count to a multiple of ``batch_size`` (or to ``total_rows``,
    used to give every fold identical shapes so the compiled fold program is
    built once and reused) and reshape to [n_batches, B, ...] plus a
    validity mask."""
    n = len(y)
    nb = -(-(total_rows if total_rows is not None else n) // batch_size)
    pad = nb * batch_size - n
    assert pad >= 0

    def p(a):
        # device arrays (the fused pipeline) pad+reshape ON DEVICE —
        # np.asarray on them would silently pull features back over the
        # relay; host arrays keep the NumPy path (bit-identical either way)
        xp = jnp if isinstance(a, jax.Array) else np
        a = a if isinstance(a, jax.Array) else np.asarray(a)
        padded = xp.concatenate(
            [a, xp.zeros((pad,) + tuple(a.shape[1:]), a.dtype)], axis=0)
        return padded.reshape((nb, batch_size) + tuple(a.shape[1:]))

    mask = np.concatenate([np.ones(n, np.float32), np.zeros(pad, np.float32)])
    return (tuple(p(a) for a in xs), p(np.asarray(y)),
            mask.reshape(nb, batch_size))


def pad_rows(xs: Sequence[np.ndarray], y: np.ndarray, total: int):
    """Pad a flat eval split to ``total`` rows with a validity mask (used to
    give all folds identical shapes for cross-fold vmap)."""
    n = len(y)
    pad = total - n
    assert pad >= 0

    def p(a):
        xp = jnp if isinstance(a, jax.Array) else np
        a = a if isinstance(a, jax.Array) else np.asarray(a)
        return xp.concatenate(
            [a, xp.zeros((pad,) + tuple(a.shape[1:]), a.dtype)], 0)

    mask = np.concatenate([np.ones(n, np.float32), np.zeros(pad, np.float32)])
    return tuple(p(a) for a in xs), p(np.asarray(y)), mask


def make_fold_data(train_xs, train_y, test_xs, test_y, batch_size,
                   test_total=None, train_total=None) -> FoldData:
    bx, by, bm = batchify(train_xs, train_y, batch_size, train_total)
    if test_total is None:
        test_total = len(test_y)
    tx, ty, tm = pad_rows(test_xs, test_y, test_total)
    return FoldData(tuple(jnp.asarray(a) for a in bx), jnp.asarray(by),
                    jnp.asarray(bm), tuple(jnp.asarray(a) for a in tx),
                    jnp.asarray(ty), jnp.asarray(tm))


def _gather_plan_rows(arr, spk, perm, n_valid, total_rows):
    """Materialise ``total_rows`` split rows from a pristine [N, 3, ...]
    array by on-device gathers: row r = ``arr[spk[r]][PERMS[perm[r]]]``,
    zeroed beyond ``n_valid`` to match the host path's zero padding
    bit-for-bit.  ``spk``/``perm`` are host int arrays already padded to
    ``total_rows``."""
    from icassp2022_depression_tpu.data.augment import PERM_TABLE

    arr = jnp.asarray(arr)
    sel = jnp.take(arr, jnp.asarray(spk), axis=0)            # [R, 3, ...]
    order = jnp.asarray(PERM_TABLE)[jnp.asarray(perm)]       # [R, 3]
    order = order.reshape(order.shape + (1,) * (arr.ndim - 2))
    rows = jnp.take_along_axis(sel, order, axis=1)
    valid = (jnp.arange(total_rows) < n_valid)
    valid = valid.reshape((total_rows,) + (1,) * (arr.ndim - 1))
    return jnp.where(valid, rows, jnp.zeros((), arr.dtype))


def _pad_plan(plan, total_rows):
    pad = total_rows - len(plan.targets)
    assert pad >= 0
    spk = np.concatenate([plan.spk, np.zeros(pad, plan.spk.dtype)])
    perm = np.concatenate([plan.perm, np.zeros(pad, plan.perm.dtype)])
    y = np.concatenate([plan.targets,
                        np.zeros(pad, plan.targets.dtype)])
    mask = np.concatenate([np.ones(len(plan.targets), np.float32),
                           np.zeros(pad, np.float32)])
    return spk, perm, y, mask


def fold_data_from_plans(feature_arrays, train_plan, test_plan, batch_size,
                         test_total=None, train_total=None) -> FoldData:
    """Device-resident twin of :func:`make_fold_data`.

    ``feature_arrays`` are the pristine [N, 3, ...] per-speaker arrays —
    typically DEVICE arrays straight out of
    ``frontend.audio.extract_batch(device=True)`` — and the augmented
    train/test splits are described by ``data.augment.SplitPlan`` index
    plans (host metadata).  All row materialisation (speaker gather +
    answer permutation + batch padding) happens ON DEVICE, so the fused
    extract->train pipeline never reads features back to the host; only
    the tiny targets/masks/indices cross the relay.  Output is
    bit-identical to ``make_fold_data`` over the host-materialised splits
    (padding rows zeroed; pinned by ``tests/test_device_pipeline.py``).
    """
    n_train = len(train_plan.targets)
    nb = -(-(train_total if train_total is not None else n_train)
           // batch_size)
    rows = nb * batch_size
    spk, perm, y, mask = _pad_plan(train_plan, rows)
    train_x = tuple(
        _gather_plan_rows(a, spk, perm, n_train, rows)
        .reshape((nb, batch_size) + tuple(a.shape[1:]))
        for a in feature_arrays)
    train_y = jnp.asarray(y.reshape(nb, batch_size))
    train_mask = jnp.asarray(mask.reshape(nb, batch_size))

    if test_total is None:
        test_total = len(test_plan.targets)
    tspk, tperm, ty, tmask = _pad_plan(test_plan, test_total)
    test_x = tuple(
        _gather_plan_rows(a, tspk, tperm, len(test_plan.targets),
                          test_total)
        for a in feature_arrays)
    return FoldData(train_x, train_y, train_mask, test_x,
                    jnp.asarray(ty), jnp.asarray(tmask))


def _select(cond, new, old):
    return jax.tree_util.tree_map(
        lambda a, b: jnp.where(cond, a, b), new, old)


def make_fold_runner(train_loss_fn: Callable, eval_fn: Callable,
                     optimizer: optax.GradientTransformation,
                     track: str, gate: GateConfig, epochs: int,
                     jit: bool = True):
    """Build the compiled fold program.

    Args:
      train_loss_fn: ``(params, xs_tuple, y, mask, key) -> (loss, pred)``
        with train-mode dropout.
      eval_fn: ``(params, xs_tuple) -> pred`` (deterministic).
      track: "classification" | "regression".
      epochs: the config value; the program runs ``epochs - 1`` epochs,
        reproducing the reference's ``range(1, epochs)``.

    Returns ``run(params, opt_state, data: FoldData, key) ->
    (final_params, final_opt_state, final_key, best, logs)`` where ``best``
    carries the gated best params + metrics and ``logs`` per-epoch metric
    arrays.
    """
    grad_fn = jax.value_and_grad(train_loss_fn, has_aux=True)
    n_epochs = epochs - 1

    def batch_step(carry, batch):
        params, opt_state, key = carry
        x, y, mask = batch
        key, sub = jax.random.split(key)
        (loss, pred), grads = grad_fn(params, x, y, mask, sub)
        updates, new_opt_state = optimizer.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        # Fully-padded batches (added only to unify shapes across folds so
        # the program compiles once) must be exact no-ops: no parameter
        # update, no optimizer-state advance (an extra Adam step would shift
        # bias correction), no decoupled weight decay.
        has_valid = jnp.sum(mask) > 0
        params = _select(has_valid, new_params, params)
        opt_state = _select(has_valid, new_opt_state, opt_state)
        loss = jnp.where(has_valid, loss, 0.0)
        return (params, opt_state, key), (loss, pred)

    def epoch_step(carry, epoch_idx, data: FoldData, n_train):
        params, opt_state, key, best = carry
        (params, opt_state, key), (losses, preds) = jax.lax.scan(
            batch_step, (params, opt_state, key),
            (data.train_x, data.train_y, data.train_mask))

        test_pred = eval_fn(params, data.test_x)

        if track == "classification":
            train_correct = jnp.sum(
                data.train_mask *
                (jnp.argmax(preds, axis=-1) == data.train_y))
            yp = jnp.argmax(test_pred, axis=-1)
            tp, fp, fn, tn = M.confusion_counts(data.test_y, yp, data.test_mask)
            acc, prec, rec, f1 = M.f1_from_counts(tp, fp, fn, tn)
            improve = (f1 >= best["f1"]) if gate.f1_tie_update else (f1 > best["f1"])
            # EXACT boundary semantics: the reference computes
            # `train_acc > len(train_idxs) * 0.9` in Python f64
            # (audio_gru_whole.py:233), where f64(0.9) is slightly ABOVE
            # 9/10, so `correct == 0.9*n` exactly does NOT gate.  Under
            # f32 tracing 0.9 rounds slightly BELOW, flipping that
            # boundary.  Both counts are small integers, so compare as
            # the exact rational `correct * den > num * n` instead
            # (0.9 -> 9/10; host-side, trace-constant).
            from fractions import Fraction

            frac = Fraction(gate.train_acc_frac).limit_denominator(10000)
            num = jnp.int32(frac.numerator)
            den = jnp.int32(frac.denominator)
            corr_i = train_correct.astype(jnp.int32)
            n_i = n_train.astype(jnp.int32)
            acc_ok = (corr_i * den > num * n_i
                      if gate.train_acc_strict
                      else corr_i * den >= num * n_i)
            should = improve & acc_ok & (f1 > gate.f1_floor)
            new_best = {"params": params, "f1": f1, "accuracy": acc,
                        "precision": prec, "recall": rec,
                        "epoch": epoch_idx.astype(jnp.float32)}
            best = _select(should, new_best, best)
            log = {"loss": jnp.sum(losses), "train_correct": train_correct,
                   "f1": f1, "accuracy": acc, "precision": prec,
                   "recall": rec}
        else:
            train_mae = M.masked_mae(data.train_y, preds.squeeze(-1),
                                     data.train_mask)
            pred_flat = test_pred.squeeze(-1)
            mae = M.masked_mae(data.test_y, pred_flat, data.test_mask)
            rmse = M.masked_rmse(data.test_y, pred_flat, data.test_mask)
            should = ((mae <= best["mae"]) & (mae < gate.mae_ceiling) &
                      (train_mae < gate.train_mae_ceiling))
            new_best = {"params": params, "mae": mae, "rmse": rmse,
                        "epoch": epoch_idx.astype(jnp.float32)}
            best = _select(should, new_best, best)
            log = {"loss": jnp.sum(losses), "train_mae": train_mae,
                   "mae": mae, "rmse": rmse}
        return (params, opt_state, key, best), log

    def run(params, opt_state, data: FoldData, key, best=None, epoch0=0):
        """``best``/``epoch0`` enable chunked execution + resume: pass the
        carried best tree and the number of epochs already completed (the
        per-epoch PRNG stream continues through the carried ``key``)."""
        n_train = jnp.sum(data.train_mask)
        if best is None:
            best = init_best(track, params)
        step = functools.partial(epoch_step, data=data, n_train=n_train)
        (params, opt_state, key, best), logs = jax.lax.scan(
            step, (params, opt_state, key, best),
            jnp.arange(n_epochs) + epoch0)
        return params, opt_state, key, best, logs

    return jax.jit(run) if jit else run


def stack_fold_data(datas: Sequence[FoldData]) -> FoldData:
    """Stack per-fold FoldData (already shape-uniform) along a leading fold
    axis for cross-fold vmap execution."""
    def stack(*leaves):
        return jnp.stack(leaves)

    return jax.tree_util.tree_map(stack, *datas)


def make_multi_fold_runner(train_loss_fn, eval_fn, optimizer, track, gate,
                           epochs):
    """Cross-fold vmap: all folds execute as ONE compiled program.

    The reference runs its 3 folds strictly sequentially; on TPU the folds
    are independent programs over identically-shaped (padded) data, so
    vmapping the whole-fold program over a leading fold axis triples the
    effective batch every matmul sees — better MXU utilisation and a third
    of the dispatches — while per-fold semantics (separate params, opt
    state, PRNG streams, gated best) are preserved by construction.

    Returns ``run(stacked_params, stacked_opt_state, stacked_data,
    stacked_keys, best=None, epoch0=0) -> (params, opt_state, keys, best,
    logs)`` with a leading fold axis on every output.  ``best``/``epoch0``
    enable chunked execution + resume exactly like the single-fold runner
    (``best`` carries the stacked gated-best tree; ``epoch0`` — shared by
    all folds — offsets the epoch counter and is NOT vmapped).
    """
    single = make_fold_runner(train_loss_fn, eval_fn, optimizer, track,
                              gate, epochs, jit=False)
    vm = jax.vmap(single, in_axes=(0, 0, 0, 0, 0, None))

    @jax.jit
    def run(params, opt_state, data, keys, best=None, epoch0=0):
        if best is None:
            best = jax.vmap(lambda p: init_best(track, p))(params)
        return vm(params, opt_state, data, keys, best, epoch0)

    return run


def init_best(track: str, params):
    """Initial gated-best tree (reference init values:
    ``max_f1 = -1`` / ``min_mae = 100``)."""
    if track == "classification":
        return {"params": params, "f1": jnp.float32(-1.0),
                "accuracy": jnp.float32(-1.0),
                "precision": jnp.float32(-1.0),
                "recall": jnp.float32(-1.0),
                "epoch": jnp.float32(-1.0)}
    return {"params": params, "mae": jnp.float32(100.0),
            "rmse": jnp.float32(100.0), "epoch": jnp.float32(-1.0)}
