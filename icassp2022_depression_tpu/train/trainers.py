"""The six track trainers (L4), each a thin wiring of: fold recipe ->
permutation augmentation -> compiled whole-fold program -> gated-best
checkpoint on disk.

Reference counterparts:

* audio clf  — ``Classification/audio_gru_whole.py`` (AdamW lr 6e-6, CE,
  batch 8, 170 epochs, LayerNorm-exempt weight decay)
* text clf   — ``Classification/text_bilstm_whole.py`` (AdamW lr 1e-5,
  batch 4, 150 epochs)
* fusion clf — ``Classification/fuse_net_whole.py`` (Adam lr 8e-6, MyLoss,
  batch 2, 100 epochs, branch init + only fc_final trainable)
* audio reg  — ``Regression/audio_bilstm_perm.py`` (Adam lr 1e-5, L1,
  batch 2, 120 epochs)
* text reg   — ``Regression/text_bilstm_perm.py`` (Adam lr 1e-5, SmoothL1)
* fusion reg — ``Regression/fuse_net.py`` (Adam lr 8e-5, SmoothL1 MyLoss)
"""

from __future__ import annotations

import sys
from pathlib import Path
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from icassp2022_depression_tpu import config as C
from icassp2022_depression_tpu.data import augment, folds
from icassp2022_depression_tpu.models import audio_net, fusion, losses, text_net
from icassp2022_depression_tpu.ops.nn import (
    l1_loss,
    masked_cross_entropy_on_probs,
    smooth_l1_loss,
)
from icassp2022_depression_tpu.train import checkpoints, loop, optim
from icassp2022_depression_tpu.utils import profiling, watchdog


def _dead_paths(model_module):
    """Param blocks the reference model never back-propagates into (the
    audio model's unused attention layer, audio_gru_whole.py:75-101):
    torch AdamW skips grad-less params, so decoupled decay must too."""
    return ("attn",) if model_module is audio_net else ()


# One (optimizer, runner-factory, compiled-runner dict) bundle per distinct
# training recipe, shared across trainer CALLS in a process: the loss/eval
# closures and the optax transformation are pure functions of the configs,
# so rebuilding them per call (the previous behaviour) made every repeat
# training re-trace and re-fetch its whole-fold XLA programs — ~0.5-1 s of
# host overhead per call on this 1-core host behind the remote compile
# service, paid by the bench's repeat passes, notebook/serving retrains,
# and the test suite alike.  jax.jit keys on input avals/shardings, so one
# bundle serves any fold count, batch geometry, x64 mode, or device layout.
# Keys are (kind, config dataclasses) — all frozen/hashable; bounded LRU so
# test suites sweeping many tiny configs can't grow it without limit.
_RUNNER_BUNDLES: "dict" = {}
_RUNNER_BUNDLES_MAX = 8


def _runner_bundle(key, build):
    bundle = _RUNNER_BUNDLES.pop(key, None)
    if bundle is None:
        bundle = build()
    _RUNNER_BUNDLES[key] = bundle          # (re-)insert as most recent
    while len(_RUNNER_BUNDLES) > _RUNNER_BUNDLES_MAX:
        _RUNNER_BUNDLES.pop(next(iter(_RUNNER_BUNDLES)))
    return bundle


def _branch_fns(model_module, mcfg: C.RNNConfig, trainer_cfg: C.TrainerConfig):
    track = trainer_cfg.track

    # per-track validation: acceptance must match dispatch exactly, or a
    # misconfigured loss silently trains with a different one (the same
    # no-silent-typos policy optim.build follows)
    allowed = (("ce",) if track == "classification"
               else ("l1", "smooth_l1"))
    if trainer_cfg.loss not in allowed:
        raise ValueError(
            f"loss {trainer_cfg.loss!r} is not valid for track "
            f"{track!r} (expected one of {allowed})")

    def train_loss(params, xs, y, mask, key):
        pred = model_module.apply(params, mcfg, xs[0], train=True, key=key)
        if track == "classification":
            loss = masked_cross_entropy_on_probs(
                pred, y.astype(jnp.int32), mask, mcfg.num_classes)
        elif trainer_cfg.loss == "l1":
            loss = l1_loss(pred.squeeze(-1), y.astype(jnp.float32), mask)
        else:
            loss = smooth_l1_loss(pred.squeeze(-1), y.astype(jnp.float32), mask)
        return loss, pred

    def eval_fn(params, xs):
        return model_module.apply(params, mcfg, xs[0], train=False)

    return train_loss, eval_fn


def _gated(results):
    """Folds whose metric gate fired at least once (the reference only
    torch-saves when the gate passes; a fold with no eligible epoch leaves
    no checkpoint)."""
    return [r for r in results if r["best"]["epoch"] >= 0]


def _save_gated(out_dir, name, r, task: str, seed: int, train_idx=None,
                dump_idx: bool = False, extras: dict | None = None):
    """Gated-best save with a self-describing JSON sidecar — task, seed,
    fold, and the fold's train indices — so any saved best is reproducible
    standalone.  With ``dump_idx`` also emits the winning train-idx
    artifact ``train_idxs_{f1:.2f}_{fold}.npy`` next to the checkpoint, as
    the reference does on gate fire
    (``Classification/audio_gru_whole.py:240``); downstream scripts (and
    ``cli check --idx-files``) consume those exact files (``:261-263``)."""
    meta = {k: v for k, v in r["best"].items() if k != "params"}
    meta.update(task=task, seed=seed, fold=r["fold"])
    if train_idx is not None:
        meta["train_idx"] = [int(i) for i in np.asarray(train_idx)]
    if extras:
        meta.update(extras)
    path = Path(out_dir) / name
    saved = checkpoints.save(path, r["best"]["params"], meta)
    if dump_idx and train_idx is not None:
        np.save(saved.parent / "train_idxs_{:.2f}_{}.npy".format(
            r["best"]["f1"], r["fold"]), np.asarray(train_idx))


def _intlist(a):
    return [int(i) for i in np.asarray(a)]


def _host_best(best):
    out = {k: (float(v) if k != "params" else v) for k, v in best.items()}
    return out


def _execute_fold(make_runner, runner_cache, params, optimizer, data,
                  fold_key, track: str, total_epochs: int,
                  chunk_epochs: int | None = None, resume_path=None,
                  init_opt_state=None):
    """Run one fold, optionally in epoch chunks with a resume bundle
    (params + opt_state + PRNG key + gated best + epochs done) written
    after every chunk — the framework's true-resume story (the reference
    always restarts from scratch, SURVEY.md §5).

    ``init_opt_state`` carries optimizer moments in from a previous fold
    (the clf-fusion cross-fold semantics — see ``_run_fusion_folds``).
    Returns (best, logs, final_params, final_opt_state).
    """
    opt_state = (init_opt_state if init_opt_state is not None
                 else optimizer.init(params))
    best = loop.init_best(track, params)
    key = fold_key
    epoch_done = 0
    logs_parts: list = []
    chunk = chunk_epochs or total_epochs

    if resume_path is not None:
        state_path = Path(str(resume_path) + ".npz")
        logs_path = Path(str(resume_path) + "_logs.npz")
        if state_path.exists():
            template = {"params": params, "opt_state": opt_state,
                        "key": key, "best": best,
                        "epoch_done": np.zeros((), np.int64)}
            state = checkpoints.load(resume_path, like=template)
            params, opt_state = state["params"], state["opt_state"]
            key, best = state["key"], state["best"]
            epoch_done = int(state["epoch_done"])
            if logs_path.exists():
                # truncate to epoch_done: the state bundle is the commit
                # point, so a logs sidecar written after it (crash in
                # between) may run ahead and must not duplicate epochs
                logs_parts.append({k: v[:epoch_done] for k, v in
                                   np.load(logs_path).items()})

    while epoch_done < total_epochs:
        n = min(chunk, total_epochs - epoch_done)
        if resume_path is not None:
            # start-of-chunk heartbeat: bounds the watchdog's no-output
            # window to ONE chunk's compile+run, not the whole fold
            print(f"# chunk starting: {Path(resume_path).name} "
                  f"epochs {epoch_done}->{epoch_done + n}/{total_epochs}",
                  file=sys.stderr, flush=True)
        if n not in runner_cache:
            runner_cache[n] = make_runner(n + 1)
        run = runner_cache[n]
        params, opt_state, key, best, logs = run(
            params, opt_state, data, key, best,
            jnp.asarray(epoch_done, jnp.int32))
        # only the resume path needs logs on host NOW (the per-chunk npz
        # sidecar); otherwise stay device-side — the caller batches every
        # fold's readback into ONE blocking fetch (the relay charges
        # ~0.45 s per blocking round-trip regardless of payload)
        logs_parts.append(jax.device_get(logs) if resume_path is not None
                          else logs)
        epoch_done += n
        if resume_path is not None:
            # logs FIRST, then the state bundle whose epoch_done commits
            # them; both atomic (checkpoints.atomic_savez), so a crash at
            # any point leaves a loadable, consistent pair
            merged = {k: np.concatenate([p[k] for p in logs_parts])
                      for k in logs_parts[0]}
            checkpoints.atomic_savez(Path(str(resume_path) + "_logs.npz"),
                                     **merged)
            checkpoints.save(resume_path, {
                "params": params, "opt_state": opt_state, "key": key,
                "best": best, "epoch_done": np.asarray(epoch_done, np.int64)})
            # heartbeat: resets the product watchdog's stall clock once
            # per committed chunk, so long chunked runs are never killed
            # as falsely-stalled (utils/watchdog.py)
            print(f"# chunk committed: {Path(resume_path).name} "
                  f"epochs {epoch_done}/{total_epochs}",
                  file=sys.stderr, flush=True)
        watchdog.maybe_inject_stall()
    if len(logs_parts) == 1:
        logs = logs_parts[0]
    elif logs_parts:
        # multi-chunk: resume-path parts are host np (concatenate there);
        # no-resume parts are device arrays (concatenate stays on device)
        cat = (np.concatenate if resume_path is not None
               else jnp.concatenate)
        logs = {k: cat([p[k] for p in logs_parts]) for k in logs_parts[0]}
    else:
        # nothing executed and no prior logs recoverable (epochs <= 1, or a
        # completed resume bundle whose logs sidecar is missing)
        logs = {}
    return best, logs, params, opt_state


def _vmapped_fold_results(fns, optimizer, tcfg, fold_datas, params_list,
                          seed: int, fold_parallel: bool = False,
                          data_parallel: int = 1, resume_dir=None,
                          chunk_epochs=None, task_name: str = "task",
                          runner_cache=None):
    """Cross-fold vmap path: all folds as one compiled program
    (:func:`..train.loop.make_multi_fold_runner`).  With ``fold_parallel``
    the stacked fold axis is additionally sharded over a
    :func:`..parallel.distributed.fold_mesh` (one device per fold), so
    3 folds run in ~1 fold's wall-clock; ``data_parallel > 1`` widens the
    mesh to 2D ``(fold, data)`` with each fold's minibatch axis sharded
    over its device group (fold x DP composition).

    ``resume_dir``/``chunk_epochs`` give the scale-out path the same
    recovery story as the serial path (:func:`_execute_fold`): the stacked
    fold state (params, opt_state, keys, gated best, epochs done) is one
    pytree, saved as ONE ``{task_name}_folds`` bundle after every chunk
    and restored — then re-sharded over the fold mesh — on restart.
    Chunked + resumed runs are bit-exact vs single-shot
    (``tests/test_resume.py``)."""
    if data_parallel > 1 and not fold_parallel:
        raise ValueError(
            "data_parallel shards each fold's batch over that fold's "
            "device group and therefore requires fold_parallel=True "
            "(otherwise it would be silently ignored)")
    train_loss, eval_fn = fns
    stacked_params = jax.tree_util.tree_map(
        lambda *ls: jnp.stack(ls), *params_list)
    opt_states = [optimizer.init(p) for p in params_list]
    stacked_opt = jax.tree_util.tree_map(
        lambda *ls: jnp.stack(ls), *opt_states)
    stacked_data = loop.stack_fold_data(fold_datas)
    keys = jnp.stack([jax.random.fold_in(jax.random.PRNGKey(seed + 1000), i)
                      for i in range(1, len(fold_datas) + 1)])
    stacked_best = jax.tree_util.tree_map(
        lambda *ls: jnp.stack(ls),
        *[loop.init_best(tcfg.track, p) for p in params_list])

    total_epochs = tcfg.epochs - 1
    epoch_done = 0
    logs_parts: list = []
    resume_path = (Path(resume_dir) / f"{task_name}_folds"
                   if resume_dir is not None else None)
    if resume_path is not None and Path(str(resume_path) + ".npz").exists():
        template = {"params": stacked_params, "opt_state": stacked_opt,
                    "keys": keys, "best": stacked_best,
                    "epoch_done": np.zeros((), np.int64)}
        state = checkpoints.load(resume_path, like=template)
        stacked_params, stacked_opt = state["params"], state["opt_state"]
        keys, stacked_best = state["keys"], state["best"]
        epoch_done = int(state["epoch_done"])
        logs_path = Path(str(resume_path) + "_logs.npz")
        if logs_path.exists():
            # truncate the [F, E, ...] epoch axis to epoch_done (the state
            # bundle is the commit point — see _execute_fold)
            logs_parts.append({k: v[:, :epoch_done] for k, v in
                               np.load(logs_path).items()})

    if fold_parallel:
        from icassp2022_depression_tpu.parallel import distributed

        if data_parallel > 1:
            mesh = distributed.fold_data_mesh(len(fold_datas),
                                              data_parallel)
            stacked_data = distributed.shard_stacked_fold_data(
                mesh, stacked_data)
        else:
            mesh = distributed.fold_mesh(len(fold_datas))
            stacked_data = distributed.shard_over_folds(mesh, stacked_data)
        stacked_params = distributed.shard_over_folds(mesh, stacked_params)
        stacked_opt = distributed.shard_over_folds(mesh, stacked_opt)
        keys = distributed.shard_over_folds(mesh, keys)
        stacked_best = distributed.shard_over_folds(mesh, stacked_best)

    chunk = chunk_epochs or total_epochs
    if runner_cache is None:
        runner_cache = {}
    while epoch_done < total_epochs:
        n = min(chunk, total_epochs - epoch_done)
        if resume_path is not None:
            # start-of-chunk watchdog heartbeat (see _execute_fold)
            print(f"# chunk starting: {Path(resume_path).name} "
                  f"epochs {epoch_done}->{epoch_done + n}/{total_epochs}",
                  file=sys.stderr, flush=True)
        if n not in runner_cache:
            runner_cache[n] = loop.make_multi_fold_runner(
                train_loss, eval_fn, optimizer, tcfg.track, tcfg.gate,
                n + 1)
        run = runner_cache[n]
        stacked_params, stacked_opt, keys, stacked_best, logs = run(
            stacked_params, stacked_opt, stacked_data, keys, stacked_best,
            jnp.asarray(epoch_done, jnp.int32))
        logs_parts.append(jax.device_get(logs))   # [F, n, ...] per chunk
        epoch_done += n
        if resume_path is not None:
            # logs first, atomically; the state bundle's epoch_done then
            # commits them (crash-consistent in either order of failure)
            merged = {k: np.concatenate([p[k] for p in logs_parts], axis=1)
                      for k in logs_parts[0]}
            checkpoints.atomic_savez(Path(str(resume_path) + "_logs.npz"),
                                     **merged)
            checkpoints.save(resume_path, {
                "params": stacked_params, "opt_state": stacked_opt,
                "keys": keys, "best": stacked_best,
                "epoch_done": np.asarray(epoch_done, np.int64)})
            # watchdog heartbeat per committed chunk (see _execute_fold)
            print(f"# chunk committed: {Path(resume_path).name} "
                  f"epochs {epoch_done}/{total_epochs}",
                  file=sys.stderr, flush=True)
        watchdog.maybe_inject_stall()
    if logs_parts:
        logs = {k: np.concatenate([p[k] for p in logs_parts], axis=1)
                for k in logs_parts[0]}
    else:  # completed bundle with a missing logs sidecar, or epochs <= 1
        logs = {}
    best = jax.device_get(stacked_best)
    results = []
    for i in range(len(fold_datas)):
        fold_best = jax.tree_util.tree_map(lambda x: x[i], best)
        fold_logs = {k: v[i] for k, v in logs.items()}
        results.append({"fold": i + 1, "best": _host_best(fold_best),
                        "logs": fold_logs})
    return results


def _run_folds(model_module, tcfg: C.TrainerConfig, fold_datas,
               seed: int, init_params_per_fold=None, resume_dir=None,
               chunk_epochs=None, task_name: str = "task",
               vmap_folds: bool = False, fold_parallel: bool = False,
               data_parallel: int = 1):
    """Shared fold loop: init -> compiled fold program -> host summary.

    All folds are padded to identical shapes (``_clf_fold_datas`` /
    ``_reg_fold_datas``) and share ONE compiled program — the optimizer and
    runner are built once from the first fold's param structure.  With
    ``vmap_folds`` all folds run as a single vmapped program;
    ``fold_parallel`` additionally shards the fold axis over one device per
    fold (implies ``vmap_folds``).  ``resume_dir`` works on both paths:
    per-fold bundles serially, one stacked-fold bundle vectorised."""
    if vmap_folds or fold_parallel:
        if init_params_per_fold is not None:
            params_list = list(init_params_per_fold)
        else:
            params_list = [
                model_module.init(
                    jax.random.fold_in(jax.random.PRNGKey(seed), i),
                    tcfg.model)
                for i in range(1, len(fold_datas) + 1)]
        def build(_params=params_list[0]):
            return (optim.build(tcfg.optimizer, _params,
                                _dead_paths(model_module)),
                    _branch_fns(model_module, tcfg.model, tcfg), {})
        optimizer, fns, runner_cache = _runner_bundle(
            ("vmap", model_module.__name__, tcfg), build)
        return _vmapped_fold_results(fns, optimizer, tcfg, fold_datas,
                                     params_list, seed,
                                     fold_parallel=fold_parallel,
                                     data_parallel=data_parallel,
                                     resume_dir=resume_dir,
                                     chunk_epochs=chunk_epochs,
                                     task_name=task_name,
                                     runner_cache=runner_cache)
    results = []
    make_runner = None
    runner_cache: dict = {}
    optimizer = None
    for fold_idx, data in enumerate(fold_datas, start=1):
        if init_params_per_fold is not None:
            params = init_params_per_fold[fold_idx - 1]
        else:
            key = jax.random.fold_in(jax.random.PRNGKey(seed), fold_idx)
            params = model_module.init(key, tcfg.model)
        if make_runner is None:
            def build(_params=params):
                opt = optim.build(tcfg.optimizer, _params,
                                  _dead_paths(model_module))
                train_loss, eval_fn = _branch_fns(model_module, tcfg.model,
                                                  tcfg)

                def make_runner(epochs, _tl=train_loss, _ef=eval_fn,
                                _opt=opt):
                    return loop.make_fold_runner(_tl, _ef, _opt, tcfg.track,
                                                 tcfg.gate, epochs)
                return opt, make_runner, {}
            optimizer, make_runner, runner_cache = _runner_bundle(
                ("serial", model_module.__name__, tcfg), build)
        fold_key = jax.random.fold_in(jax.random.PRNGKey(seed + 1000), fold_idx)
        resume_path = (Path(resume_dir) / f"{task_name}_fold{fold_idx}"
                       if resume_dir is not None else None)
        with profiling.annotate(f"{task_name}/fold{fold_idx}"):
            best, logs, _, _ = _execute_fold(make_runner, runner_cache,
                                             params, optimizer, data,
                                             fold_key, tcfg.track,
                                             tcfg.epochs - 1, chunk_epochs,
                                             resume_path)
        results.append({"fold": fold_idx, "best": best, "logs": logs})
    return _folds_to_host(results)


def _folds_to_host(results):
    """ONE blocking readback for every fold's metrics/logs, applied after
    the last fold is dispatched: the serial fold loop enqueues its
    programs back-to-back and never syncs in between (behind the relay a
    blocking fetch costs ~0.45 s regardless of payload, so per-fold syncs
    would dominate the train wall-clock).  Best-params stay on device."""
    fetched = jax.device_get(
        [({k: v for k, v in r["best"].items() if k != "params"}, r["logs"])
         for r in results])
    return [{"fold": r["fold"],
             "best": {**_host_best(b), "params": r["best"]["params"]},
             "logs": logs}
            for r, (b, logs) in zip(results, fetched)]


# ---------------------------------------------------------------------------
# Classification track
# ---------------------------------------------------------------------------


def _device_resident(feature_arrays):
    """True when any pristine feature array already lives on device (the
    fused extract->train pipeline: ``extract_batch(device=True)`` output
    fed straight to a trainer).  Those folds are then materialised by
    on-device gathers (``loop.fold_data_from_plans``) so features never
    cross the relay back to the host."""
    return any(isinstance(a, jax.Array) for a in feature_arrays)


def _plan_fold_datas(feature_arrays, plans, batch_size):
    """Build every fold's FoldData from (train_plan, test_plan) pairs with
    on-device gathers; all folds padded to identical shapes so the
    compiled fold program is shared (same policy as the host path)."""
    test_total = max(len(te.targets) for _, te in plans)
    train_total = max(len(tr.targets) for tr, _ in plans)
    return [loop.fold_data_from_plans(feature_arrays, tr, te, batch_size,
                                      test_total, train_total)
            for tr, te in plans]


def _clf_fold_datas(feature_arrays, targets, train_folds_idx, batch_size,
                    fold_cfg: C.FoldConfig = C.FoldConfig()):
    dep = np.where(np.asarray(targets) == 1)[0]
    non = np.where(np.asarray(targets) == 0)[0]
    if _device_resident(feature_arrays):
        plans = [augment.plan_classification_fold(
            targets, tr_idx, dep, non,
            train_perm_ids=fold_cfg.train_perm_ids,
            test_perm_ids=fold_cfg.test_perm_ids)
            for tr_idx in train_folds_idx]
        return _plan_fold_datas(feature_arrays, plans, batch_size)
    raw = []
    for tr_idx in train_folds_idx:
        (xtr, ytr), (xte, yte) = augment.augment_classification_fold(
            feature_arrays, targets, tr_idx, dep, non,
            train_perm_ids=fold_cfg.train_perm_ids,
            test_perm_ids=fold_cfg.test_perm_ids)
        raw.append((xtr, ytr, xte, yte))
    test_total = max(len(yte) for _, _, _, yte in raw)
    train_total = max(len(ytr) for _, ytr, _, _ in raw)
    return [loop.make_fold_data(xtr, ytr, xte, yte, batch_size, test_total,
                                train_total)
            for xtr, ytr, xte, yte in raw]


def train_audio_clf(features: np.ndarray, targets: np.ndarray,
                    train_folds_idx: Sequence[np.ndarray],
                    tcfg: C.TrainerConfig = C.AUDIO_CLF,
                    out_dir: Optional[Path] = None, seed: int = 0,
                    resume_dir=None, chunk_epochs=None,
                    vmap_folds: bool = False, fold_parallel: bool = False,
                    data_parallel: int = 1,
                    fold_cfg: C.FoldConfig = C.FoldConfig(),
                    meta_extras: dict | None = None):
    """3-fold audio GRU classifier.  ``features``: [N, 3, 256]."""
    datas = _clf_fold_datas([features], targets, train_folds_idx,
                            tcfg.batch_size, fold_cfg)
    results = _run_folds(audio_net, tcfg, datas, seed,
                         resume_dir=resume_dir, chunk_epochs=chunk_epochs,
                         task_name="audio_clf", vmap_folds=vmap_folds,
                         fold_parallel=fold_parallel,
                         data_parallel=data_parallel)
    if out_dir is not None:
        for r in _gated(results):
            name = checkpoints.audio_clf_name(
                tcfg.model.embedding_size, tcfg.model.hidden_dims,
                r["best"]["f1"], r["fold"])
            _save_gated(out_dir, name, r, "audio_clf", seed,
                        train_idx=train_folds_idx[r["fold"] - 1],
                        dump_idx=True, extras=meta_extras)
    return results


def train_text_clf(features: np.ndarray, targets: np.ndarray,
                   train_folds_idx: Sequence[np.ndarray],
                   tcfg: C.TrainerConfig = C.TEXT_CLF,
                   out_dir: Optional[Path] = None, seed: int = 0,
                   resume_dir=None, chunk_epochs=None,
                   vmap_folds: bool = False, fold_parallel: bool = False,
                   data_parallel: int = 1,
                   fold_cfg: C.FoldConfig = C.FoldConfig(),
                   meta_extras: dict | None = None):
    """3-fold text BiLSTM classifier.  ``features``: [N, 3, 1024]."""
    datas = _clf_fold_datas([features], targets, train_folds_idx,
                            tcfg.batch_size, fold_cfg)
    results = _run_folds(text_net, tcfg, datas, seed,
                         resume_dir=resume_dir, chunk_epochs=chunk_epochs,
                         task_name="text_clf", vmap_folds=vmap_folds,
                         fold_parallel=fold_parallel,
                         data_parallel=data_parallel)
    if out_dir is not None:
        for r in _gated(results):
            name = checkpoints.text_clf_name(
                tcfg.model.hidden_dims, r["best"]["f1"], r["fold"])
            _save_gated(out_dir, name, r, "text_clf", seed,
                        train_idx=train_folds_idx[r["fold"] - 1],
                        dump_idx=True, extras=meta_extras)
    return results


def _fusion_fns(fcfg: C.FusionConfig, tcfg: C.TrainerConfig):
    track = tcfg.track

    def train_loss(params, xs, y, mask, key):
        x_audio, x_text = xs
        tf, af = fusion.pretrained_feature(params, fcfg, x_audio, x_text,
                                           train=True, key=key)
        w = params["fc_final"]["w"]
        if track == "classification":
            loss = losses.myloss_ce(tf, af, y.astype(jnp.int32), w,
                                    fcfg.text_hidden_dims, mask)
        else:
            loss = losses.myloss_smooth_l1(tf, af, y, w,
                                           fcfg.text_hidden_dims, mask)
        pred = fusion.forward(params, fcfg, jnp.concatenate([tf, af], axis=-1))
        return loss, pred

    def eval_fn(params, xs):
        # the frozen branch features for the (fixed) test split are
        # precomputed once per fold (_run_fusion_folds) — identical values
        # to recomputing them every epoch, since the branches never train —
        # so per-epoch eval is just the fusion head.
        return fusion.forward(params, fcfg, xs[0])

    return train_loss, eval_fn


def _vmapped_fusion_results(fcfg, tcfg, fold_datas, branch_params, seed,
                            track, fold_parallel: bool = False,
                            resume_dir=None, chunk_epochs=None,
                            task_name: str = "fuse"):
    """Regression-track fusion folds as one vmapped (optionally
    fold-sharded) program — valid because every reg fold starts fresh
    (``Regression/fuse_net.py:549-552``); per-fold init and PRNG keys are
    identical to the serial path."""
    precompute = jax.jit(
        lambda p, xa, xt: fusion.pretrained_feature(p, fcfg, xa, xt,
                                                    train=False))
    params_list, datas = [], []
    for fold_idx, data in enumerate(fold_datas, start=1):
        base = fusion.init(
            jax.random.fold_in(jax.random.PRNGKey(seed), fold_idx), fcfg)
        text_p, audio_p = branch_params[fold_idx - 1]
        params = fusion.init_from_branches(base, fcfg, text_p, audio_p,
                                           track)
        tf_te, af_te = precompute(params, data.test_x[0], data.test_x[1])
        datas.append(data._replace(
            test_x=(jnp.concatenate([tf_te, af_te], axis=-1),)))
        params_list.append(params)
    def build(_params=params_list[0]):
        return (optim.build(tcfg.optimizer, _params),
                _fusion_fns(fcfg, tcfg), {})
    optimizer, fns, runner_cache = _runner_bundle(
        ("fusion_vmap", fcfg, tcfg), build)
    return _vmapped_fold_results(fns, optimizer, tcfg, datas, params_list,
                                 seed, fold_parallel=fold_parallel,
                                 resume_dir=resume_dir,
                                 chunk_epochs=chunk_epochs,
                                 task_name=task_name,
                                 runner_cache=runner_cache)


def _run_fusion_folds(fcfg, tcfg, fold_datas, branch_params, seed, track,
                      resume_dir=None, chunk_epochs=None,
                      task_name: str = "fuse", vmap_folds: bool = False,
                      fold_parallel: bool = False):
    """Fold loop for the fusion trainers.

    Cross-fold state semantics mirror the reference exactly:

    * classification (``fuse_net_whole.py:413-416``): the fusion net and
      its Adam optimizer are created ONCE — per fold only the branch
      tensors are replaced by the ``strict=False`` checkpoint loads, so
      fold k+1 *continues* from fold k's trained ``fc_final`` weights and
      accumulated Adam moments (``carry_across_folds``);
    * regression (``Regression/fuse_net.py:549-552``): model and optimizer
      are re-created inside the fold loop — every fold starts fresh,
      which is why ``vmap_folds``/``fold_parallel`` are available for the
      regression track only: the clf track's fold k+1 *inputs* (params +
      Adam moments) are fold k's *outputs*, a sequential chain that no
      amount of fold vectorisation can break without changing the
      reference's training semantics.
    """
    carry_across_folds = (track == "classification")
    if vmap_folds or fold_parallel:
        if carry_across_folds:
            raise ValueError(
                "fold vectorisation is impossible for the clf fusion "
                "trainer: the reference chains folds sequentially — fold "
                "k+1 starts from fold k's trained fc_final weights and "
                "accumulated Adam moments (fuse_net_whole.py:413-416) — "
                "so fold programs cannot run concurrently")
        return _vmapped_fusion_results(fcfg, tcfg, fold_datas,
                                       branch_params, seed, track,
                                       fold_parallel=fold_parallel,
                                       resume_dir=resume_dir,
                                       chunk_epochs=chunk_epochs,
                                       task_name=task_name)
    results = []
    make_runner = None
    runner_cache: dict = {}
    optimizer = None
    carried_params = None
    carried_opt_state = None
    # one jitted callable reused across folds (identical padded shapes ->
    # a single compilation instead of one per fold)
    precompute = jax.jit(
        lambda p, xa, xt: fusion.pretrained_feature(p, fcfg, xa, xt,
                                                    train=False))
    for fold_idx, data in enumerate(fold_datas, start=1):
        if carry_across_folds and carried_params is not None:
            base = carried_params
        else:
            base_key = (jax.random.PRNGKey(seed) if carry_across_folds
                        else jax.random.fold_in(jax.random.PRNGKey(seed),
                                                fold_idx))
            base = fusion.init(base_key, fcfg)
        text_p, audio_p = branch_params[fold_idx - 1]
        params = fusion.init_from_branches(base, fcfg, text_p, audio_p, track)
        if make_runner is None:
            def build(_params=params):
                opt = optim.build(tcfg.optimizer, _params)
                train_loss, eval_fn = _fusion_fns(fcfg, tcfg)

                def make_runner(epochs, _tl=train_loss, _ef=eval_fn,
                                _opt=opt):
                    return loop.make_fold_runner(_tl, _ef, _opt, tcfg.track,
                                                 tcfg.gate, epochs)
                return opt, make_runner, {}
            optimizer, make_runner, runner_cache = _runner_bundle(
                ("fusion", fcfg, tcfg), build)
        # precompute the frozen-branch eval features for this fold's test
        # split (deterministic; the branches receive no gradients)
        tf_te, af_te = precompute(params, data.test_x[0], data.test_x[1])
        data = data._replace(
            test_x=(jnp.concatenate([tf_te, af_te], axis=-1),))
        fold_key = jax.random.fold_in(jax.random.PRNGKey(seed + 1000), fold_idx)
        resume_path = (Path(resume_dir) / f"{task_name}_fold{fold_idx}"
                       if resume_dir is not None else None)
        best, logs, final_params, final_opt_state = _execute_fold(
            make_runner, runner_cache, params, optimizer, data, fold_key,
            tcfg.track, tcfg.epochs - 1, chunk_epochs, resume_path,
            init_opt_state=carried_opt_state if carry_across_folds else None)
        if carry_across_folds:
            # the carryover is device pytrees feeding the next fold's
            # program — no host sync needed between folds
            carried_params = final_params
            carried_opt_state = final_opt_state
        results.append({"fold": fold_idx, "best": best, "logs": logs})
    return _folds_to_host(results)


def train_fuse_clf(audio_features: np.ndarray, text_features: np.ndarray,
                   targets: np.ndarray,
                   train_folds_idx: Sequence[np.ndarray],
                   branch_params: Sequence[tuple],
                   fcfg: C.FusionConfig = C.FUSE_CLF,
                   tcfg: C.TrainerConfig = C.FUSE_CLF_TRAINER,
                   out_dir: Optional[Path] = None, seed: int = 0,
                   resume_dir=None, chunk_epochs=None,
                   vmap_folds: bool = False, fold_parallel: bool = False,
                   fold_cfg: C.FoldConfig = C.FoldConfig(),
                   meta_extras: dict | None = None):
    """3-fold multimodal fusion classifier.  ``branch_params[fold]`` is the
    (text_params, audio_params) pair from the pretrained branch trainers
    (replacing the reference's state-dict surgery).  ``vmap_folds``/
    ``fold_parallel`` raise: the clf track chains folds sequentially (see
    ``_run_fusion_folds``)."""
    datas = _clf_fold_datas([audio_features, text_features], targets,
                            train_folds_idx, tcfg.batch_size, fold_cfg)
    results = _run_fusion_folds(fcfg, tcfg, datas, branch_params, seed,
                                "classification", resume_dir=resume_dir,
                                chunk_epochs=chunk_epochs,
                                task_name="fuse_clf", vmap_folds=vmap_folds,
                                fold_parallel=fold_parallel)
    if out_dir is not None:
        for r in _gated(results):
            name = checkpoints.fuse_clf_name(r["best"]["f1"], r["fold"])
            _save_gated(out_dir, name, r, "fuse_clf", seed,
                        train_idx=train_folds_idx[r["fold"] - 1],
                        dump_idx=True, extras=meta_extras)
    return results


# ---------------------------------------------------------------------------
# Regression track
# ---------------------------------------------------------------------------


def _reg_fold_datas(feature_arrays, targets, dep_idxs, non_idxs, batch_size,
                    fold_cfg: C.FoldConfig = C.FoldConfig()):
    splits = [folds.reg_fold_split(dep_idxs, non_idxs, fold,
                                   fold_cfg.reg_test_dep,
                                   fold_cfg.reg_test_non)
              for fold in range(fold_cfg.n_folds)]
    if _device_resident(feature_arrays):
        plans = [augment.plan_regression_fold(
            targets, tr_d, tr_n, te_d, te_n, fold_cfg.reg_augment_first_n)
            for tr_d, tr_n, te_d, te_n in splits]
        return _plan_fold_datas(feature_arrays, plans, batch_size)
    raw = []
    for tr_d, tr_n, te_d, te_n in splits:
        (xtr, ytr), (xte, yte) = augment.augment_regression_fold(
            feature_arrays, targets, tr_d, tr_n, te_d, te_n,
            fold_cfg.reg_augment_first_n)
        raw.append((xtr, ytr, xte, yte))
    test_total = max(len(yte) for _, _, _, yte in raw)
    train_total = max(len(ytr) for _, ytr, _, _ in raw)
    return [loop.make_fold_data(xtr, ytr, xte, yte, batch_size, test_total,
                                train_total)
            for xtr, ytr, xte, yte in raw]


def train_audio_reg(features: np.ndarray, targets: np.ndarray,
                    dep_idxs: np.ndarray, non_idxs: np.ndarray,
                    tcfg: C.TrainerConfig = C.AUDIO_REG,
                    out_dir: Optional[Path] = None, seed: int = 0,
                    resume_dir=None, chunk_epochs=None,
                    vmap_folds: bool = False, fold_parallel: bool = False,
                    data_parallel: int = 1, meta_extras: dict | None = None,
                    fold_cfg: C.FoldConfig = C.FoldConfig()):
    """3-fold audio GRU SDS-score regressor (L1 loss, MAE gating).

    Pass the SAME ``fold_cfg`` here and to ``train_fuse_reg`` — the
    fusion trainer re-derives these splits, so a mismatch would leak
    branch training rows into the fusion test set."""
    datas = _reg_fold_datas([features], targets, dep_idxs, non_idxs,
                            tcfg.batch_size, fold_cfg)
    results = _run_folds(audio_net, tcfg, datas, seed,
                         resume_dir=resume_dir, chunk_epochs=chunk_epochs,
                         task_name="audio_reg", vmap_folds=vmap_folds,
                         fold_parallel=fold_parallel,
                         data_parallel=data_parallel)
    if out_dir is not None:
        for r in _gated(results):
            name = checkpoints.audio_reg_name(
                tcfg.model.embedding_size, tcfg.model.hidden_dims,
                r["best"]["mae"])
            _save_gated(Path(out_dir) / f"Audio{r['fold']}", name, r,
                        "audio_reg", seed,
                        extras={"dep_idxs": _intlist(dep_idxs),
                                "non_idxs": _intlist(non_idxs),
                                **(meta_extras or {})})
    return results


def train_text_reg(features: np.ndarray, targets: np.ndarray,
                   dep_idxs: np.ndarray, non_idxs: np.ndarray,
                   tcfg: C.TrainerConfig = C.TEXT_REG,
                   out_dir: Optional[Path] = None, seed: int = 0,
                   resume_dir=None, chunk_epochs=None,
                   vmap_folds: bool = False, fold_parallel: bool = False,
                   data_parallel: int = 1, meta_extras: dict | None = None,
                   fold_cfg: C.FoldConfig = C.FoldConfig()):
    """As :func:`train_audio_reg` (SmoothL1; same ``fold_cfg`` caveat)."""
    datas = _reg_fold_datas([features], targets, dep_idxs, non_idxs,
                            tcfg.batch_size, fold_cfg)
    results = _run_folds(text_net, tcfg, datas, seed,
                         resume_dir=resume_dir, chunk_epochs=chunk_epochs,
                         task_name="text_reg", vmap_folds=vmap_folds,
                         fold_parallel=fold_parallel,
                         data_parallel=data_parallel)
    if out_dir is not None:
        for r in _gated(results):
            name = checkpoints.text_reg_name(tcfg.model.hidden_dims,
                                             r["best"]["mae"])
            _save_gated(Path(out_dir) / f"Text{r['fold']}", name, r,
                        "text_reg", seed,
                        extras={"dep_idxs": _intlist(dep_idxs),
                                "non_idxs": _intlist(non_idxs),
                                **(meta_extras or {})})
    return results


def train_fuse_reg(audio_features: np.ndarray, text_features: np.ndarray,
                   targets: np.ndarray, dep_idxs: np.ndarray,
                   non_idxs: np.ndarray, branch_params: Sequence[tuple],
                   fcfg: C.FusionConfig = C.FUSE_REG,
                   tcfg: C.TrainerConfig = C.FUSE_REG_TRAINER,
                   out_dir: Optional[Path] = None, seed: int = 0,
                   resume_dir=None, chunk_epochs=None,
                   vmap_folds: bool = False, fold_parallel: bool = False,
                   fold_cfg: C.FoldConfig = C.FoldConfig(),
                   meta_extras: dict | None = None):
    datas = _reg_fold_datas([audio_features, text_features], targets,
                            dep_idxs, non_idxs, tcfg.batch_size, fold_cfg)
    results = _run_fusion_folds(fcfg, tcfg, datas, branch_params, seed,
                                "regression", resume_dir=resume_dir,
                                chunk_epochs=chunk_epochs,
                                task_name="fuse_reg", vmap_folds=vmap_folds,
                                fold_parallel=fold_parallel)
    if out_dir is not None:
        for r in _gated(results):
            name = checkpoints.fuse_reg_name(r["best"]["mae"])
            _save_gated(Path(out_dir) / f"Fuse{r['fold']}", name, r,
                        "fuse_reg", seed,
                        extras={"dep_idxs": _intlist(dep_idxs),
                                "non_idxs": _intlist(non_idxs),
                                **(meta_extras or {})})
    return results
