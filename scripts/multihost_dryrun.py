"""TRUE multi-process distributed dryrun (no pod required).

The virtual 8-device CPU mesh used by tests and ``dryrun_multichip``
validates shardings inside ONE process; this script validates the actual
multi-host machinery — ``parallel/distributed.initialize`` coordinating
separate OS processes over TCP, Gloo CPU collectives, and a cross-process
data-parallel training step (``parallel/collectives.dp_train_step``) —
and checks the distributed step reproduces the single-process result.

Parent mode (default): spawns ``--nprocs`` children (one "host" each,
``--local-devices`` virtual CPU devices per host), computes the serial
single-process reference step on the same global batch, and asserts every
process reports the same loss/param-sum as the reference (atol 1e-5).

Child mode (``--child``): initialises jax.distributed THROUGH THE PRODUCT
PATH, builds a global data mesh over all processes' devices, feeds its
process-local batch shard via ``jax.make_array_from_process_local_data``,
runs one dp_train_step, prints a JSON result line.

Usage:  python scripts/multihost_dryrun.py [--nprocs 2 --local-devices 2]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)
PORT = 19357   # default; parent picks a free one per run (--port)
GLOBAL_BATCH = 8
DIM = 16


def _make_batch():
    import numpy as np

    rng = np.random.default_rng(0)
    x = rng.standard_normal((GLOBAL_BATCH, 3, DIM)).astype(np.float32)
    y = rng.integers(0, 2, GLOBAL_BATCH)
    mask = np.ones(GLOBAL_BATCH, np.float32)
    return x, y, mask


def _model_bits():
    import jax

    from icassp2022_depression_tpu import config as C
    from icassp2022_depression_tpu.models import audio_net
    from icassp2022_depression_tpu.train import optim, trainers

    tcfg = C.replace(
        C.AUDIO_CLF,
        model=C.replace(C.AUDIO_CLF.model, embedding_size=DIM,
                        hidden_dims=DIM))
    params = audio_net.init(jax.random.PRNGKey(0), tcfg.model)
    optimizer = optim.build(tcfg.optimizer, params,
                            trainers._dead_paths(audio_net))
    train_loss, _ = trainers._branch_fns(audio_net, tcfg.model, tcfg)
    return params, optimizer, train_loss


def child(pid: int, nprocs: int, local_devices: int,
          port: int = PORT) -> None:
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")

    from icassp2022_depression_tpu.parallel import collectives, distributed

    # the PRODUCT multi-process entry point
    distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=nprocs, process_id=pid)
    assert jax.process_count() == nprocs, jax.process_count()

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    mesh = Mesh(np.asarray(jax.devices()), ("data",))

    # sanity: a raw cross-process collective
    psum = jax.shard_map(lambda v: jax.lax.psum(v, "data"), mesh=mesh,
                         in_specs=P("data"), out_specs=P(),
                         check_vma=False)(
        jnp.ones(len(jax.devices())))
    assert float(psum[0]) == len(jax.devices()), psum

    params, optimizer, train_loss = _model_bits()
    opt_state = optimizer.init(params)
    x, y, mask = _make_batch()

    # each process contributes its LOCAL rows of the global batch
    data_sh = NamedSharding(mesh, P("data"))
    rows_per_proc = GLOBAL_BATCH // nprocs
    lo = pid * rows_per_proc

    def put(arr):
        return jax.make_array_from_process_local_data(
            data_sh, arr[lo:lo + rows_per_proc], arr.shape)

    step = collectives.dp_train_step(train_loss, optimizer, mesh)
    new_params, _, loss, _ = step(params, opt_state, jax.random.PRNGKey(9),
                                  (put(x),), put(y), put(mask))
    psum_params = float(sum(jnp.sum(jnp.abs(leaf)) for leaf in
                            jax.tree_util.tree_leaves(new_params)))
    print(json.dumps({"pid": pid, "processes": jax.process_count(),
                      "devices": jax.device_count(),
                      "loss": float(loss), "param_l1": psum_params}),
          flush=True)


def _serial_reference():
    """Single-process reference: plain global-batch gradient step.  Note
    dp_train_step folds the shard index into the dropout key; the tiny
    audio model's loss path is deterministic at eval-scale dims only under
    train=True dropout — so compare via the SAME dp_train_step on a
    single-process mesh over all local devices (identical collective
    semantics, no multi-process machinery)."""
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from icassp2022_depression_tpu.parallel import collectives

    mesh = Mesh(np.asarray(jax.devices()), ("data",))
    params, optimizer, train_loss = _model_bits()
    opt_state = optimizer.init(params)
    x, y, mask = _make_batch()
    sh = NamedSharding(mesh, P("data"))
    step = collectives.dp_train_step(train_loss, optimizer, mesh)
    new_params, _, loss, _ = step(
        params, opt_state, jax.random.PRNGKey(9),
        (jax.device_put(jnp.asarray(x), sh),),
        jax.device_put(jnp.asarray(y), sh),
        jax.device_put(jnp.asarray(mask), sh))
    l1 = float(sum(jnp.sum(jnp.abs(leaf)) for leaf in
                   jax.tree_util.tree_leaves(new_params)))
    return float(loss), l1


def parent(nprocs: int, local_devices: int) -> int:
    total = nprocs * local_devices
    if GLOBAL_BATCH % nprocs or GLOBAL_BATCH % total:
        raise SystemExit(
            f"GLOBAL_BATCH={GLOBAL_BATCH} must divide evenly over "
            f"--nprocs {nprocs} and the {total} total devices "
            "(sharding over the data axis requires it)")
    # a fresh ephemeral coordinator port per run: a previous run's
    # lingering/orphaned coordinator on the fixed default cannot collide
    import socket

    with socket.socket() as s_:
        s_.bind(("127.0.0.1", 0))
        port = s_.getsockname()[1]
    from __graft_entry__ import _force_device_count_flag

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # REPLACE any pre-existing device-count flag (appending would leave
    # two conflicting occurrences and first-occurrence-wins parsing
    # would ignore ours)
    env["XLA_FLAGS"] = _force_device_count_flag(
        env.get("XLA_FLAGS", ""), local_devices)
    procs = [subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--child", str(pid),
         "--nprocs", str(nprocs), "--local-devices", str(local_devices),
         "--port", str(port)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
        for pid in range(nprocs)]
    # drain ALL children concurrently: a sequential communicate() would
    # leave later children's pipes unread while waiting on child 0 — a
    # child that fills its 64 KB stderr pipe then blocks mid-collective
    # and deadlocks the whole group until the timeout
    import threading

    outs: list = [None] * nprocs

    def _drain(pid: int, proc) -> None:
        try:
            outs[pid] = proc.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            proc.kill()
            outs[pid] = proc.communicate()

    threads = [threading.Thread(target=_drain, args=(pid, proc))
               for pid, proc in enumerate(procs)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    results = []
    for pid, proc in enumerate(procs):
        out, err = outs[pid]
        if proc.returncode != 0:
            sys.stderr.write(err[-2000:])
            print(f"child {pid} failed (rc={proc.returncode})")
            return 1
        results.append(json.loads(out.strip().splitlines()[-1]))

    # serial reference in THIS process (same total device count)
    os.environ["XLA_FLAGS"] = _force_device_count_flag(
        os.environ.get("XLA_FLAGS", ""), total)
    ref_loss, ref_l1 = _serial_reference()

    ok = True
    for r in results:
        ok &= (r["processes"] == nprocs and r["devices"] == total)
        ok &= abs(r["loss"] - ref_loss) < 1e-5
        ok &= abs(r["param_l1"] - ref_l1) < 1e-4
    print(json.dumps({"multihost": "ok" if ok else "MISMATCH",
                      "nprocs": nprocs, "devices_total": total,
                      "loss": results[0]["loss"], "ref_loss": ref_loss,
                      "param_l1": results[0]["param_l1"],
                      "ref_param_l1": ref_l1}))
    return 0 if ok else 1


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--child", type=int, default=None)
    ap.add_argument("--nprocs", type=int, default=2)
    ap.add_argument("--local-devices", type=int, default=2)
    ap.add_argument("--port", type=int, default=PORT)
    a = ap.parse_args()
    if a.child is not None:
        child(a.child, a.nprocs, a.local_devices, a.port)
    else:
        sys.exit(parent(a.nprocs, a.local_devices))
