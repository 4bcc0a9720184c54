"""Checkpoint I/O: pytree <-> npz, plus the gated "save best" naming scheme.

The reference pickles whole torch modules gated on metric improvement
(``audio_gru_whole.py:123-126,233-243``) and never resumes.  Here
checkpoints are flat param pytrees written as ``.npz`` with '/'-joined key
paths (framework-neutral, no pickling), carrying a JSON metadata sidecar
(metrics, fold, epoch, config name) — and a full resume bundle
(params + opt_state + PRNG key) is supported at fold granularity, since one
fold is a single compiled program.

Checkpoint filenames mirror the reference's metric-encoded names, e.g.
``BiLSTM_gru_vlad256_256_{f1:.2f}_{fold}`` (``audio_gru_whole.py:239``) and
``gru_vlad256_256_{mae:.2f}`` (``audio_bilstm_perm.py:208``).
"""

from __future__ import annotations

import json
import os
from pathlib import Path

import jax
import numpy as np


def atomic_savez(path, **arrays) -> Path:
    """``np.savez`` through a temp file + ``os.replace`` so a crash
    mid-write can never leave a truncated (unloadable) archive — resume
    bundles are the crash-recovery mechanism and must survive the crash
    themselves."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    tmp = path.with_name(path.name + ".tmp")
    with open(tmp, "wb") as f:
        np.savez(f, **arrays)
    os.replace(tmp, path)
    return path


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        # covers optax NamedTuple states too (flattened positionally)
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}{i}/"))
    elif tree is None:
        pass
    else:
        out[prefix[:-1]] = np.asarray(jax.device_get(tree))
    return out


def save(path, params, meta: dict | None = None) -> Path:
    """Write params pytree to ``<path>.npz`` (+ ``<path>.json`` metadata).

    A path already ending in ``.npz`` is accepted as-is (mirroring
    :func:`load`'s suffix handling) — without this,
    ``save('x.npz')``/``load('x.npz')`` would silently target different
    files (``x.npz.npz`` vs ``x.npz``)."""
    path = Path(path)
    if path.suffix == ".npz":
        path = path.with_suffix("")
    path.parent.mkdir(parents=True, exist_ok=True)
    flat = _flatten(params)
    atomic_savez(str(path) + ".npz", **flat)
    if meta is not None:
        # atomic like the npz payload: a crash mid-write must not leave a
        # truncated .json beside a valid checkpoint
        tmp = Path(str(path) + ".json.tmp")
        tmp.write_text(json.dumps(meta, indent=2))
        os.replace(tmp, str(path) + ".json")
    return Path(str(path) + ".npz")


def load(path, like=None):
    """Read ``<path>.npz`` back into a pytree.  With ``like`` (a template
    pytree), the structure is reconstructed to match it exactly; without it,
    a nested dict keyed by path segments (ints become list indices only with
    ``like``)."""
    path = str(path)
    if path.endswith(".pt"):
        # a reference torch pickle would otherwise be probed as x.pt.npz —
        # point callers at the extension-dispatched loader instead
        raise ValueError(
            f"{path} is a torch .pt checkpoint — load it through "
            "models.porting.load_params/params_from_reference_pt (the "
            "check/predict/serve entry points dispatch on the extension)")
    if not path.endswith(".npz"):
        path += ".npz"
    data = dict(np.load(path))
    if like is None:
        nested: dict = {}
        for key, val in data.items():
            parts = key.split("/")
            d = nested
            for p in parts[:-1]:
                d = d.setdefault(p, {})
            d[parts[-1]] = val
        return nested

    def rebuild(template, prefix=""):
        if isinstance(template, dict):
            return {k: rebuild(v, f"{prefix}{k}/") for k, v in template.items()}
        if isinstance(template, (list, tuple)):
            seq = [rebuild(v, f"{prefix}{i}/") for i, v in enumerate(template)]
            if hasattr(template, "_fields"):   # NamedTuple (optax states)
                return type(template)(*seq)
            return type(template)(seq) if isinstance(template, tuple) else seq
        if template is None:
            return None
        return data[prefix[:-1]]

    return rebuild(like)


def save_orbax(path, params) -> Path:
    """Orbax-backed save (ecosystem-standard pytree checkpoints with async
    IO and atomicity guarantees) — optional alternative to the npz format;
    both round-trip the same param trees."""
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, jax.device_get(params), force=True)
    return path


def load_orbax(path, like):
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        template = jax.tree_util.tree_map(np.asarray, jax.device_get(like))
        return ckptr.restore(Path(path).absolute(), template)


def load_meta(path) -> dict:
    p = str(path)
    if p.endswith(".npz"):
        p = p[:-4]
    return json.loads(Path(p + ".json").read_text())


# -- reference-style checkpoint names ---------------------------------------


def audio_clf_name(embedding_size: int, hidden_dims: int, f1: float,
                   fold: int) -> str:
    return f"BiLSTM_gru_vlad{embedding_size}_{hidden_dims}_{f1:.2f}_{fold}"


def text_clf_name(hidden_dims: int, f1: float, fold: int) -> str:
    return f"BiLSTM_{hidden_dims}_{f1:.2f}_{fold}"


def fuse_clf_name(f1: float, fold: int) -> str:
    return f"fuse_{f1:.2f}_{fold}"


def audio_reg_name(embedding_size: int, hidden_dims: int, mae: float) -> str:
    return f"gru_vlad{embedding_size}_{hidden_dims}_{mae:.2f}"


def text_reg_name(hidden_dims: int, mae: float) -> str:
    return f"BiLSTM_{hidden_dims}_{mae:.2f}"


def fuse_reg_name(mae: float) -> str:
    return f"fuse_{mae:.2f}"
