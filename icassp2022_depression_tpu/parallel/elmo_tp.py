"""Tensor-parallel LSTMP biLM: the FLOP-heavy pretrained-text encoder
sharded over the mesh's ``model`` axis.

The zhs biLM cell (``ops/rnn.py::lstmp_layer``, allennlp
``LstmCellWithProjection`` semantics — the component behind the
reference's slowest modality, ``Classification/text_features_whole.py:40``)
is a classic Megatron-style TP candidate: its 4096-wide cell dimension
dominates both FLOPs and weights, while the projected state ``h`` is only
512 wide.  Sharding layout:

* ``w_x [4C, In]`` / ``w_h [4C, P]`` / ``b [4C]`` — reshaped to expose the
  cell dim (``[4, C, ...]``) and column-sharded over ``model``: each device
  computes its ``C/d`` slice of all four gates from the REPLICATED ``h``;
* the memory cell ``c`` lives sharded (``[B, C/d]`` per device) — it is
  elementwise, never communicated;
* ``w_p [P, C]`` — input-sharded over ``model``: each device contributes a
  partial ``[B, P]`` projection, combined with ONE ``psum`` per step (the
  only collective; ``B*P`` floats over ICI, ~128 KB at B=64).

Per step each device does ``h @ w_h_shard`` (``[B,P]x[P,4C/d]``) and the
partial projection (``[B,C/d]x[C/d,P]``) — 1/d of the serial FLOPs and,
more importantly for this HBM-bound kernel, 1/d of the weight stream per
device.  Outputs are bit-compatible with the serial scan up to the psum's
reduction order (tested at 1e-5 on the virtual CPU mesh).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from icassp2022_depression_tpu.models import elmo as elmo_mod


def shard_lstmp_params(mesh: Mesh, p: dict, axis: str = "model") -> dict:
    """Place one LSTMP cell's params for tensor parallelism: gate tensors
    reshaped to ``[4, C, ...]`` and sharded on the cell dim, ``w_p``
    sharded on its input (cell) dim.  ``C`` must divide the axis size."""
    four_c = p["w_x"].shape[0]
    c_dim = four_c // 4
    d = mesh.shape[axis]
    assert c_dim % d == 0, f"cell dim {c_dim} not divisible by {axis}={d}"

    def put(x, spec):
        return jax.device_put(x, NamedSharding(mesh, spec))

    return {
        "w_x": put(p["w_x"].reshape(4, c_dim, -1), P(None, axis, None)),
        "w_h": put(p["w_h"].reshape(4, c_dim, -1), P(None, axis, None)),
        "b": put(p["b"].reshape(4, c_dim), P(None, axis)),
        "w_p": put(p["w_p"], P(None, axis)),
    }


@functools.lru_cache(maxsize=32)
def _tp_runner(mesh: Mesh, axis: str, cell_clip: float, proj_clip: float):
    """Build (once per (mesh, axis, clips)) the jitted shard_map program —
    cached so repeated layer calls hit jax's dispatch cache instead of
    re-tracing a fresh closure every time; all layers and both directions
    share this one callable (weights are arguments)."""

    def shard_fn(xx, w_x, w_h, b, w_p):
        # all-timestep gate input: one MXU matmul per device over its
        # C/d gate slice (the hoisted-projection design of the scan path)
        xp = jnp.einsum("bti,gci->btgc", xx, w_x,
                        preferred_element_type=None)
        w_h_t = w_h  # [4, C/d, P]
        w_p_t = w_p.T  # [C/d, P]

        def step(carry, xp_t):
            h, c = carry                      # h [B,P] repl; c [B,C/d]
            gp = xp_t + jnp.einsum("bp,gcp->bgc", h, w_h_t,
                                   preferred_element_type=None) + b
            i = jax.nn.sigmoid(gp[:, 0])
            f = jax.nn.sigmoid(gp[:, 1])
            g = jnp.tanh(gp[:, 2])
            o = jax.nn.sigmoid(gp[:, 3])
            c_new = f * c + i * g
            if cell_clip:
                c_new = jnp.clip(c_new, -cell_clip, cell_clip)
            part = jnp.dot(o * jnp.tanh(c_new), w_p_t,
                           preferred_element_type=None)  # partial [B, P]
            h_new = jax.lax.psum(part, axis)  # the one collective per step
            if proj_clip:
                h_new = jnp.clip(h_new, -proj_clip, proj_clip)
            return (h_new, c_new), h_new

        b_sz = xx.shape[0]
        h0 = jnp.zeros((b_sz, w_p.shape[0]), xx.dtype)
        c0 = jnp.zeros((b_sz, w_x.shape[1]), xx.dtype)
        (h_last, c_last), ys = jax.lax.scan(step, (h0, c0),
                                            jnp.swapaxes(xp, 0, 1))
        return jnp.swapaxes(ys, 0, 1), h_last, c_last

    return jax.jit(jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), P(None, axis, None), P(None, axis, None),
                  P(None, axis), P(None, axis)),
        out_specs=(P(), P(), P(None, axis)),
        check_vma=False))


def lstmp_layer_tp(mesh: Mesh, p_tp: dict, x: jnp.ndarray,
                   reverse: bool = False, cell_clip: float = 3.0,
                   proj_clip: float = 3.0, axis: str = "model"):
    """Tensor-parallel twin of ``ops/rnn.py::lstmp_layer``.

    ``p_tp`` comes from :func:`shard_lstmp_params`; ``x`` [B, T, In] is
    replicated.  Returns (ys [B, T, P] replicated, h_last [B, P]
    replicated, c_last [B, C] assembled from the shards).
    """
    if reverse:
        x = jnp.flip(x, axis=1)
    run = _tp_runner(mesh, axis, cell_clip, proj_clip)
    ys, h_last, c_last = run(x, p_tp["w_x"], p_tp["w_h"], p_tp["b"],
                             p_tp["w_p"])
    if reverse:
        ys = jnp.flip(ys, axis=1)
    return ys, h_last, c_last


def shard_encoder_params(mesh: Mesh, params: dict,
                         axis: str = "model") -> dict:
    """TP placement for a full stacked biLM (``{"layers": [{"fwd", "bwd"},
    ...]}`` as built by ``models/elmo.py``)."""
    return {"layers": [
        {"fwd": shard_lstmp_params(mesh, layer["fwd"], axis),
         "bwd": shard_lstmp_params(mesh, layer["bwd"], axis)}
        for layer in params["layers"]]}


def encode_lstmp_from_reps_tp(mesh: Mesh, params_tp: dict,
                              token_reps: jnp.ndarray,
                              lengths: jnp.ndarray, cfg,
                              axis: str = "model"):
    """Tensor-parallel twin of ``models/elmo.py::encode_lstmp_from_reps``
    (the shared ``bilm_stack`` composition), every LSTMP direction sharded
    over ``axis``."""

    def direction(layer, name, x, idx):
        ys, _, _ = lstmp_layer_tp(mesh, layer[name], x, False,
                                  cfg.cell_clip, cfg.proj_clip, axis)
        return ys, None

    rep, pooled, _ = elmo_mod.bilm_stack(params_tp["layers"], token_reps,
                                         lengths, direction)
    return rep, pooled


# ---------------------------------------------------------------------------
# Product-path entry points (`extract-text --elmo-tp N`)
# ---------------------------------------------------------------------------


def model_mesh(n_devices: int, devices=None) -> Mesh:
    """A pure model-parallel ``(data=1, model=n)`` mesh over the first
    ``n_devices`` available devices — the mesh `extract-text --elmo-tp N`
    builds (on a virtual CPU mesh under tests/dry-runs, real chips on a
    pod)."""
    from icassp2022_depression_tpu.parallel import mesh as mesh_mod

    if devices is None:
        devices = jax.devices()
    if len(devices) < n_devices:
        raise ValueError(
            f"--elmo-tp {n_devices} needs >= {n_devices} devices but only "
            f"{len(devices)} are available (on a single-chip host use the "
            "serial encoder; virtual-mesh tests force "
            "xla_force_host_platform_device_count)")
    return mesh_mod.make_mesh(n_devices, model_parallel=n_devices,
                              devices=devices)


@functools.lru_cache(maxsize=16)
def _pooled_tp_runner(mesh: Mesh, axis: str, char_cfg, lstmp_cfg):
    """Jitted (once per mesh/axis/geometry) full pretrained-text TP
    program: replicated char-CNN token embedder -> TP biLM -> interior
    (BOS/EOS-stripped) token mean — the tensor-parallel twin of
    ``models/elmo_pretrained.py::encode_pooled``."""
    from icassp2022_depression_tpu.models import char_cnn, elmo_pretrained

    def fn(cc_params, enc_tp, char_ids, word_ids, lengths):
        reps = char_cnn.embed_tokens(cc_params, char_ids, char_cfg,
                                     word_ids)
        rep, _ = encode_lstmp_from_reps_tp(mesh, enc_tp, reps, lengths,
                                           lstmp_cfg, axis)
        return elmo_pretrained._interior_mean(rep, lengths)

    return jax.jit(fn)


def encode_pooled_tp(mesh: Mesh, cc_params, enc_tp, char_ids, word_ids,
                     lengths, char_cfg, lstmp_cfg, axis: str = "model"):
    """ids -> pooled [B, 2P] through the TP biLM (see _pooled_tp_runner)."""
    run = _pooled_tp_runner(mesh, axis, char_cfg, lstmp_cfg)
    return run(cc_params, enc_tp, char_ids, word_ids, lengths)


@functools.lru_cache(maxsize=16)
def _hashed_tp_runner(mesh: Mesh, axis: str, cfg):
    """Jitted TP twin of ``models/elmo.py::encode_lstmp`` (hashed-token
    embedding path — the PRNG stand-in / explicit-params encoders)."""

    def fn(embed, enc_tp, token_ids, lengths):
        reps = embed[token_ids]
        return encode_lstmp_from_reps_tp(mesh, enc_tp, reps, lengths, cfg,
                                         axis)

    return jax.jit(fn)


def make_tp_encode(mesh: Mesh, params: dict, cfg, axis: str = "model"):
    """Build an ``encode(params, ids, lengths, cfg) -> (rep?, pooled)``
    drop-in for ``frontend.text.embed_sentences`` that runs the biLM
    tensor-parallel over ``axis``.  ``params`` is a serial
    ``models/elmo.py`` LSTMP param tree (with its ``embed`` table); the
    encoder weights are sharded ONCE here."""
    enc_tp = shard_encoder_params(mesh, params, axis)
    embed = params["embed"]
    run = _hashed_tp_runner(mesh, axis, cfg)

    def encode(_params, token_ids, lengths, _cfg):
        rep, pooled = run(embed, enc_tp, token_ids, lengths)
        return rep, pooled

    return encode
