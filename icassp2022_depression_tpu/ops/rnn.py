"""TPU-native recurrent layers (GRU / LSTM, multi-layer, bidirectional).

Replaces the reference's ``nn.GRU`` (``Classification/audio_gru_whole.py:59``)
and ``nn.LSTM`` (``Classification/text_bilstm_whole.py:54``) with a design
shaped for the MXU rather than a per-timestep translation:

* The input projection ``x @ W_ih^T + b_ih`` for *all* timesteps is hoisted
  out of the recurrence into one large batched matmul ``[B*T, D] @ [D, G*H]``
  that tiles onto the 128x128 systolic array.
* The sequential part runs under ``jax.lax.scan`` with only the small
  recurrent matmul ``[B, H] @ [H, G*H]`` per step; XLA fuses the gate
  nonlinearities into it.
* A fused Pallas kernel that keeps the hidden state resident in VMEM across
  the whole sequence is available in :mod:`.rnn_pallas` (used on the
  inference path; the scan path is used under autodiff).

Gate maths and parameter layout match torch exactly (weights are the
row-stacked ``[G*H, D]`` matrices, gate order r,z,n for GRU and i,f,g,o for
LSTM), so reference checkpoints can be ported tensor-for-tensor.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from icassp2022_depression_tpu.ops import initializers
from icassp2022_depression_tpu.ops.nn import dropout as _dropout

GATES = {"gru": 3, "lstm": 4}


def init_params(key, cell: str, input_size: int, hidden: int, num_layers: int,
                bidirectional: bool, init: str = "torch", dtype=jnp.float32):
    """Parameter pytree: list over layers; each layer is a dict with
    direction keys ``fwd`` (and ``bwd`` when bidirectional)."""
    gates = GATES[cell]
    num_dirs = 2 if bidirectional else 1
    layers = []
    keys = jax.random.split(key, num_layers * num_dirs)
    for layer in range(num_layers):
        in_size = input_size if layer == 0 else hidden * num_dirs
        entry = {
            "fwd": initializers.rnn_layer(
                keys[layer * num_dirs], gates, hidden, in_size, init, dtype)
        }
        if bidirectional:
            entry["bwd"] = initializers.rnn_layer(
                keys[layer * num_dirs + 1], gates, hidden, in_size, init, dtype)
        layers.append(entry)
    return layers


def _gru_scan(p, x, h0):
    """x: [B, T, D] -> outputs [B, T, H]; h0: [B, H]."""
    # Hoisted input projection: one MXU-friendly matmul for the whole sequence.
    xp = jnp.einsum("btd,gd->btg", x, p["w_ih"],
                    preferred_element_type=None) + p["b_ih"]
    w_hh_t = p["w_hh"].T  # [H, 3H]
    b_hh = p["b_hh"]
    hidden = p["w_hh"].shape[1]

    def step(h, xp_t):
        hp = jnp.dot(h, w_hh_t, preferred_element_type=None) + b_hh
        xr, xz, xn = jnp.split(xp_t, 3, axis=-1)
        hr, hz, hn = jnp.split(hp, 3, axis=-1)
        r = jax.nn.sigmoid(xr + hr)
        z = jax.nn.sigmoid(xz + hz)
        n = jnp.tanh(xn + r * hn)
        h_new = (1.0 - z) * n + z * h
        return h_new, h_new

    h_last, ys = jax.lax.scan(step, h0, jnp.swapaxes(xp, 0, 1))
    return jnp.swapaxes(ys, 0, 1), h_last


def _lstm_scan(p, x, h0, c0):
    xp = jnp.einsum("btd,gd->btg", x, p["w_ih"],
                    preferred_element_type=None) + p["b_ih"]
    w_hh_t = p["w_hh"].T
    b_hh = p["b_hh"]

    def step(carry, xp_t):
        h, c = carry
        gp = xp_t + jnp.dot(h, w_hh_t, preferred_element_type=None) + b_hh
        gi, gf, gg, go = jnp.split(gp, 4, axis=-1)
        i = jax.nn.sigmoid(gi)
        f = jax.nn.sigmoid(gf)
        g = jnp.tanh(gg)
        o = jax.nn.sigmoid(go)
        c_new = f * c + i * g
        h_new = o * jnp.tanh(c_new)
        return (h_new, c_new), h_new

    (h_last, c_last), ys = jax.lax.scan(step, (h0, c0), jnp.swapaxes(xp, 0, 1))
    return jnp.swapaxes(ys, 0, 1), h_last, c_last


def resolve_backend(backend: str) -> str:
    """'auto' -> fused Pallas kernels on TPU (identical results, and the
    whole-fold program compiles ~50x faster than the scan lowering through
    this environment's compile service), lax.scan elsewhere."""
    if backend == "auto":
        return "pallas" if jax.default_backend() == "tpu" else "xla"
    return backend


#: fall back to the scan path when the fused kernel's VMEM-resident
#: buffers would exceed this budget.  Sized for the BACKWARD kernel (the
#: training path), which co-residents roughly 2x the forward set:
#: xp + dxp + ys (+cs) + dys + weight/bias grad accumulators + scratch.
PALLAS_VMEM_BUDGET_BYTES = 12 * 1024 * 1024


def _pallas_fits(p, x, cell: str) -> bool:
    b, t, _ = x.shape
    gh = p["w_hh"].shape[0]          # G*H
    h = p["w_hh"].shape[1]
    states = 2 if cell == "lstm" else 1
    itemsize = 4
    bwd_need = (2 * b * t * gh                  # xp + dxp
                + (states + 1) * b * t * h      # ys (+cs) + dys
                + 2 * gh * h                    # w_hh + dw_hh
                + 2 * b * h                     # dh/dc scratch
                ) * itemsize
    return bwd_need <= PALLAS_VMEM_BUDGET_BYTES


def _run_direction(p, x, cell: str, reverse: bool, backend: str = "xla"):
    backend = resolve_backend(backend)
    if backend == "pallas":
        from icassp2022_depression_tpu.ops import rnn_pallas

        if _pallas_fits(p, x, cell):
            if cell == "gru":
                ys, h_last = rnn_pallas.gru_layer(p, x, reverse=reverse)
                return ys, h_last, None
            ys, h_last, c_last = rnn_pallas.lstm_layer(p, x, reverse=reverse)
            return ys, h_last, c_last
        # long sequence: grid-over-time streaming kernels (chunked DMA)
        if cell == "gru":
            ys, h_last = rnn_pallas.gru_layer_streamed(p, x, reverse=reverse)
            return ys, h_last, None
        ys, h_last, c_last = rnn_pallas.lstm_layer_streamed(p, x,
                                                            reverse=reverse)
        return ys, h_last, c_last
    b, _, _ = x.shape
    hidden = p["w_hh"].shape[1]
    h0 = jnp.zeros((b, hidden), x.dtype)
    xs = jnp.flip(x, axis=1) if reverse else x
    if cell == "gru":
        ys, h_last = _gru_scan(p, xs, h0)
        c_last = None
    else:
        c0 = jnp.zeros((b, hidden), x.dtype)
        ys, h_last, c_last = _lstm_scan(p, xs, h0, c0)
    if reverse:
        ys = jnp.flip(ys, axis=1)
    return ys, h_last, c_last


def _lstmp_pallas_fits(b: int, c_dim: int, p_dim: int) -> bool:
    """Backward-pass VMEM-fit estimate for the streaming LSTMP kernel
    (same auto-guard policy as :func:`_pallas_fits`): the batch-scaled
    scratches (c-state + dc carry [B, C], h/acc/dhp [B, P] x4) plus the
    double-buffered weight/activation blocks at the slab the kernel will
    ACTUALLY choose must fit the budget, else fall back to the scan path.
    (``_lstmp_slab`` can only halve while staying 128-aligned — e.g.
    c_dim 1536 bottoms out at slab 384, not 128 — so assuming the
    minimum slab here would under-estimate the working set.)"""
    from icassp2022_depression_tpu.ops import rnn_pallas

    slab = rnn_pallas._lstmp_slab(c_dim, p_dim, b)
    need = (b * (2 * c_dim + 4 * p_dim)              # persistent scratches
            + 2 * (p_dim * 4 * slab + slab * p_dim)  # weight blocks x2 buf
            + 2 * b * (2 * 4 * slab + 3 * slab + 2 * p_dim)  # act blocks
            ) * 4
    return need <= PALLAS_VMEM_BUDGET_BYTES


def lstmp_layer(p: dict, x: jnp.ndarray, reverse: bool = False,
                cell_clip: float = 3.0, proj_clip: float = 3.0,
                backend: str = "auto"):
    """LSTM with projection (the ELMo biLM cell — allennlp
    ``LstmCellWithProjection`` semantics, which ELMoForManyLangs' ``ElmobiLm``
    uses for its zhs model).

    ``backend``: "auto" uses the streaming Pallas kernel on TPU when the
    geometry tiles cleanly (the pretrained zhs biLM's 4096x512 does) —
    its recurrent weights exceed VMEM, so the kernel streams weight slabs
    over a (time, slab) grid (:mod:`.rnn_pallas`); "xla" forces the scan.

    Params (allennlp tensor layouts, enabling direct weight porting):
      w_x: [4C, In]  input linearity, no bias
      w_h: [4C, P]   state linearity (applied to the projected state)
      b:   [4C]      state linearity bias
      w_p: [P, C]    state projection

    Gate order i,f,g,o; the memory cell is clipped to ±cell_clip and the
    projected state to ±proj_clip, as in ELMo.
    x: [B, T, In] -> (h_proj sequence [B, T, P], h_last [B, P], c_last [B, C]).
    """
    four_c = p["w_x"].shape[0]
    c_dim = four_c // 4
    p_dim = p["w_p"].shape[0]
    if (resolve_backend(backend) == "pallas" and c_dim % 128 == 0
            and p_dim % 128 == 0
            and _lstmp_pallas_fits(x.shape[0], c_dim, p_dim)):
        from icassp2022_depression_tpu.ops import rnn_pallas

        # f32 weight streaming, deliberately: bf16 would halve the
        # bottleneck bytes with bitwise-identical outputs (the MXU rounds
        # f32 operands to bf16 under default precision; verified on TPU),
        # but measures SLOWER here — 124 vs 74 us/step at the zhs
        # geometry — because the bf16 blocks lower to worse Mosaic code
        # while the f32 stream already achieves ~678 GB/s (~85% of HBM
        # peak).  Re-evaluate on new toolchains via ``weight_dtype``.
        return rnn_pallas.lstmp_layer_streamed(
            p, x, reverse=reverse, cell_clip=cell_clip,
            proj_clip=proj_clip)
    if reverse:
        x = jnp.flip(x, axis=1)
    b_sz = x.shape[0]

    xp = jnp.einsum("bti,gi->btg", x, p["w_x"],
                    preferred_element_type=None)
    w_h_t = p["w_h"].T
    w_p_t = p["w_p"].T

    def step(carry, xp_t):
        h, c = carry
        gp = xp_t + jnp.dot(h, w_h_t, preferred_element_type=None) + p["b"]
        i = jax.nn.sigmoid(gp[:, :c_dim])
        f = jax.nn.sigmoid(gp[:, c_dim:2 * c_dim])
        g = jnp.tanh(gp[:, 2 * c_dim:3 * c_dim])
        o = jax.nn.sigmoid(gp[:, 3 * c_dim:])
        c_new = f * c + i * g
        if cell_clip:
            c_new = jnp.clip(c_new, -cell_clip, cell_clip)
        h_full = o * jnp.tanh(c_new)
        h_proj = jnp.dot(h_full, w_p_t, preferred_element_type=None)
        if proj_clip:
            h_proj = jnp.clip(h_proj, -proj_clip, proj_clip)
        return (h_proj, c_new), h_proj

    h0 = jnp.zeros((b_sz, p_dim), x.dtype)
    c0 = jnp.zeros((b_sz, c_dim), x.dtype)
    (h_last, c_last), ys = jax.lax.scan(step, (h0, c0),
                                        jnp.swapaxes(xp, 0, 1))
    ys = jnp.swapaxes(ys, 0, 1)
    if reverse:
        ys = jnp.flip(ys, axis=1)
    return ys, h_last, c_last


def lstmp_layer_stateful(p: dict, x: jnp.ndarray, valid: jnp.ndarray,
                         h0: jnp.ndarray, c0: jnp.ndarray,
                         cell_clip: float = 3.0, proj_clip: float = 3.0):
    """:func:`lstmp_layer` with initial states and per-row validity masking
    — the allennlp ``LstmCellWithProjection`` contract when fed non-None
    ``initial_state``: each row's state advances only on its valid steps
    (upstream's sorted-prefix slicing, expressed as a masked update), so the
    returned ``h_last``/``c_last`` are the states *at that row's last valid
    step*, and rows with no valid step return ``h0``/``c0`` unchanged.

    Used by the stateful pretrained-ELMo mode (upstream ``ElmobiLm`` is
    ``_EncoderBase(stateful=True)``); always the XLA scan — the streaming
    Pallas kernel is zero-state by contract.

    x: [B, T, In]; valid: [B, T] bool; h0: [B, P]; c0: [B, C].
    Outputs at invalid positions are the would-be step outputs (callers
    mask them); upstream writes zeros there, equally unconsumed.
    """
    four_c = p["w_x"].shape[0]
    c_dim = four_c // 4
    xp = jnp.einsum("bti,gi->btg", x, p["w_x"], preferred_element_type=None)
    w_h_t = p["w_h"].T
    w_p_t = p["w_p"].T

    def step(carry, inp):
        h, c = carry
        xp_t, valid_t = inp
        gp = xp_t + jnp.dot(h, w_h_t, preferred_element_type=None) + p["b"]
        i = jax.nn.sigmoid(gp[:, :c_dim])
        f = jax.nn.sigmoid(gp[:, c_dim:2 * c_dim])
        g = jnp.tanh(gp[:, 2 * c_dim:3 * c_dim])
        o = jax.nn.sigmoid(gp[:, 3 * c_dim:])
        c_new = f * c + i * g
        if cell_clip:
            c_new = jnp.clip(c_new, -cell_clip, cell_clip)
        h_new = jnp.dot(o * jnp.tanh(c_new), w_p_t,
                        preferred_element_type=None)
        if proj_clip:
            h_new = jnp.clip(h_new, -proj_clip, proj_clip)
        keep = valid_t[:, None]
        return (jnp.where(keep, h_new, h), jnp.where(keep, c_new, c)), h_new

    (h_last, c_last), ys = jax.lax.scan(
        step, (h0, c0),
        (jnp.swapaxes(xp, 0, 1), jnp.swapaxes(valid, 0, 1)))
    return jnp.swapaxes(ys, 0, 1), h_last, c_last


def init_lstmp(key, input_size: int, cell: int, proj: int,
               dtype=jnp.float32):
    k1, k2, k3 = jax.random.split(key, 3)
    bound = 1.0 / (input_size ** 0.5)
    return {
        "w_x": initializers.uniform(k1, (4 * cell, input_size), bound, dtype),
        "w_h": initializers.uniform(k2, (4 * cell, proj),
                                    1.0 / (proj ** 0.5), dtype),
        "b": jnp.zeros((4 * cell,), dtype),
        "w_p": initializers.uniform(k3, (proj, cell), 1.0 / (cell ** 0.5),
                                    dtype),
    }


def rnn(params: Sequence[dict], x: jnp.ndarray, cell: str,
        dropout: float = 0.0, train: bool = False,
        key: Optional[jax.Array] = None, backend: str = "xla"):
    """Multi-layer (bi)directional RNN.

    Args:
      params: pytree from :func:`init_params`.
      x: [B, T, D] batch-first input.
      cell: "gru" | "lstm".
      dropout: inter-layer dropout rate (applied to every layer's output
        except the last, matching torch's RNN ``dropout=`` semantics).
      train: enables dropout.
      key: PRNG key (required when train and dropout > 0).
      backend: "xla" (lax.scan), "pallas" (fused GRU/LSTM sequence kernels,
        :mod:`.rnn_pallas`, subject to the VMEM-fit guard), or "auto"
        (pallas on TPU, scan elsewhere).  The fused LSTM backward propagates
        per-step cell-state cotangents (``dcs_ref`` in
        :func:`rnn_pallas._lstm_bwd_kernel`), so differentiating through
        c_n / per-step cell states is exact on either backend.

    Returns:
      (output [B, T, H*num_dirs],
       h_n [B, num_layers*num_dirs, H]  — torch layout, batch-first,
       c_n or None)
    """
    h_finals = []
    c_finals = []
    y = x
    num_layers = len(params)
    for layer_idx, layer in enumerate(params):
        ys_f, h_f, c_f = _run_direction(layer["fwd"], y, cell, reverse=False,
                                        backend=backend)
        h_finals.append(h_f)
        if c_f is not None:
            c_finals.append(c_f)
        if "bwd" in layer:
            ys_b, h_b, c_b = _run_direction(layer["bwd"], y, cell,
                                            reverse=True, backend=backend)
            h_finals.append(h_b)
            if c_b is not None:
                c_finals.append(c_b)
            y = jnp.concatenate([ys_f, ys_b], axis=-1)
        else:
            y = ys_f
        # key=None in train mode skips dropout (consistent with the FC-head
        # convention in the models) instead of crashing inside random.split
        if train and dropout > 0.0 and key is not None and \
                layer_idx < num_layers - 1:
            key, sub = jax.random.split(key)
            y = _dropout(sub, y, dropout, train=True)
    h_n = jnp.stack(h_finals, axis=1)  # [B, L*D, H]
    c_n = jnp.stack(c_finals, axis=1) if c_finals else None
    return y, h_n, c_n
