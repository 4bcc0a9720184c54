"""Fused Pallas GRU sequence kernel (forward + custom-VJP backward).

The XLA path in :mod:`.rnn` lowers the recurrence to ``lax.scan``; each step
is a separate fusion with the hidden state bouncing through HBM between
steps.  This kernel runs the *entire sequence* inside one Pallas program:

* the recurrent weight ``W_hh`` (transposed, [H, 3H]) and the hidden state
  [B, H] stay resident in VMEM for all T steps;
* the per-step input projections ``xp`` [T, B, 3H] (precomputed outside as
  one large MXU matmul) stream in;
* each step is one [B,H] x [H,3H] MXU matmul plus fused VPU gate math.

The backward pass is a second Pallas kernel that re-computes the gates from
the saved hidden states (recompute-over-store: one extra matmul per step
instead of materialising 3 gate tensors) and accumulates ``dW_hh``/``db_hh``
in VMEM scratch while streaming ``dxp`` out.

Gate math matches torch ``nn.GRU`` exactly (r,z,n order — see
``ops/rnn.py``), so this is a drop-in replacement for the scan path
(`backend="pallas"`).  On CPU the kernels run in interpreter mode
(tests/dry-runs); on TPU they compile via Mosaic.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _gru_bwd_kernel(xp_ref, whh_t_ref, bhh_ref, ys_ref, dys_ref,
                    dxp_ref, dwhh_ref, dbhh_ref, dh_scratch):
    t_steps = xp_ref.shape[0]
    hidden = whh_t_ref.shape[0]
    dh_scratch[...] = jnp.zeros_like(dh_scratch)
    dwhh_ref[...] = jnp.zeros_like(dwhh_ref)
    dbhh_ref[...] = jnp.zeros_like(dbhh_ref)

    def step(i, _):
        t = t_steps - 1 - i
        h_prev = jnp.where(t == 0, 0.0, 1.0) * ys_ref[jnp.maximum(t - 1, 0)]
        # recompute forward gates for step t
        hp = jnp.dot(h_prev, whh_t_ref[...],
                     preferred_element_type=jnp.float32) + bhh_ref[...]
        xp_t = xp_ref[t]
        xr = xp_t[:, :hidden]
        xz = xp_t[:, hidden:2 * hidden]
        xn = xp_t[:, 2 * hidden:]
        hr = hp[:, :hidden]
        hz = hp[:, hidden:2 * hidden]
        hn = hp[:, 2 * hidden:]
        r = jax.nn.sigmoid(xr + hr)
        z = jax.nn.sigmoid(xz + hz)
        n = jnp.tanh(xn + r * hn)

        dh = dys_ref[t] + dh_scratch[...]
        dz = dh * (h_prev - n)
        dn = dh * (1.0 - z)
        ds_n = dn * (1.0 - n * n)          # grad at tanh pre-activation
        dxn = ds_n
        dr = ds_n * hn
        dhn = ds_n * r
        ds_r = dr * r * (1.0 - r)
        ds_z = dz * z * (1.0 - z)
        dgates_h = jnp.concatenate([ds_r, ds_z, dhn], axis=1)   # [B, 3H]
        dxp_ref[t] = jnp.concatenate([ds_r, ds_z, dxn], axis=1)
        # dh_prev: through the z*h_prev term and through hp
        dh_prev = dh * z + jnp.dot(dgates_h, whh_t_ref[...].T,
                                   preferred_element_type=jnp.float32)
        dh_scratch[...] = dh_prev
        # weight/bias accumulation: dW_hh^T layout [H, 3H]
        dwhh_ref[...] += jnp.dot(h_prev.T, dgates_h,
                                 preferred_element_type=jnp.float32)
        dbhh_ref[...] += jnp.sum(dgates_h, axis=0, keepdims=True)
        return 0

    jax.lax.fori_loop(0, t_steps, step, 0)


@jax.custom_vjp
def gru_sequence(xp: jnp.ndarray, w_hh_t: jnp.ndarray,
                 b_hh: jnp.ndarray) -> jnp.ndarray:
    """xp: [T, B, 3H] (input projections), w_hh_t: [H, 3H], b_hh: [1, 3H]
    -> hidden states ys [T, B, H].  Initial hidden state is zero (the
    torch default the reference relies on)."""
    return _gru_fwd(xp, w_hh_t, b_hh)


def _gru_fwd(xp, w_hh_t, b_hh):
    # one statement of the load-bearing torch-parity gate math: the
    # single-block forward IS the streamed kernel at chunk == t_steps
    # (grid of one; the program_id-0 scratch init always fires)
    return _gru_stream_fwd(xp, w_hh_t, b_hh, xp.shape[0])


def _fwd_rule(xp, w_hh_t, b_hh):
    ys = _gru_fwd(xp, w_hh_t, b_hh)
    return ys, (xp, w_hh_t, b_hh, ys)


def _bwd_rule(residuals, dys):
    xp, w_hh_t, b_hh, ys = residuals
    t_steps, b, g = xp.shape
    hidden = g // 3
    dxp, dwhh, dbhh = pl.pallas_call(
        _gru_bwd_kernel,
        out_shape=(jax.ShapeDtypeStruct((t_steps, b, g), xp.dtype),
                   jax.ShapeDtypeStruct((hidden, g), w_hh_t.dtype),
                   jax.ShapeDtypeStruct((1, g), b_hh.dtype)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        scratch_shapes=[pltpu.VMEM((b, hidden), jnp.float32)],
        interpret=_interpret(),
    )(xp, w_hh_t, b_hh, ys, dys)
    return dxp, dwhh, dbhh


gru_sequence.defvjp(_fwd_rule, _bwd_rule)


# ---------------------------------------------------------------------------
# Streaming GRU: grid over time chunks (long sequences that exceed VMEM)
# ---------------------------------------------------------------------------
#
# The single-block kernels above keep the whole sequence resident in VMEM.
# For long sequences (ELMo-scale token batches) the sequence is processed in
# time chunks instead: the grid iterates chunks IN ORDER (TPU grids are
# sequential), the hidden state persists in VMEM scratch across grid steps,
# and Pallas's block pipeline double-buffers the per-chunk xp/ys (dys/dxp)
# DMA against compute.  The backward kernel walks chunks in reverse via the
# BlockSpec index maps and accumulates dW_hh/db_hh into VMEM-resident
# outputs (constant index map -> the block stays on chip for the whole
# grid).


def _gru_stream_fwd_kernel(xp_ref, whh_t_ref, bhh_ref, ys_ref, h_scratch):
    hidden = whh_t_ref.shape[0]
    chunk = xp_ref.shape[0]

    @pl.when(pl.program_id(0) == 0)
    def _():
        h_scratch[...] = jnp.zeros_like(h_scratch)

    def step(t, _):
        h = h_scratch[...]
        hp = jnp.dot(h, whh_t_ref[...],
                     preferred_element_type=jnp.float32) + bhh_ref[...]
        xp_t = xp_ref[t]
        r = jax.nn.sigmoid(xp_t[:, :hidden] + hp[:, :hidden])
        z = jax.nn.sigmoid(xp_t[:, hidden:2 * hidden] +
                           hp[:, hidden:2 * hidden])
        n = jnp.tanh(xp_t[:, 2 * hidden:] + r * hp[:, 2 * hidden:])
        h_new = (1.0 - z) * n + z * h
        h_scratch[...] = h_new
        ys_ref[t] = h_new
        return 0

    jax.lax.fori_loop(0, chunk, step, 0)


def _gru_stream_bwd_kernel(xp_ref, whh_t_ref, bhh_ref, ys_prev_ref,
                           dys_ref, dxp_ref, dwhh_ref, dbhh_ref, dh_scratch):
    """One reverse-time chunk.  ``ys_prev_ref`` is the chunk shifted one
    step earlier in time (h_{t-1} for the chunk's first step comes from the
    previous chunk's last state; global step 0 uses zeros via masking)."""
    hidden = whh_t_ref.shape[0]
    chunk = xp_ref.shape[0]
    n_chunks = pl.num_programs(0)
    chunk_idx = n_chunks - 1 - pl.program_id(0)   # time order index

    @pl.when(pl.program_id(0) == 0)
    def _():
        dh_scratch[...] = jnp.zeros_like(dh_scratch)
        dwhh_ref[...] = jnp.zeros_like(dwhh_ref)
        dbhh_ref[...] = jnp.zeros_like(dbhh_ref)

    def step(k, _):
        t = chunk - 1 - k
        global_first = (chunk_idx == 0) & (t == 0)
        h_prev = jnp.where(global_first, 0.0, 1.0) * ys_prev_ref[t]
        hp = jnp.dot(h_prev, whh_t_ref[...],
                     preferred_element_type=jnp.float32) + bhh_ref[...]
        xp_t = xp_ref[t]
        r = jax.nn.sigmoid(xp_t[:, :hidden] + hp[:, :hidden])
        z = jax.nn.sigmoid(xp_t[:, hidden:2 * hidden] +
                           hp[:, hidden:2 * hidden])
        hn = hp[:, 2 * hidden:]
        n = jnp.tanh(xp_t[:, 2 * hidden:] + r * hn)

        dh = dys_ref[t] + dh_scratch[...]
        dz = dh * (h_prev - n)
        ds_n = dh * (1.0 - z) * (1.0 - n * n)
        dr = ds_n * hn
        dhn = ds_n * r
        ds_r = dr * r * (1.0 - r)
        ds_z = dz * z * (1.0 - z)
        dgates_h = jnp.concatenate([ds_r, ds_z, dhn], axis=1)
        dxp_ref[t] = jnp.concatenate([ds_r, ds_z, ds_n], axis=1)
        dh_scratch[...] = dh * z + jnp.dot(
            dgates_h, whh_t_ref[...].T, preferred_element_type=jnp.float32)
        dwhh_ref[...] += jnp.dot(h_prev.T, dgates_h,
                                 preferred_element_type=jnp.float32)
        dbhh_ref[...] += jnp.sum(dgates_h, axis=0, keepdims=True)
        return 0

    jax.lax.fori_loop(0, chunk, step, 0)


def _stream_chunk(t_steps: int, b: int, g: int, hidden: int,
                  n_state_bufs: int) -> int:
    """Largest power-of-two chunk whose backward working set fits the same
    12 MB budget used by the single-block guard.

    ``n_state_bufs`` is the cell's per-step [b, hidden] buffer count in
    the backward chunk: 3 for GRU (ys, ys_prev, dys), 5 for LSTM
    (ys_prev, cs, cs_prev, dys, dcs) — a GRU-shaped estimate would
    undercount the LSTM working set and erode the VMEM guarantee."""
    budget = 12 * 1024 * 1024
    per_step = (2 * b * g + n_state_bufs * b * hidden) * 4   # xp+dxp + states
    chunk = 8
    while chunk * 2 <= t_steps and (chunk * 2) * per_step <= budget:
        chunk *= 2
    return chunk


def _gru_stream_fwd(xp, w_hh_t, b_hh, chunk):
    t_steps, b, g = xp.shape
    hidden = g // 3
    n_chunks = t_steps // chunk
    return pl.pallas_call(
        _gru_stream_fwd_kernel,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((chunk, b, g), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, g), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, g), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((chunk, b, hidden), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t_steps, b, hidden), xp.dtype),
        scratch_shapes=[pltpu.VMEM((b, hidden), jnp.float32)],
        interpret=_interpret(),
    )(xp, w_hh_t, b_hh)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def gru_sequence_streamed(xp, w_hh_t, b_hh, chunk: int):
    """Streaming variant of :func:`gru_sequence` for sequences whose fused
    working set exceeds VMEM.  ``t_steps`` must be a multiple of ``chunk``
    (wrappers pad; trailing zero-padded steps are safe — see
    :func:`gru_layer_streamed`)."""
    return _gru_stream_fwd(xp, w_hh_t, b_hh, chunk)


def _stream_fwd_rule(xp, w_hh_t, b_hh, chunk):
    ys = _gru_stream_fwd(xp, w_hh_t, b_hh, chunk)
    return ys, (xp, w_hh_t, b_hh, ys)


def _stream_bwd_rule(chunk, residuals, dys):
    xp, w_hh_t, b_hh, ys = residuals
    t_steps, b, g = xp.shape
    hidden = g // 3
    n_chunks = t_steps // chunk
    # h_{t-1} stream: ys shifted right by one step (zeros at t=0 handled by
    # the global_first mask in-kernel)
    ys_prev = jnp.concatenate([jnp.zeros_like(ys[:1]), ys[:-1]], axis=0)
    rev = lambda i: (n_chunks - 1 - i, 0, 0)   # reverse-time block order
    dxp, dwhh, dbhh = pl.pallas_call(
        _gru_stream_bwd_kernel,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((chunk, b, g), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, g), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, g), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, b, hidden), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, b, hidden), rev, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((chunk, b, g), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, g), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, g), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(jax.ShapeDtypeStruct((t_steps, b, g), xp.dtype),
                   jax.ShapeDtypeStruct((hidden, g), w_hh_t.dtype),
                   jax.ShapeDtypeStruct((1, g), b_hh.dtype)),
        scratch_shapes=[pltpu.VMEM((b, hidden), jnp.float32)],
        interpret=_interpret(),
    )(xp, w_hh_t, b_hh, ys_prev, dys)
    return dxp, dwhh, dbhh


gru_sequence_streamed.defvjp(_stream_fwd_rule, _stream_bwd_rule)


def gru_layer_streamed(p: dict, x: jnp.ndarray, reverse: bool = False,
                       chunk: int | None = None):
    """GRU layer via the streaming kernel (torch param layout).  The time
    axis is zero-padded to a chunk multiple; padded trailing steps are
    discarded from the outputs and contribute zero gradient (dys there is
    zero and the reverse dh carry starts at zero)."""
    if reverse:
        x = jnp.flip(x, axis=1)
    b, t_steps, _ = x.shape
    xp = jnp.einsum("btd,gd->btg", x, p["w_ih"],
                    preferred_element_type=jnp.float32) + p["b_ih"]
    xp = jnp.swapaxes(xp, 0, 1)
    g = xp.shape[-1]
    if chunk is None:
        chunk = _stream_chunk(t_steps, b, g, g // 3, 3)
    pad = (-t_steps) % chunk
    if pad:
        xp = jnp.concatenate(
            [xp, jnp.zeros((pad,) + xp.shape[1:], xp.dtype)], axis=0)
    ys = gru_sequence_streamed(xp, p["w_hh"].T, p["b_hh"][None, :], chunk)
    ys = ys[:t_steps]
    h_last = ys[-1]
    ys = jnp.swapaxes(ys, 0, 1)
    if reverse:
        ys = jnp.flip(ys, axis=1)
    return ys, h_last


# ---------------------------------------------------------------------------
# Streaming LSTM (same chunked-grid structure; carries (h, c))
# ---------------------------------------------------------------------------


def _lstm_stream_fwd_kernel(xp_ref, whh_t_ref, bhh_ref, ys_ref, cs_ref,
                            h_scratch, c_scratch):
    hidden = whh_t_ref.shape[0]
    chunk = xp_ref.shape[0]

    @pl.when(pl.program_id(0) == 0)
    def _():
        h_scratch[...] = jnp.zeros_like(h_scratch)
        c_scratch[...] = jnp.zeros_like(c_scratch)

    def step(t, _):
        h = h_scratch[...]
        c = c_scratch[...]
        gp = xp_ref[t] + jnp.dot(h, whh_t_ref[...],
                                 preferred_element_type=jnp.float32) + \
            bhh_ref[...]
        i = jax.nn.sigmoid(gp[:, :hidden])
        f = jax.nn.sigmoid(gp[:, hidden:2 * hidden])
        g = jnp.tanh(gp[:, 2 * hidden:3 * hidden])
        o = jax.nn.sigmoid(gp[:, 3 * hidden:])
        c_new = f * c + i * g
        h_new = o * jnp.tanh(c_new)
        h_scratch[...] = h_new
        c_scratch[...] = c_new
        ys_ref[t] = h_new
        cs_ref[t] = c_new
        return 0

    jax.lax.fori_loop(0, chunk, step, 0)


def _lstm_stream_bwd_kernel(xp_ref, whh_t_ref, bhh_ref, ys_prev_ref,
                            cs_ref, cs_prev_ref, dys_ref, dcs_ref,
                            dxp_ref, dwhh_ref, dbhh_ref,
                            dh_scratch, dc_scratch):
    hidden = whh_t_ref.shape[0]
    chunk = xp_ref.shape[0]
    n_chunks = pl.num_programs(0)
    chunk_idx = n_chunks - 1 - pl.program_id(0)

    @pl.when(pl.program_id(0) == 0)
    def _():
        dh_scratch[...] = jnp.zeros_like(dh_scratch)
        dc_scratch[...] = jnp.zeros_like(dc_scratch)
        dwhh_ref[...] = jnp.zeros_like(dwhh_ref)
        dbhh_ref[...] = jnp.zeros_like(dbhh_ref)

    def step(k, _):
        t = chunk - 1 - k
        global_first = (chunk_idx == 0) & (t == 0)
        not_first = jnp.where(global_first, 0.0, 1.0)
        h_prev = not_first * ys_prev_ref[t]
        c_prev = not_first * cs_prev_ref[t]
        gp = xp_ref[t] + jnp.dot(h_prev, whh_t_ref[...],
                                 preferred_element_type=jnp.float32) + \
            bhh_ref[...]
        i = jax.nn.sigmoid(gp[:, :hidden])
        f = jax.nn.sigmoid(gp[:, hidden:2 * hidden])
        g = jnp.tanh(gp[:, 2 * hidden:3 * hidden])
        o = jax.nn.sigmoid(gp[:, 3 * hidden:])
        c = cs_ref[t]
        tanh_c = jnp.tanh(c)

        dh = dys_ref[t] + dh_scratch[...]
        ds_o = dh * tanh_c * o * (1.0 - o)
        dc = dh * o * (1.0 - tanh_c * tanh_c) + dc_scratch[...] + dcs_ref[t]
        ds_i = dc * g * i * (1.0 - i)
        ds_g = dc * i * (1.0 - g * g)
        ds_f = dc * c_prev * f * (1.0 - f)
        dgates = jnp.concatenate([ds_i, ds_f, ds_g, ds_o], axis=1)
        dxp_ref[t] = dgates
        dh_scratch[...] = jnp.dot(dgates, whh_t_ref[...].T,
                                  preferred_element_type=jnp.float32)
        dc_scratch[...] = dc * f
        dwhh_ref[...] += jnp.dot(h_prev.T, dgates,
                                 preferred_element_type=jnp.float32)
        dbhh_ref[...] += jnp.sum(dgates, axis=0, keepdims=True)
        return 0

    jax.lax.fori_loop(0, chunk, step, 0)


def _lstm_stream_fwd(xp, w_hh_t, b_hh, chunk):
    t_steps, b, g = xp.shape
    hidden = g // 4
    n_chunks = t_steps // chunk
    return pl.pallas_call(
        _lstm_stream_fwd_kernel,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((chunk, b, g), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, g), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, g), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(pl.BlockSpec((chunk, b, hidden), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((chunk, b, hidden), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((t_steps, b, hidden), xp.dtype),
                   jax.ShapeDtypeStruct((t_steps, b, hidden), xp.dtype)),
        scratch_shapes=[pltpu.VMEM((b, hidden), jnp.float32),
                        pltpu.VMEM((b, hidden), jnp.float32)],
        interpret=_interpret(),
    )(xp, w_hh_t, b_hh)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def lstm_sequence_streamed(xp, w_hh_t, b_hh, chunk: int):
    """Streaming LSTM: (ys, cs) like :func:`lstm_sequence`, chunked grid."""
    return _lstm_stream_fwd(xp, w_hh_t, b_hh, chunk)


def _lstm_stream_fwd_rule(xp, w_hh_t, b_hh, chunk):
    ys, cs = _lstm_stream_fwd(xp, w_hh_t, b_hh, chunk)
    return (ys, cs), (xp, w_hh_t, b_hh, ys, cs)


def _lstm_stream_bwd_rule(chunk, residuals, grads):
    xp, w_hh_t, b_hh, ys, cs = residuals
    dys, dcs = grads
    t_steps, b, g = xp.shape
    hidden = g // 4
    n_chunks = t_steps // chunk
    ys_prev = jnp.concatenate([jnp.zeros_like(ys[:1]), ys[:-1]], axis=0)
    cs_prev = jnp.concatenate([jnp.zeros_like(cs[:1]), cs[:-1]], axis=0)
    rev = lambda i: (n_chunks - 1 - i, 0, 0)
    dxp, dwhh, dbhh = pl.pallas_call(
        _lstm_stream_bwd_kernel,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((chunk, b, g), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, g), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, g), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, b, hidden), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, b, hidden), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, b, hidden), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, b, hidden), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, b, hidden), rev, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((chunk, b, g), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, g), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, g), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(jax.ShapeDtypeStruct((t_steps, b, g), xp.dtype),
                   jax.ShapeDtypeStruct((hidden, g), w_hh_t.dtype),
                   jax.ShapeDtypeStruct((1, g), b_hh.dtype)),
        scratch_shapes=[pltpu.VMEM((b, hidden), jnp.float32),
                        pltpu.VMEM((b, hidden), jnp.float32)],
        interpret=_interpret(),
    )(xp, w_hh_t, b_hh, ys_prev, cs, cs_prev, dys, dcs)
    return dxp, dwhh, dbhh


lstm_sequence_streamed.defvjp(_lstm_stream_fwd_rule, _lstm_stream_bwd_rule)


def lstm_layer_streamed(p: dict, x: jnp.ndarray, reverse: bool = False,
                        chunk: int | None = None):
    """LSTM layer via the streaming kernel (torch param layout)."""
    if reverse:
        x = jnp.flip(x, axis=1)
    b, t_steps, _ = x.shape
    xp = jnp.einsum("btd,gd->btg", x, p["w_ih"],
                    preferred_element_type=jnp.float32) + p["b_ih"]
    xp = jnp.swapaxes(xp, 0, 1)
    g = xp.shape[-1]
    if chunk is None:
        chunk = _stream_chunk(t_steps, b, g, g // 4, 5)
    pad = (-t_steps) % chunk
    if pad:
        xp = jnp.concatenate(
            [xp, jnp.zeros((pad,) + xp.shape[1:], xp.dtype)], axis=0)
    ys, cs = lstm_sequence_streamed(xp, p["w_hh"].T, p["b_hh"][None, :],
                                    chunk)
    ys, cs = ys[:t_steps], cs[:t_steps]
    h_last, c_last = ys[-1], cs[-1]
    ys = jnp.swapaxes(ys, 0, 1)
    if reverse:
        ys = jnp.flip(ys, axis=1)
    return ys, h_last, c_last


# ---------------------------------------------------------------------------
# Streaming LSTMP (LSTM with projection — the ELMo biLM cell)
# ---------------------------------------------------------------------------
#
# The zhs ELMo geometry (4096 cells, 512 projection) makes the recurrent
# weights alone ~41 MB f32 — far beyond VMEM — so unlike the GRU/LSTM
# kernels the weights cannot stay resident.  The kernel runs on a
# ``(time, cell-slab)`` grid: the cell dimension is split into slabs of
# ``slab`` cells, each grid step processes one slab of one timestep, and
# the Pallas pipeline double-buffers the next slab's weight DMA against the
# current slab's compute (the kernel is HBM-bandwidth bound, ~weights/step).
#
# State layout: the projected hidden state h [B, P] and clipped cell state
# c [B, C] persist in VMEM scratch across grid steps; the per-step
# projection accumulates over slabs into an [B, P] accumulator, finalised
# (clipped, written) on the last slab.
#
# The backward kernel walks time in reverse with the same slab structure
# and emits per-step gate grads and pre-projection grads; the *weight*
# grads (dW_h, dW_p, db) are then three large MXU matmuls outside the
# kernel (einsum over [T, B, ...]) instead of in-kernel accumulators —
# a slab's accumulator block would be revisited non-consecutively across
# the grid, which the block pipeline does not keep resident.
#
# Gate order i,f,g,o and ±cell/proj clipping match allennlp
# ``LstmCellWithProjection`` (see ``ops/rnn.py::lstmp_layer``); zero
# initial state.


def _lstmp_stream_fwd_kernel(xp_ref, whh_ref, b_ref, wp_ref,
                             ys_ref, hpre_ref, cpre_ref, hf_ref,
                             h_scratch, c_scratch, acc_scratch,
                             *, cell_clip: float, proj_clip: float):
    s = pl.program_id(1)
    n_slabs = pl.num_programs(1)
    slab = wp_ref.shape[0]

    @pl.when((pl.program_id(0) == 0) & (s == 0))
    def _():
        h_scratch[...] = jnp.zeros_like(h_scratch)
        c_scratch[...] = jnp.zeros_like(c_scratch)

    @pl.when(s == 0)
    def _():
        acc_scratch[...] = jnp.zeros_like(acc_scratch)

    wdt = whh_ref.dtype   # weights may stream as bf16 (halved DMA bytes)
    h = h_scratch[...]
    c_prev = c_scratch[:, pl.ds(s * slab, slab)]
    gp = xp_ref[0] + jax.lax.dot_general(
        h.astype(wdt), whh_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + b_ref[0]
    i = jax.nn.sigmoid(gp[:, 0])
    f = jax.nn.sigmoid(gp[:, 1])
    g = jnp.tanh(gp[:, 2])
    o = jax.nn.sigmoid(gp[:, 3])
    c_pre = f * c_prev + i * g
    cpre_ref[0] = c_pre
    c_clip = jnp.clip(c_pre, -cell_clip, cell_clip) if cell_clip else c_pre
    c_scratch[:, pl.ds(s * slab, slab)] = c_clip
    hf = o * jnp.tanh(c_clip)
    hf_ref[0] = hf
    acc_scratch[...] += jnp.dot(hf.astype(wdt), wp_ref[...],
                                preferred_element_type=jnp.float32)

    @pl.when(s == n_slabs - 1)
    def _():
        hp_pre = acc_scratch[...]
        hpre_ref[0] = hp_pre
        h_new = jnp.clip(hp_pre, -proj_clip, proj_clip) if proj_clip \
            else hp_pre
        ys_ref[0] = h_new
        h_scratch[...] = h_new


def _lstmp_stream_bwd_kernel(xp_ref, whh_ref, b_ref, wp_ref, ys_prev_ref,
                             cpre_ref, cpre_prev_ref, hpre_ref, dys_ref,
                             dcpre_ref, dgates_ref, dhpre_ref,
                             dh_scratch, dc_scratch, dhp_scratch,
                             *, cell_clip: float, proj_clip: float):
    s = pl.program_id(1)
    slab = wp_ref.shape[0]
    wdt = whh_ref.dtype
    # reverse-time walk: grid step 0 is the LAST timestep
    is_t0 = pl.program_id(0) == pl.num_programs(0) - 1

    @pl.when((pl.program_id(0) == 0) & (s == 0))
    def _():
        dh_scratch[...] = jnp.zeros_like(dh_scratch)
        dc_scratch[...] = jnp.zeros_like(dc_scratch)

    @pl.when(s == 0)
    def _():
        dh_total = dys_ref[0] + dh_scratch[...]
        if proj_clip:
            hp_pre = hpre_ref[0]
            dh_total = dh_total * ((hp_pre >= -proj_clip) &
                                   (hp_pre <= proj_clip)).astype(
                                       dh_total.dtype)
        dhp_scratch[...] = dh_total
        dhpre_ref[0] = dh_total
        dh_scratch[...] = jnp.zeros_like(dh_scratch)

    dhp = dhp_scratch[...]
    d_hf = jnp.dot(dhp.astype(wdt), wp_ref[...].T,
                   preferred_element_type=jnp.float32)

    not_first = jnp.where(is_t0, 0.0, 1.0)
    h_prev = not_first * ys_prev_ref[0]
    c_prev_pre = cpre_prev_ref[0]
    c_prev = (jnp.clip(c_prev_pre, -cell_clip, cell_clip)
              if cell_clip else c_prev_pre) * not_first
    gp = xp_ref[0] + jax.lax.dot_general(
        h_prev.astype(wdt), whh_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + b_ref[0]
    i = jax.nn.sigmoid(gp[:, 0])
    f = jax.nn.sigmoid(gp[:, 1])
    g = jnp.tanh(gp[:, 2])
    o = jax.nn.sigmoid(gp[:, 3])
    c_pre = cpre_ref[0]
    c_clip = jnp.clip(c_pre, -cell_clip, cell_clip) if cell_clip else c_pre
    tanh_c = jnp.tanh(c_clip)

    ds_o = d_hf * tanh_c * o * (1.0 - o)
    dc_clip = d_hf * o * (1.0 - tanh_c * tanh_c) + \
        dc_scratch[:, pl.ds(s * slab, slab)]
    if cell_clip:
        dc_pre = dc_clip * ((c_pre >= -cell_clip) &
                            (c_pre <= cell_clip)).astype(dc_clip.dtype)
    else:
        dc_pre = dc_clip
    dc_pre = dc_pre + dcpre_ref[0]
    ds_i = dc_pre * g * i * (1.0 - i)
    ds_f = dc_pre * c_prev * f * (1.0 - f)
    ds_g = dc_pre * i * (1.0 - g * g)
    dgates = jnp.stack([ds_i, ds_f, ds_g, ds_o], axis=1)   # [B, 4, slab]
    dgates_ref[0] = dgates
    # Mosaic's matmul wants single contracting dims: flatten (4, slab)
    whh = whh_ref[...]
    dh_scratch[...] += jax.lax.dot_general(
        dgates.reshape(dgates.shape[0], 4 * slab).astype(wdt),
        whh.reshape(whh.shape[0], 4 * slab),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    dc_scratch[:, pl.ds(s * slab, slab)] = dc_pre * f


def _lstmp_stream_fwd(xp4, w_h_t3, b3, w_p_t, slab, cell_clip, proj_clip):
    t_steps, b, _, c_dim = xp4.shape
    p_dim = w_h_t3.shape[0]
    n_slabs = c_dim // slab
    kernel = functools.partial(_lstmp_stream_fwd_kernel,
                               cell_clip=cell_clip, proj_clip=proj_clip)
    return pl.pallas_call(
        kernel,
        grid=(t_steps, n_slabs),
        in_specs=[
            pl.BlockSpec((1, b, 4, slab), lambda t, s: (t, 0, 0, s),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((p_dim, 4, slab), lambda t, s: (0, 0, s),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, slab), lambda t, s: (0, 0, s),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((slab, p_dim), lambda t, s: (s, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, b, p_dim), lambda t, s: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b, p_dim), lambda t, s: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b, slab), lambda t, s: (t, 0, s),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b, slab), lambda t, s: (t, 0, s),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((t_steps, b, p_dim), xp4.dtype),  # ys
            jax.ShapeDtypeStruct((t_steps, b, p_dim), xp4.dtype),  # hp_pre
            jax.ShapeDtypeStruct((t_steps, b, c_dim), xp4.dtype),  # c_pre
            jax.ShapeDtypeStruct((t_steps, b, c_dim), xp4.dtype),  # o*tanh(c)
        ),
        scratch_shapes=[pltpu.VMEM((b, p_dim), jnp.float32),
                        pltpu.VMEM((b, c_dim), jnp.float32),
                        pltpu.VMEM((b, p_dim), jnp.float32)],
        interpret=_interpret(),
    )(xp4, w_h_t3, b3, w_p_t)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def lstmp_sequence_streamed(xp4, w_h_t3, b3, w_p_t, slab: int,
                            cell_clip: float, proj_clip: float):
    """Streaming LSTMP sequence.  xp4: [T, B, 4, C] input projections
    (gate-major), w_h_t3: [P, 4, C] (state linearity, transposed),
    b3: [1, 4, C], w_p_t: [C, P] (state projection, transposed).
    Returns (ys [T, B, P] clipped projected states, cs_pre [T, B, C]
    pre-clip cell states — ``clip(cs_pre[-1])`` is the final cell state).
    """
    ys, hpre, cpre, hf = _lstmp_stream_fwd(xp4, w_h_t3, b3, w_p_t, slab,
                                           cell_clip, proj_clip)
    return ys, cpre


def _lstmp_stream_fwd_rule(xp4, w_h_t3, b3, w_p_t, slab, cell_clip,
                           proj_clip):
    ys, hpre, cpre, hf = _lstmp_stream_fwd(xp4, w_h_t3, b3, w_p_t, slab,
                                           cell_clip, proj_clip)
    return (ys, cpre), (xp4, w_h_t3, b3, w_p_t, ys, hpre, cpre, hf)


def _lstmp_stream_bwd_rule(slab, cell_clip, proj_clip, residuals, grads):
    xp4, w_h_t3, b3, w_p_t, ys, hpre, cpre, hf = residuals
    dys, dcpre = grads
    t_steps, b, _, c_dim = xp4.shape
    p_dim = w_h_t3.shape[0]
    n_slabs = c_dim // slab
    ys_prev = jnp.concatenate([jnp.zeros_like(ys[:1]), ys[:-1]], axis=0)
    cpre_prev = jnp.concatenate([jnp.zeros_like(cpre[:1]), cpre[:-1]],
                                axis=0)
    rev_t = lambda t, s: (t_steps - 1 - t, 0, 0)
    rev_ts = lambda t, s: (t_steps - 1 - t, 0, s)
    kernel = functools.partial(_lstmp_stream_bwd_kernel,
                               cell_clip=cell_clip, proj_clip=proj_clip)
    dgates, dhpre = pl.pallas_call(
        kernel,
        grid=(t_steps, n_slabs),
        in_specs=[
            pl.BlockSpec((1, b, 4, slab),
                         lambda t, s: (t_steps - 1 - t, 0, 0, s),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((p_dim, 4, slab), lambda t, s: (0, 0, s),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, slab), lambda t, s: (0, 0, s),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((slab, p_dim), lambda t, s: (s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b, p_dim), rev_t, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b, slab), rev_ts, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b, slab), rev_ts, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b, p_dim), rev_t, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b, p_dim), rev_t, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b, slab), rev_ts, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, b, 4, slab),
                         lambda t, s: (t_steps - 1 - t, 0, 0, s),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b, p_dim), rev_t, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((t_steps, b, 4, c_dim), xp4.dtype),
            jax.ShapeDtypeStruct((t_steps, b, p_dim), xp4.dtype),
        ),
        scratch_shapes=[pltpu.VMEM((b, p_dim), jnp.float32),
                        pltpu.VMEM((b, c_dim), jnp.float32),
                        pltpu.VMEM((b, p_dim), jnp.float32)],
        interpret=_interpret(),
    )(xp4, w_h_t3, b3, w_p_t, ys_prev, cpre, cpre_prev, hpre, dys, dcpre)
    # weight grads as three large MXU matmuls (T*B contracted)
    dw_h_t3 = jnp.einsum("tbgc,tbp->pgc", dgates, ys_prev,
                         preferred_element_type=jnp.float32)
    db3 = jnp.sum(dgates, axis=(0, 1))[None]
    dw_p_t = jnp.einsum("tbp,tbc->cp", dhpre, hf,
                        preferred_element_type=jnp.float32)
    return (dgates, dw_h_t3.astype(w_h_t3.dtype), db3,
            dw_p_t.astype(w_p_t.dtype))


lstmp_sequence_streamed.defvjp(_lstmp_stream_fwd_rule,
                               _lstmp_stream_bwd_rule)


def _lstmp_slab(c_dim: int, p_dim: int, b: int) -> int:
    """Largest power-of-two slab (>=128 when possible) whose double-
    buffered weight blocks fit the VMEM budget used elsewhere."""
    budget = 10 * 1024 * 1024
    slab = c_dim
    while slab > 128:
        # whh + wp blocks double-buffered, plus xp/cpre/hf blocks
        need = (2 * (p_dim * 4 * slab + slab * p_dim) +
                2 * (b * 4 * slab + 2 * b * slab)) * 4
        if need <= budget or slab % 2 or (slab // 2) % 128:
            break
        slab //= 2
    return slab


def lstmp_layer_streamed(p: dict, x: jnp.ndarray, reverse: bool = False,
                         cell_clip: float = 3.0, proj_clip: float = 3.0,
                         slab: int | None = None, weight_dtype=None):
    """LSTMP layer via the streaming kernel (allennlp param layout, as
    ``ops/rnn.py::lstmp_layer``): p = {w_x [4C, In], w_h [4C, P], b [4C],
    w_p [P, C]}; x: [B, T, In] -> (ys [B, T, P], h_last, c_last).

    The kernel is HBM-bandwidth bound on the per-step weight stream
    (~42 MB f32 at ELMo geometry, measured ~678 GB/s = ~85% of v5e peak).
    ``weight_dtype=jnp.bfloat16`` halves those bytes with BITWISE-identical
    outputs (the MXU rounds f32 matmul operands to bf16 under default
    precision anyway; verified on TPU) but currently measures SLOWER
    (124 vs 74 us/step at the zhs geometry) — the bf16 blocks lower to
    worse Mosaic code — so f32 remains the default; re-evaluate the
    opt-in on new toolchains.  Activations/state stay f32."""
    if reverse:
        x = jnp.flip(x, axis=1)
    b, t_steps, _ = x.shape
    p_dim, c_dim = p["w_p"].shape
    xp = jnp.einsum("bti,gi->btg", x, p["w_x"],
                    preferred_element_type=jnp.float32)
    xp4 = jnp.swapaxes(xp, 0, 1).reshape(t_steps, b, 4, c_dim)
    w_h_t3 = p["w_h"].T.reshape(p_dim, 4, c_dim)
    b3 = p["b"].reshape(1, 4, c_dim)
    w_p_t = p["w_p"].T
    if weight_dtype is not None:
        w_h_t3 = w_h_t3.astype(weight_dtype)
        w_p_t = w_p_t.astype(weight_dtype)
    if slab is None:
        slab = _lstmp_slab(c_dim, p_dim, b)
    ys, cs_pre = lstmp_sequence_streamed(xp4, w_h_t3, b3, w_p_t, slab,
                                         cell_clip, proj_clip)
    c_last = jnp.clip(cs_pre[-1], -cell_clip, cell_clip) if cell_clip \
        else cs_pre[-1]
    h_last = ys[-1]
    ys = jnp.swapaxes(ys, 0, 1)
    if reverse:
        ys = jnp.flip(ys, axis=1)
    return ys, h_last, c_last


# ---------------------------------------------------------------------------
# LSTM (i,f,g,o gate order — torch nn.LSTM)
# ---------------------------------------------------------------------------


def _lstm_bwd_kernel(xp_ref, whh_t_ref, bhh_ref, ys_ref, cs_ref, dys_ref,
                     dcs_ref, dxp_ref, dwhh_ref, dbhh_ref,
                     dh_scratch, dc_scratch):
    t_steps = xp_ref.shape[0]
    hidden = whh_t_ref.shape[0]
    dh_scratch[...] = jnp.zeros_like(dh_scratch)
    dc_scratch[...] = jnp.zeros_like(dc_scratch)
    dwhh_ref[...] = jnp.zeros_like(dwhh_ref)
    dbhh_ref[...] = jnp.zeros_like(dbhh_ref)

    def step(k, _):
        t = t_steps - 1 - k
        not_first = jnp.where(t == 0, 0.0, 1.0)
        h_prev = not_first * ys_ref[jnp.maximum(t - 1, 0)]
        c_prev = not_first * cs_ref[jnp.maximum(t - 1, 0)]
        gp = xp_ref[t] + jnp.dot(h_prev, whh_t_ref[...],
                                 preferred_element_type=jnp.float32) + \
            bhh_ref[...]
        i = jax.nn.sigmoid(gp[:, :hidden])
        f = jax.nn.sigmoid(gp[:, hidden:2 * hidden])
        g = jnp.tanh(gp[:, 2 * hidden:3 * hidden])
        o = jax.nn.sigmoid(gp[:, 3 * hidden:])
        c = cs_ref[t]
        tanh_c = jnp.tanh(c)

        dh = dys_ref[t] + dh_scratch[...]
        do = dh * tanh_c
        ds_o = do * o * (1.0 - o)
        dc = dh * o * (1.0 - tanh_c * tanh_c) + dc_scratch[...] + dcs_ref[t]
        di = dc * g
        ds_i = di * i * (1.0 - i)
        dg = dc * i
        ds_g = dg * (1.0 - g * g)
        df = dc * c_prev
        ds_f = df * f * (1.0 - f)
        dgates = jnp.concatenate([ds_i, ds_f, ds_g, ds_o], axis=1)  # [B,4H]
        dxp_ref[t] = dgates
        dh_scratch[...] = jnp.dot(dgates, whh_t_ref[...].T,
                                  preferred_element_type=jnp.float32)
        dc_scratch[...] = dc * f
        dwhh_ref[...] += jnp.dot(h_prev.T, dgates,
                                 preferred_element_type=jnp.float32)
        dbhh_ref[...] += jnp.sum(dgates, axis=0, keepdims=True)
        return 0

    jax.lax.fori_loop(0, t_steps, step, 0)


def _lstm_fwd(xp, w_hh_t, b_hh):
    # see _gru_fwd: the streamed kernel at chunk == t_steps IS the
    # single-block forward — one copy of the gate math per cell
    return _lstm_stream_fwd(xp, w_hh_t, b_hh, xp.shape[0])


@jax.custom_vjp
def lstm_sequence(xp: jnp.ndarray, w_hh_t: jnp.ndarray,
                  b_hh: jnp.ndarray):
    """xp: [T, B, 4H], w_hh_t: [H, 4H], b_hh: [1, 4H] -> (ys, cs) each
    [T, B, H]; zero initial state (torch default)."""
    return _lstm_fwd(xp, w_hh_t, b_hh)


def _lstm_fwd_rule(xp, w_hh_t, b_hh):
    ys, cs = _lstm_fwd(xp, w_hh_t, b_hh)
    return (ys, cs), (xp, w_hh_t, b_hh, ys, cs)


def _lstm_bwd_rule(residuals, grads):
    xp, w_hh_t, b_hh, ys, cs = residuals
    dys, dcs = grads
    t_steps, b, g = xp.shape
    hidden = g // 4
    dxp, dwhh, dbhh = pl.pallas_call(
        _lstm_bwd_kernel,
        out_shape=(jax.ShapeDtypeStruct((t_steps, b, g), xp.dtype),
                   jax.ShapeDtypeStruct((hidden, g), w_hh_t.dtype),
                   jax.ShapeDtypeStruct((1, g), b_hh.dtype)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 7,
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        scratch_shapes=[pltpu.VMEM((b, hidden), jnp.float32),
                        pltpu.VMEM((b, hidden), jnp.float32)],
        interpret=_interpret(),
    )(xp, w_hh_t, b_hh, ys, cs, dys, dcs)
    return dxp, dwhh, dbhh


lstm_sequence.defvjp(_lstm_fwd_rule, _lstm_bwd_rule)


def lstm_layer(p: dict, x: jnp.ndarray, reverse: bool = False):
    """One LSTM layer via the fused kernel (torch param layout).
    Returns (ys [B, T, H], h_last [B, H], c_last [B, H])."""
    if reverse:
        x = jnp.flip(x, axis=1)
    xp = jnp.einsum("btd,gd->btg", x, p["w_ih"],
                    preferred_element_type=jnp.float32) + p["b_ih"]
    xp = jnp.swapaxes(xp, 0, 1)
    ys, cs = lstm_sequence(xp, p["w_hh"].T, p["b_hh"][None, :])
    h_last, c_last = ys[-1], cs[-1]
    ys = jnp.swapaxes(ys, 0, 1)
    if reverse:
        ys = jnp.flip(ys, axis=1)
    return ys, h_last, c_last


def gru_layer(p: dict, x: jnp.ndarray, reverse: bool = False):
    """One GRU layer via the fused kernel.  ``p``: torch-layout params
    {w_ih [3H,D], w_hh [3H,H], b_ih [3H], b_hh [3H]}; x: [B, T, D].
    Returns (ys [B, T, H], h_last [B, H])."""
    if reverse:
        x = jnp.flip(x, axis=1)
    xp = jnp.einsum("btd,gd->btg", x, p["w_ih"],
                    preferred_element_type=jnp.float32) + p["b_ih"]
    xp = jnp.swapaxes(xp, 0, 1)                      # [T, B, 3H]
    ys = gru_sequence(xp, p["w_hh"].T, p["b_hh"][None, :])
    h_last = ys[-1]
    ys = jnp.swapaxes(ys, 0, 1)
    if reverse:
        ys = jnp.flip(ys, axis=1)
    return ys, h_last
