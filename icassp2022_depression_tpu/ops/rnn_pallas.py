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


def _gru_fwd_kernel(xp_ref, whh_t_ref, bhh_ref, ys_ref, h_scratch):
    t_steps = xp_ref.shape[0]
    hidden = whh_t_ref.shape[0]
    h_scratch[...] = jnp.zeros_like(h_scratch)

    def step(t, _):
        h = h_scratch[...]
        hp = jnp.dot(h, whh_t_ref[...],
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
        h_new = (1.0 - z) * n + z * h
        h_scratch[...] = h_new
        ys_ref[t] = h_new
        return 0

    jax.lax.fori_loop(0, t_steps, step, 0)


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
    t_steps, b, g = xp.shape
    hidden = g // 3
    return pl.pallas_call(
        _gru_fwd_kernel,
        out_shape=jax.ShapeDtypeStruct((t_steps, b, hidden), xp.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((b, hidden), jnp.float32)],
        interpret=_interpret(),
    )(xp, w_hh_t, b_hh)


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
