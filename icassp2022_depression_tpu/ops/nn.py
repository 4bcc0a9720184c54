"""Small fused NN primitives shared by the models (defined once, not
copy-pasted per file as in the reference)."""

from __future__ import annotations

import jax
import jax.numpy as jnp



def matmul_preferred(*operands):
    """preferred_element_type for MXU matmuls: f32 accumulation for
    f32/bf16 inputs (the TPU fast path), but never downcast f64 work
    (x64-mode parity tests)."""
    import jax.numpy as _jnp

    for op in operands:
        if hasattr(op, "dtype") and op.dtype == _jnp.float64:
            return _jnp.float64
    return _jnp.float32


def linear(params, x):
    """``x @ w.T + b`` with torch's [out, in] weight layout.

    Keeping the torch layout makes checkpoint porting and the MyLoss
    weight-column split (``fuse_net_whole.py:384-385``) direct; XLA folds the
    transpose into the matmul on the MXU.
    """
    return jnp.dot(x, params["w"].T,
                   preferred_element_type=matmul_preferred(x)) + params["b"]


def linear_nobias(w, x):
    return jnp.dot(x, w.T, preferred_element_type=matmul_preferred(x))


def layer_norm(params, x, eps: float = 1e-5):
    """LayerNorm over the last axis (torch nn.LayerNorm semantics, eps=1e-5,
    biased variance)."""
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    return (x - mean) * inv * params["w"] + params["b"]


def dropout(key, x, rate: float, train: bool):
    """Inverted dropout matching torch semantics (identity in eval mode)."""
    if not train or rate <= 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)


def softmax(x, axis=-1):
    return jax.nn.softmax(x, axis=axis)


def cross_entropy_on_probs(probs, labels, num_classes: int):
    """The reference's double-softmax loss: the models end in ``nn.Softmax``
    and the trainers then apply ``nn.CrossEntropyLoss`` to the probabilities
    (``audio_gru_whole.py:72,308``).  CE(logits=probs) = -log_softmax(probs)
    gathered at the label.  Reproduced exactly; mean reduction over batch."""
    logp = jax.nn.log_softmax(probs, axis=-1)
    onehot = jax.nn.one_hot(labels, num_classes, dtype=logp.dtype)
    return -jnp.mean(jnp.sum(onehot * logp, axis=-1))


def masked_cross_entropy_on_probs(probs, labels, mask, num_classes: int):
    """Mean-over-valid-rows variant for padded batches."""
    logp = jax.nn.log_softmax(probs, axis=-1)
    onehot = jax.nn.one_hot(labels, num_classes, dtype=logp.dtype)
    losses = -jnp.sum(onehot * logp, axis=-1)
    mask = mask.astype(losses.dtype)
    return jnp.sum(losses * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def l1_loss(pred, target, mask=None):
    """torch nn.L1Loss (mean reduction)."""
    err = jnp.abs(pred - target)
    if mask is None:
        return jnp.mean(err)
    mask = mask.astype(err.dtype)
    return jnp.sum(err * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def smooth_l1_loss(pred, target, mask=None, beta: float = 1.0):
    """torch nn.SmoothL1Loss (huber with beta=1, mean reduction)."""
    d = jnp.abs(pred - target)
    err = jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta)
    if mask is None:
        return jnp.mean(err)
    mask = mask.astype(err.dtype)
    return jnp.sum(err * mask) / jnp.maximum(jnp.sum(mask), 1.0)
