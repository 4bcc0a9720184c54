"""Training losses, including the decomposed fusion loss ``MyLoss``.

``MyLoss`` (clf: ``Classification/fuse_net_whole.py:376-395``; reg:
``Regression/fuse_net.py:353-366``) splits the joint ``fc_final`` weight
matrix at ``text_hidden_dims`` columns and scores each modality's feature
against its own sub-block, so the shared weight learns per-modality
predictive columns:

  loss = L(text_feat @ W[:, :Ht].T, y) + L(audio_feat @ W[:, Ht:].T, y)

with L = CrossEntropy (clf) or SmoothL1 against the raw SDS score (reg).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from icassp2022_depression_tpu.ops.nn import smooth_l1_loss


def _ce_logits(logits, labels, mask=None):
    """torch nn.CrossEntropyLoss on raw logits (the MyLoss path applies CE
    to F.linear outputs, i.e. true logits, unlike the branch trainers'
    softmaxed outputs)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    onehot = jax.nn.one_hot(labels, logits.shape[-1], dtype=logp.dtype)
    losses = -jnp.sum(onehot * logp, axis=-1)
    if mask is None:
        return jnp.mean(losses)
    mask = mask.astype(losses.dtype)
    return jnp.sum(losses * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def myloss_ce(text_feat, audio_feat, targets, w_final,
              text_hidden_dims: int, mask=None):
    """Classification MyLoss.  ``w_final``: [C, Ht + Ha]."""
    w_text = w_final[:, :text_hidden_dims]
    w_audio = w_final[:, text_hidden_dims:]
    pred_text = jnp.dot(text_feat, w_text.T, preferred_element_type=None)
    pred_audio = jnp.dot(audio_feat, w_audio.T, preferred_element_type=None)
    return _ce_logits(pred_text, targets, mask) + _ce_logits(pred_audio, targets, mask)


def myloss_smooth_l1(text_feat, audio_feat, targets, w_final,
                     text_hidden_dims: int, mask=None):
    """Regression MyLoss: SmoothL1 of each modality's linear score against
    the SDS target broadcast to the prediction shape
    (``Regression/fuse_net.py:364-366``)."""
    w_text = w_final[:, :text_hidden_dims]
    w_audio = w_final[:, text_hidden_dims:]
    pred_text = jnp.dot(text_feat, w_text.T, preferred_element_type=None)
    pred_audio = jnp.dot(audio_feat, w_audio.T, preferred_element_type=None)
    t = jnp.broadcast_to(targets.astype(jnp.float32)[:, None], pred_text.shape)
    m = None if mask is None else jnp.broadcast_to(mask[:, None], pred_text.shape)
    return (smooth_l1_loss(pred_text, t, m) + smooth_l1_loss(pred_audio, t, m))


# (branch-trainer loss dispatch lives in train/trainers.py:_branch_fns,
# which validates the configured loss name against the same three options)
