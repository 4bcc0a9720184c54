"""Optimizers with the reference's exact settings.

* AdamW with per-group weight decay: decay 1e-5 on everything except
  LayerNorm params, which get 0 — the ``get_param_group`` split on the
  ``'ln'`` name substring (``Classification/audio_gru_whole.py:247-255``),
  expressed as an optax mask over pytree paths.
* Plain Adam (torch defaults) for the regression/fusion trainers
  (``Regression/audio_bilstm_perm.py:250``, ``fuse_net_whole.py:416``).

Torch parity notes: torch AdamW applies decoupled decay ``p -= lr*wd*p``,
matching ``optax.adamw``; betas (0.9, 0.999), eps 1e-8.
"""

from __future__ import annotations

import jax
import optax

from icassp2022_depression_tpu.config import OptimizerConfig


def layernorm_mask(params, dead_paths=()):
    """Pytree mask: True where weight decay applies.  A leaf is a LayerNorm
    param iff any dict key on its path starts with 'ln' (our param trees name
    them 'ln', 'ln1', 'ln2' — the torch models' 'ln*' attribute names).

    ``dead_paths`` additionally exempts blocks that receive no gradients in
    the reference model (e.g. the audio model's unused attention layer):
    torch's AdamW skips grad-less params entirely, so decoupled decay must
    not touch them either.
    """

    def exempt(path):
        for entry in path:
            if isinstance(entry, jax.tree_util.DictKey):
                key = str(entry.key)
                if key.startswith("ln") or key in dead_paths:
                    return True
        return False

    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: not exempt(path), params)


def build(cfg: OptimizerConfig, params, dead_paths=()):
    """Returns an optax GradientTransformation for the given param tree.

    Unknown names raise — a typo must not silently train with plain Adam
    (the reference recipes use exactly adamw-with-LayerNorm-exemption and
    adam; parity depends on which one ran)."""
    if cfg.name not in ("adam", "adamw"):
        raise ValueError(f"unknown optimizer {cfg.name!r}: expected "
                         "'adam' or 'adamw'")
    if cfg.name == "adamw" and cfg.weight_decay > 0:
        mask = layernorm_mask(params, dead_paths)
        return optax.adamw(cfg.learning_rate, b1=cfg.b1, b2=cfg.b2,
                           eps=cfg.eps, weight_decay=cfg.weight_decay,
                           mask=mask)
    return optax.adam(cfg.learning_rate, b1=cfg.b1, b2=cfg.b2, eps=cfg.eps)
