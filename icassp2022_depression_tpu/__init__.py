"""icassp2022_depression_tpu — a TPU-native (JAX/XLA/Pallas) framework for
automatic depression detection on the EATD-Corpus and DAIC-WOZ.

This is a from-scratch re-design of the capabilities of the reference
repository ``speechandlanguageprocessing/ICASSP2022-Depression`` (the
GRU/BiLSTM + attention-fusion models of arXiv 2202.08210) for TPU hardware:

* All compute-path kernels (log-mel frontend, NetVLAD pooling, GRU/BiLSTM
  recurrences, additive attention, fusion heads) are pure JAX/XLA with fused
  Pallas kernels for the recurrent hot loops.
* Entire training folds compile to a single XLA program (``lax.scan`` over
  epochs and minibatches with on-device metric-gated best-checkpoint
  tracking), instead of a Python step loop.
* Scale-out is expressed with ``jax.sharding.Mesh`` + ``shard_map`` data
  parallelism over ICI (see :mod:`icassp2022_depression_tpu.parallel`).

Layer map (mirrors SURVEY.md §1):

* L1 frontends      -> :mod:`.frontend` (+ :mod:`.ops.mel`, :mod:`.ops.netvlad`)
* L2 folds/augment  -> :mod:`.data`
* L3 models         -> :mod:`.models` (each defined exactly once)
* L4 training       -> :mod:`.train`
* L5 evaluation     -> :mod:`.eval`
"""

__version__ = "0.1.0"

import os as _os

import jax as _jax

# Persistent compilation cache: whole-fold training programs and frontend
# bucket pipelines are large XLA programs whose (possibly remote) compiles
# dominate cold-start time; the cache makes every repeat invocation start
# warm.  Opt out with ICASSP_TPU_NO_COMPILE_CACHE=1.
# The sandbox's sitecustomize pins JAX_PLATFORMS=axon in the environment
# and jax.config wins over the env var, so subprocesses (the product
# watchdog's supervised children, tests) cannot force a backend through
# the environment alone — this knob closes that gap at import time.
_plat = _os.environ.get("ICASSP_FORCE_PLATFORM")
if _plat:
    _jax.config.update("jax_platforms", _plat)

if not _os.environ.get("ICASSP_TPU_NO_COMPILE_CACHE"):
    _jax.config.update(
        "jax_compilation_cache_dir",
        _os.environ.get("ICASSP_TPU_COMPILE_CACHE",
                        _os.path.expanduser("~/.cache/icassp2022_tpu_xla")))
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from icassp2022_depression_tpu import config  # noqa: F401
