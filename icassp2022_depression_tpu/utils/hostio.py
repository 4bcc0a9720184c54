"""Host<->device IO helpers.

The relay between this host and the TPU has high per-round-trip latency
relative to its bandwidth, so the frontends dispatch every batch first
and fetch results in ONE device->host transfer (see
``docs/PERFORMANCE.md``).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def gather_chunks(chunks, n: int, dim: int = 0) -> np.ndarray:
    """Device-array chunks (same trailing shape) -> one host array of the
    first ``n`` rows, via an on-device concat and a single readback.

    ``dim`` shapes the empty-input result ``[0, dim]`` — without it an
    empty corpus would yield ``[0, 0]`` and poison downstream dim
    bookkeeping (e.g. the extraction sidecar's ``output_dim``)."""
    if not chunks:
        return np.zeros((0, dim), np.float32)
    # slice ON DEVICE before the transfer: callers pad their last chunk
    # (batch-row buckets), and shipping those rows would break the
    # never-transfer-padding-bytes invariant on the bandwidth-volatile
    # relay
    if len(chunks) == 1:
        return np.asarray(chunks[0][:n], np.float32)
    return np.asarray(jnp.concatenate(chunks, axis=0)[:n], np.float32)


def concat_device(chunks, n: int, dim: int) -> jnp.ndarray:
    """``gather_chunks``'s DEVICE-resident twin: same on-device concat +
    padding-row slice, but NO host readback — the result stays a device
    array for callers that keep computing (serving model forwards,
    cross-call accumulation).  ``dim`` shapes the empty result."""
    if not chunks:
        return jnp.zeros((0, dim), jnp.float32)
    if len(chunks) == 1:
        return chunks[0][:n]
    return jnp.concatenate(chunks, axis=0)[:n]
