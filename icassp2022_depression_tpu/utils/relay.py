"""Relay weather probe: measure the host<->device link's CURRENT
round-trip latency and directional bandwidth.

The host<->TPU relay in this deployment has a stable per-round-trip
latency (~0.45 s for any blocking device->host fetch, regardless of
payload) but session-volatile bandwidth (measured ~16-900 MB/s in both
directions — docs/PERFORMANCE.md).  Every relay-bound benchmark or
product number is therefore only interpretable alongside the weather
that produced it: ``bench.py`` emits this probe's output as its first
JSON line (so each ``BENCH_r{N}.json`` is self-describing) and
``cli doctor`` reports it interactively.

The probe is transfer-shaped, not compute-shaped: the only compiled
programs are a fixed-shape 1-row slice and an elementwise add (both
tiny, persisted in the compilation cache), so a warm probe costs about
``2 + 2*reps`` blocking round-trips plus ``reps`` payload transfers in
each direction.  Note the TPU behind the relay is single-tenant — a
probe issued while another process holds the chip blocks until that
process releases it (which is itself diagnostic).

The reference has no equivalent (single process, CPU, no device link);
this is operational tooling the deployment environment demands.
"""

from __future__ import annotations

import time

import numpy as np


def _median(xs):
    xs = sorted(xs)
    n = len(xs)
    return xs[n // 2] if n % 2 else 0.5 * (xs[n // 2 - 1] + xs[n // 2])


def probe_weather(size_mb: float = 8.0, reps: int = 3) -> dict:
    """Measure the current relay weather; returns a JSON-able dict.

    * ``roundtrip_s`` — median blocking fetch cost for a tiny payload
      (enqueue a 256-byte upload, fetch it back): the per-round-trip
      latency every blocking readback pays.
    * ``up_mb_s`` / ``down_mb_s`` — payload bandwidth per direction,
      latency-corrected (the measured transfer time minus the median
      round-trip), over a fresh ``size_mb`` int16 buffer per rep.

    Caching pitfalls this works around: ``jax.Array`` memoises its host
    value after the first conversion, so every *down* rep reads back a
    DISTINCT on-device array (``y + i``); every *up* rep uploads a fresh
    host buffer (copied outside the timed region).  Upload completion
    can't be observed directly through the relay
    (``block_until_ready`` returns early — CLAUDE.md), so each up rep
    is sequenced by fetching a 1-row slice of the uploaded array.
    """
    import jax
    import jax.numpy as jnp

    n = max(128, int(size_mb * 1e6 / 2))             # int16 elements
    payload_bytes = 2 * n
    host = (np.arange(n) % 251).astype(np.int16)
    tiny = np.ones(128, np.int16)

    head = jax.jit(lambda a: a[:1])
    bump = jax.jit(lambda a, b: a + b)

    # warm: pays the two tiny compiles and first-touch transfers
    y = jax.device_put(host)
    np.asarray(head(y))
    np.asarray(bump(y, jnp.int16(0)))

    rts = []
    for _ in range(reps):
        buf = tiny.copy()                            # defeat host-value reuse
        t0 = time.time()
        np.asarray(jax.device_put(buf))
        rts.append(time.time() - t0)
    roundtrip = _median(rts)

    ups = []
    for _ in range(reps):
        buf = host.copy()                            # memcpy outside timing
        t0 = time.time()
        np.asarray(head(jax.device_put(buf)))        # 2-byte fetch sequences
        ups.append(time.time() - t0)                 # the full upload

    downs = []
    for i in range(reps):
        w = bump(y, jnp.int16(i + 1))                # fresh array, no memo
        t0 = time.time()
        np.asarray(w)
        downs.append(time.time() - t0)

    def _bw(dt):
        return payload_bytes / 1e6 / max(dt - roundtrip, 1e-6)

    return {
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
        "probe_mb": round(payload_bytes / 1e6, 2),
        "reps": reps,
        "roundtrip_s": round(roundtrip, 4),
        "roundtrip_min_s": round(min(rts), 4),
        "roundtrip_max_s": round(max(rts), 4),
        "up_mb_s": round(_bw(_median(ups)), 1),
        "down_mb_s": round(_bw(_median(downs)), 1),
        "up_s": [round(t, 4) for t in ups],
        "down_s": [round(t, 4) for t in downs],
    }
