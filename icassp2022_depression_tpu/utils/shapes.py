"""Shared shape-bucketing policy.

Compiles go through a remote service with volatile latency, so every
variable-size axis in the framework is padded to a power-of-two bucket —
one compiled program per bucket instead of one per distinct size.  This
is the single definition of that policy (serving batch buckets,
extraction length buckets, cross-corpus window buckets).
"""

from __future__ import annotations


def next_pow2(n: int, minimum: int = 1) -> int:
    """Smallest ``minimum * 2**k`` that is >= ``n`` (``minimum`` itself
    for ``n <= minimum``)."""
    if minimum <= 0:
        raise ValueError(f"minimum must be positive, got {minimum} "
                         "(a non-positive base can never reach n)")
    b = minimum
    while b < n:
        b *= 2
    return b


def next_quantized(n: int, minimum: int = 1, frac: int = 8) -> int:
    """Smallest multiple of ``p / frac`` that is >= ``n``, where ``p`` is
    the power-of-two bucket BELOW ``n`` (``minimum`` itself for
    ``n <= minimum``).

    Geometric quantization with sub-octave steps: padding overhead is
    bounded by ``1/frac`` (12.5% at the default) instead of
    :func:`next_pow2`'s worst-case 100%, at ``frac`` compile keys per
    octave instead of 1.  Use it for LARGE relay-shipped axes where the
    padding bytes are the cost (the flat-packed PCM stream); keep
    :func:`next_pow2` for small/row axes where compile-key economy wins.
    ``minimum`` must be divisible by ``frac`` so steps stay integral.
    """
    if minimum <= 0:
        raise ValueError(f"minimum must be positive, got {minimum} "
                         "(a non-positive base can never reach n)")
    if frac <= 0 or minimum % frac:
        raise ValueError(f"frac must be positive and divide minimum, got "
                         f"frac={frac}, minimum={minimum}")
    if n <= minimum:
        return minimum
    p = minimum
    while p * 2 < n:
        p *= 2
    step = p // frac
    return -(-n // step) * step
