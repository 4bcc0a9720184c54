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
