"""Bitonic sort/merge networks on packed multi-limb u32 keys.

``lax.sort`` with several operands runs a general variadic comparator at
every exchange; the hot sorts on the overlap path all have compound integer
keys that pack into 2-3 u32 limbs, and one of them (the scorer's master
structure) merges two already-sorted lists.  These specialized networks are
pure elementwise slice/min/max graphs -- no gathers, no scatters -- which
XLA fuses into a handful of kernels.

Used by:
  * ops/scorer._sorted_pair_structure -- bitonic MERGE (log2(n) stages)
    of the two hash-sorted bottom-k sketches;
  * ops/minhash.sort_and_count -- full bitonic sort (log2(n)*(log2(n)+1)/2
    stages) of the per-read k-mer hash multiset (the reference's
    fastutil radixSortIndirect analog, sketch/BottomOverlapSketch.java:543).

All functions sort along the LAST axis, ascending, lexicographically on the
limb tuple; n must be a power of two (callers pad with all-ones max keys).
"""

from __future__ import annotations

import jax.numpy as jnp


def _gt(a, b):
    """Lexicographic a > b over limb tuples."""
    r = a[0] > b[0]
    eq = a[0] == b[0]
    for x, y in zip(a[1:], b[1:]):
        r = r | (eq & (x > y))
        eq = eq & (x == y)
    return r


def _exchange(limbs, d, flip):
    """One compare-exchange stage at distance d (blocks of 2d).

    flip=True mirrors the upper half (the 'flip' stage that turns two
    sorted runs of d into a bitonic run of 2d); flip=False is the plain
    half-cleaner.
    """
    shape = limbs[0].shape
    n = shape[-1]
    rs = shape[:-1] + (n // (2 * d), 2, d)
    r = [x.reshape(rs) for x in limbs]
    a = [x[..., 0, :] for x in r]
    b = [x[..., 1, ::-1] if flip else x[..., 1, :] for x in r]
    sw = _gt(a, b)
    out = []
    for x, y in zip(a, b):
        lo = jnp.where(sw, y, x)
        hi = jnp.where(sw, x, y)
        if flip:
            hi = hi[..., ::-1]
        out.append(jnp.stack([lo, hi], axis=-2).reshape(shape))
    return out


def merge(*limbs):
    """Sort a bitonic sequence (e.g. concat(sorted_a, sorted_b[::-1]))."""
    n = limbs[0].shape[-1]
    limbs = list(limbs)
    d = n // 2
    while d >= 1:
        limbs = _exchange(limbs, d, flip=False)
        d //= 2
    return limbs


def sort(*limbs):
    """Full ascending sort of arbitrary input."""
    n = limbs[0].shape[-1]
    limbs = list(limbs)
    k = 2
    while k <= n:
        limbs = _exchange(limbs, k // 2, flip=True)
        d = k // 4
        while d >= 1:
            limbs = _exchange(limbs, d, flip=False)
            d //= 2
        k *= 2
    return limbs


def next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p
