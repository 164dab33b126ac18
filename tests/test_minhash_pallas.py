"""Pallas minhash kernel (interpret mode on CPU) vs the XLA scan kernel."""

import jax.numpy as jnp
import numpy as np

from mhap_tpu.ops import minhash as kmh
from mhap_tpu.ops import murmur3 as km
from mhap_tpu.ops.minhash_pallas import (min_reduce_w1_pallas,
                                         weighted_min_reduce_pallas)


def test_pallas_matches_scan():
    rng = np.random.default_rng(41)
    B, L, k, H, W = 4, 400, 16, 32, 4
    bases = np.frombuffer(b"ACGT", np.uint8)
    seq = bases[rng.integers(0, 4, (B, L))]
    # inject repeats for weight > 1
    seq[:, 100:150] = seq[:, 50:100]
    lens = np.full(B, L, np.int32)
    valid = jnp.asarray(np.arange(L - k + 1)[None, :] < (lens[:, None] - k + 1))
    hi, lo = km.kmer_hashes_128(jnp.asarray(seq), k, 0)
    g = kmh.sort_and_count(hi, lo, valid)
    w = jnp.where(g["first"], jnp.minimum(g["count"], W), 0)
    active = g["first"] & (w > 0)

    want = np.asarray(kmh.weighted_min_reduce(
        g["hi"], g["lo"], w, active, g["tiebreak"], num_hashes=H, w_max=W))
    got = np.asarray(weighted_min_reduce_pallas(
        g["hi"], g["lo"], w, active, g["tiebreak"], num_hashes=H, w_max=W,
        interpret=True))
    np.testing.assert_array_equal(got, want)


def test_pallas_w1_matches_scan():
    """The specialized w=1 kernel vs the generic scan at weight 1,
    INCLUDING duplicate k-mers left active (the w=1 rung feeds every
    valid position, not a deduped set -- equal hashes tie to the same
    stored key)."""
    rng = np.random.default_rng(43)
    B, L, k, H = 4, 400, 16, 32
    bases = np.frombuffer(b"ACGT", np.uint8)
    seq = bases[rng.integers(0, 4, (B, L))]
    seq[:, 100:150] = seq[:, 50:100]  # repeats: duplicate active lanes
    lens = np.array([L, L, 213, k], np.int32)
    n = L - k + 1
    valid = jnp.asarray(np.arange(n)[None, :] < (lens[:, None] - k + 1))
    hi, lo = km.kmer_hashes_128(jnp.asarray(seq), k, 0)
    idx = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), (B, n))
    ones = jnp.ones((B, n), jnp.int32)

    want = np.asarray(kmh.weighted_min_reduce(
        hi, lo, ones, valid, idx, num_hashes=H, w_max=1))
    got = np.asarray(min_reduce_w1_pallas(
        hi, lo, valid, num_hashes=H, interpret=True))
    np.testing.assert_array_equal(got, want)
