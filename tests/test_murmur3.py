"""Bit-exactness of the murmur3 oracle vs canonical C and sklearn.

The hash layer is the highest-risk parity item (SURVEY.md section 7): the
reference hashes the UTF-16 chars of Java k-mer substrings with guava
murmur3_128/murmur3_32 (sketch/HashUtils.java:237-258, :213-235).
"""

import numpy as np
import pytest
from sklearn.utils import murmurhash3_32 as sk_mmh3_32

from mhap_tpu.oracle import murmur3 as om
from mhap_tpu.utils import native


def test_x64_128_published_vector():
    # mmh3.hash64('foo') == (-2129773440516405919, 9128664383759220103)
    h1, h2 = native.murmur3_x64_128(b"foo", 0)
    assert np.int64(np.uint64(h1)) == -2129773440516405919
    assert np.int64(np.uint64(h2)) == 9128664383759220103
    o1, o2 = om.murmur3_x64_128(np.frombuffer(b"foo", dtype=np.uint8).reshape(1, -1), 0)
    assert (int(o1[0]), int(o2[0])) == (h1, h2)


def test_x86_32_vs_sklearn_and_native():
    rng = np.random.default_rng(0)
    for _ in range(300):
        n = int(rng.integers(1, 48))
        data = bytes(rng.integers(0, 256, n, dtype=np.uint8))
        seed = int(rng.integers(0, 2**31))
        a = native.murmur3_x86_32(data, seed)
        b = int(sk_mmh3_32(data, seed=seed, positive=True))
        c = int(om.murmur3_x86_32(np.frombuffer(data, dtype=np.uint8).reshape(1, -1), seed)[0])
        assert a == b == c


def test_x64_128_oracle_vs_native_fuzz():
    rng = np.random.default_rng(1)
    for _ in range(300):
        n = int(rng.integers(1, 80))
        data = bytes(rng.integers(0, 256, n, dtype=np.uint8))
        seed = int(rng.integers(0, 2**32))
        a = native.murmur3_x64_128(data, seed)
        b1, b2 = om.murmur3_x64_128(np.frombuffer(data, dtype=np.uint8).reshape(1, -1), seed)
        assert a == (int(b1[0]), int(b2[0]))


def test_negative_seed_sign_extension():
    # guava Murmur3_128Hasher sign-extends the int seed to long
    seed = 0xFFFFFFFF  # -1 as int32
    a = native.murmur3_x64_128(b"ACGTACGTACGTACGT", seed)
    b1, b2 = om.murmur3_x64_128(
        np.frombuffer(b"ACGTACGTACGTACGT", dtype=np.uint8).reshape(1, -1), seed)
    assert a == (int(b1[0]), int(b2[0]))


def test_kmer_hash_batching():
    """Vectorized per-k-mer hashing equals per-substring hashing."""
    rng = np.random.default_rng(2)
    seq = "".join(np.array(list("ACGTN"))[rng.integers(0, 5, 200)])
    codes = np.frombuffer(seq.encode(), dtype=np.uint8)
    for k in (12, 16, 13):
        windows = np.lib.stride_tricks.sliding_window_view(codes, k)
        got128 = om.hash_kmers_128(windows, 0)
        got32 = om.hash_kmers_32(windows)
        nat128 = native.kmer_hashes_128(codes, k, 0)
        nat32 = native.kmer_hashes_32(codes, k, 0)
        np.testing.assert_array_equal(got128, nat128)
        np.testing.assert_array_equal(got32, nat32)
        # spot-check one substring via utf-16le explicit bytes
        s = seq[5:5 + k].encode("utf-16-le")
        h1, _ = native.murmur3_x64_128(s, 0)
        assert int(got128[5]) == h1


def test_empty_input():
    assert native.murmur3_x86_32(b"", 0) == 0
    h1, h2 = native.murmur3_x64_128(b"", 0)
    assert (h1, h2) == (0, 0)
