"""Streaming long-read sketcher: bit-identical to the dense path/oracle."""

import numpy as np
import pytest

from mhap_tpu.oracle import pipeline as op
from mhap_tpu.oracle import sketch as osk
from mhap_tpu.pipeline.overlapper import TpuOverlapper

CFG = dict(num_hashes=64, ordered_sketch_size=256, num_min_matches=2)


def random_dna(rng, n):
    return "".join(np.array(list("ACGT"))[rng.integers(0, 4, n)])


def test_long_read_sketch_matches_oracle():
    rng = np.random.default_rng(51)
    # repeats across window boundaries exercise the cross-window dedup
    base = random_dna(rng, 9000)
    seq = base + base[:2500] + random_dna(rng, 2000)
    ov = TpuOverlapper(CFG)
    ov.long_window = 4096  # force several windows
    res = ov._sketch_long(
        np.frombuffer(seq.encode(), np.uint8))
    mh, merged, nk = res
    want_mh = osk.minhash_sketch(seq, 16, CFG["num_hashes"], None, 0.9)
    np.testing.assert_array_equal(mh, want_mh)
    want_bot, want_nk = osk.bottom_sketch(seq, 12, CFG["ordered_sketch_size"])
    assert nk == want_nk
    np.testing.assert_array_equal(merged, want_bot)


def test_long_read_pipeline_end_to_end():
    rng = np.random.default_rng(52)
    genome = random_dna(rng, 30000)
    # one "long" read (driven through the streaming path via a small
    # threshold) + normal reads overlapping it
    long_read = genome[:20000]
    normals = [genome[15000:19000], genome[500:4000],
               random_dna(rng, 3000)]
    reads = [long_read] + normals
    want = op.overlap_self(reads, CFG)
    ov = TpuOverlapper(CFG)
    ov.LONG_READ_THRESHOLD = 8192
    ov.long_window = 4096
    got = ov.overlap_self(reads)
    assert got == want
    assert len(got) >= 2  # both overlapping normals found
