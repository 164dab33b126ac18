"""Device pipeline vs oracle: the emitted M4 line sets must be identical."""

import numpy as np
import pytest

from mhap_tpu.oracle import pipeline as op
from mhap_tpu.pipeline.overlapper import TpuOverlapper

CFG = dict(num_hashes=128, ordered_sketch_size=512, num_min_matches=2)


@pytest.fixture(scope="module")
def overlapper():
    return TpuOverlapper(CFG, pair_chunk=64)


def test_overlap_self_equals_oracle(synthetic_reads, overlapper):
    genome, reads, positions = synthetic_reads
    want = op.overlap_self(reads, CFG)
    got = overlapper.overlap_self(reads)
    assert got == want
    assert len(got) > 5  # sanity: overlaps were actually found


def test_overlap_self_with_rc_reads(synthetic_reads, overlapper, rng):
    genome, reads, positions = synthetic_reads
    from mhap_tpu.oracle.seq import reverse_complement
    mixed = reads[:6] + [reverse_complement(r) for r in reads[6:12]]
    want = op.overlap_self(mixed, CFG)
    got = overlapper.overlap_self(mixed)
    assert got == want
    assert any(l.split()[4] == "1" or l.split()[8] == "1" for l in got)


def test_overlap_query_equals_oracle(synthetic_reads, overlapper):
    genome, reads, positions = synthetic_reads
    box, queries = reads[:10], reads[10:16]
    want = op.overlap_query(box, queries, CFG)
    got = overlapper.overlap_query(box, queries)
    assert got == want


def test_short_and_dropped_reads(synthetic_reads, overlapper):
    genome, reads, positions = synthetic_reads
    mixed = [reads[0], "ACGT" * 10, reads[1], reads[2]]  # read 2 dropped
    want = op.overlap_self(mixed, CFG)
    got = overlapper.overlap_self(mixed)
    assert got == want
    ids = {p for l in got for p in l.split()[:2]}
    assert "2" not in ids


def test_headers_mode(synthetic_reads, overlapper):
    genome, reads, positions = synthetic_reads
    headers = [f"read/{i}/0_{len(r)}" for i, r in enumerate(reads[:8])]
    want = op.overlap_self(reads[:8], CFG, headers=headers)
    got = overlapper.overlap_self(reads[:8], headers=headers)
    assert got == want


def test_weight_cap_row_escalation():
    """Rows whose max k-mer occurrence count exceeds the first rung's cap
    are re-sketched by the row-level escalation kernel and match the
    oracle exactly (tf weights, MinHashSketch.java:109-126)."""
    from mhap_tpu.pipeline import overlapper as OV
    from mhap_tpu.oracle import sketch as osk

    rng = np.random.default_rng(3)
    arr = np.array(list("ACGT"))
    reads = []
    for _ in range(6):  # tandem repeats -> counts > 1 (escalating rows)
        unit = "".join(arr[rng.integers(0, 4, 30)])
        pre = "".join(arr[rng.integers(0, 4, 120)])
        post = "".join(arr[rng.integers(0, 4, 120)])
        reads.append(pre + unit * 6 + post)
    for _ in range(6):  # plain rows stay on the w_cap=1 rung
        reads.append("".join(arr[rng.integers(0, 4, 400)]))

    calls = []
    orig = OV._sketch_minhash_codes_jit

    def spy(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    OV._sketch_minhash_codes_jit = spy
    try:
        ov = TpuOverlapper(
            dict(num_hashes=64, min_olap_length=100, min_store_length=0))
        store = ov.sketch_reads(reads, do_rc=False)
    finally:
        OV._sketch_minhash_codes_jit = orig
    assert calls, "row escalation kernel never dispatched"
    mh = np.asarray(store.dev("minhash"))
    for i, r in enumerate(reads):
        want = osk.minhash_sketch(r, 16, 64, None, 0.9)
        assert np.array_equal(mh[i], want), f"read {i} minhash mismatch"


def test_weight_cap_inkernel_rung():
    """Rows with k-mer occurrence counts 2..ESC_INKERNEL[1] are
    re-sketched exactly INSIDE the chunk program (no host row-kernel
    dispatch) and match the oracle."""
    from mhap_tpu.oracle import sketch as osk
    from mhap_tpu.pipeline import overlapper as OV

    rng = np.random.default_rng(7)
    arr = np.array(list("ACGT"))
    reads = []
    for rep in (2, 3, 4):  # counts within the in-kernel cap
        unit = "".join(arr[rng.integers(0, 4, 40)])
        pre = "".join(arr[rng.integers(0, 4, 140)])
        post = "".join(arr[rng.integers(0, 4, 140)])
        reads.append(pre + unit * rep + post)
    for _ in range(5):
        reads.append("".join(arr[rng.integers(0, 4, 400)]))

    calls = []
    orig = OV._sketch_minhash_codes_jit

    def spy(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    OV._sketch_minhash_codes_jit = spy
    try:
        ov = TpuOverlapper(
            dict(num_hashes=64, min_olap_length=100, min_store_length=0))
        store = ov.sketch_reads(reads, do_rc=False)
    finally:
        OV._sketch_minhash_codes_jit = orig
    assert not calls, "w<=4 rows must be absorbed by the in-kernel rung"
    mh = np.asarray(store.dev("minhash"))
    for i, r in enumerate(reads):
        want = osk.minhash_sketch(r, 16, 64, None, 0.9)
        assert np.array_equal(mh[i], want), f"read {i} minhash mismatch"


def test_deferred_flags_miss_redoes_strictly():
    """overlap_self defers the sketch flags sync (OPTIMISTIC path); reads
    whose max k-mer weight exceeds the in-kernel rung must trip
    OptimisticSketchMiss and re-run strictly, with output identical to
    the oracle (and to a strict-from-the-start overlapper)."""
    rng = np.random.default_rng(11)
    arr = np.array(list("ACGT"))
    genome = arr[rng.integers(0, 4, 3000)]
    unit = "".join(arr[rng.integers(0, 4, 30)])

    def noisy(seg):
        out = []
        for b in seg:
            r = rng.random()
            if r < 0.02:
                continue
            if r < 0.05:
                out.append(str(arr[rng.integers(0, 4)]))
            out.append(b if r >= 0.08 else str(arr[rng.integers(0, 4)]))
        return "".join(out)

    # overlapping pair + a tandem-repeat read (weight > ESC_INKERNEL cap)
    reads = [noisy(genome[:2000]), noisy(genome[800:2800]),
             noisy(genome[1500:2200]) + unit * 8]
    want = op.overlap_self(reads, CFG)

    ov = TpuOverlapper(CFG, pair_chunk=64)
    assert ov._defer_flags
    got = ov.overlap_self(reads)
    assert got == want
    # the repeat-heavy read escalates -> deferral must have tripped off
    assert not ov._defer_flags

    strict = TpuOverlapper(CFG, pair_chunk=64)
    strict._defer_flags = False
    assert strict.overlap_self(reads) == want
