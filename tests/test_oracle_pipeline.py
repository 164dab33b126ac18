"""Behavioral tests of the oracle overlapper (the golden generator)."""

import numpy as np

from mhap_tpu.oracle import pipeline as op
from mhap_tpu.oracle import scorer as osc
from mhap_tpu.oracle import sketch as osk
from mhap_tpu.oracle.seq import reverse_complement


def test_rc_iupac():
    assert reverse_complement("ACGT") == "ACGT"
    assert reverse_complement("AACG") == "CGTT"
    assert reverse_complement("ANRY") == "RYNT"


def test_self_overlap_finds_truth(synthetic_reads):
    genome, reads, positions = synthetic_reads
    lines = op.overlap_self(reads)
    found = set()
    for l in lines:
        p = l.split()
        a, b = int(p[0]), int(p[1])
        found.add((min(a, b), max(a, b)))
        # long-long self rule: reported from the larger id side
        assert a > b
        # error column within plausible PacBio range
        assert 0.0 <= float(p[2]) <= 0.25
    tp = fn = 0
    for i in range(len(reads)):
        for j in range(i + 1, len(reads)):
            ov = min(positions[i] + 3000, positions[j] + 3000) - max(positions[i], positions[j])
            if ov > 1500:
                if (i + 1, j + 1) in found:
                    tp += 1
                else:
                    fn += 1
    assert fn == 0 and tp > 10


def test_reverse_complement_read_found(synthetic_reads, rng):
    genome, reads, positions = synthetic_reads
    # make read 2 the RC of a region overlapping read 1's region
    two = [reads[0], reverse_complement(reads[0])]
    lines = op.overlap_self(two)
    assert any(l.split()[:2] == ["2", "1"] for l in lines)
    # the matched orientation must be flagged RC on one side
    for l in lines:
        p = l.split()
        assert (int(p[4]) + int(p[8])) % 2 == 1  # exactly one side reversed


def test_scorer_identical_reads():
    rng = np.random.default_rng(7)
    seq = "".join(np.array(list("ACGT"))[rng.integers(0, 4, 2000)])
    sk, nk = osk.bottom_sketch(seq, 12, 1536)
    score, raw, a1, a2, b1, b2 = osc.get_overlap_info(sk, nk, sk, nk, 12, 0.2)
    assert score > 0.99
    assert a1 == b1 and a2 == b2
    assert raw >= 3


def test_scorer_unrelated_reads():
    rng = np.random.default_rng(8)
    s1 = "".join(np.array(list("ACGT"))[rng.integers(0, 4, 2000)])
    s2 = "".join(np.array(list("ACGT"))[rng.integers(0, 4, 2000)])
    k1, n1 = osk.bottom_sketch(s1, 12, 1536)
    k2, n2 = osk.bottom_sketch(s2, 12, 1536)
    score, raw, *_ = osc.get_overlap_info(k1, n1, k2, n2, 12, 0.2)
    assert score < 0.78  # below default accept threshold


def test_minhash_sketch_properties():
    rng = np.random.default_rng(9)
    seq = "".join(np.array(list("ACGT"))[rng.integers(0, 4, 1000)])
    mh = osk.minhash_sketch(seq, 16, 512)
    assert mh.shape == (512,)
    assert mh.dtype == np.int32
    # deterministic
    np.testing.assert_array_equal(mh, osk.minhash_sketch(seq, 16, 512))
    # jaccard with self = 1; with unrelated ~ 0
    other = "".join(np.array(list("ACGT"))[rng.integers(0, 4, 1000)])
    mo = osk.minhash_sketch(other, 16, 512)
    assert (mh == mo).mean() < 0.05


def test_bottom_sketch_sorted_and_stable():
    rng = np.random.default_rng(10)
    seq = "".join(np.array(list("ACGT"))[rng.integers(0, 4, 3000)])
    sk, nk = osk.bottom_sketch(seq, 12, 1536)
    assert nk == 3000 - 12 + 1
    assert len(sk) == 1536
    h = sk[:, 0].astype(np.int64)
    p = sk[:, 1].astype(np.int64)
    key = h * (2**32) + p
    assert np.all(np.diff(key) > 0)  # strictly sorted by (hash, pos)


def test_min_olap_length_id_numbering():
    """Short reads are dropped but still consume FASTA ids."""
    rng = np.random.default_rng(11)
    genome = "".join(np.array(list("ACGT"))[rng.integers(0, 4, 5000)])
    long1 = genome[:3000]
    short = genome[100:150]  # below min_olap_length=116 -> dropped, id=2
    long2 = genome[1000:4000]
    lines = op.overlap_self([long1, short, long2])
    ids = set()
    for l in lines:
        ids.update(l.split()[:2])
    assert "2" not in ids
    assert {"1", "3"} <= ids
