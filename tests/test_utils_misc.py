"""MersenneTwisterFast port, RandomSequenceGenerator, PAF conversion."""

import numpy as np
import pytest

from mhap_tpu.io.formats import m4_to_paf
from mhap_tpu.utils.mersenne import MersenneTwisterFast
from mhap_tpu.utils.seqgen import RandomSequenceGenerator


def test_mt19937_gold_stream():
    """Standard MT19937 with init_genrand(5489) gold values (the canonical
    reference stream; MTF.setSeed uses the same initializer)."""
    r = MersenneTwisterFast(5489)
    first = [r._next32() for _ in range(5)]
    assert first == [3499211612, 581869302, 3890346734, 3586334585,
                     545404204]


def test_mt_nextdouble_definition():
    r1 = MersenneTwisterFast(12345)
    r2 = MersenneTwisterFast(12345)
    y = r2._next32()
    z = r2._next32()
    want = (((y >> 6) << 27) + (z >> 5)) / float(1 << 53)
    assert r1.next_double() == want
    assert 0.0 <= want < 1.0


def test_mt_next_int_bounds():
    r = MersenneTwisterFast(7)
    vals = [r.next_int(10) for _ in range(1000)]
    assert min(vals) >= 0 and max(vals) <= 9
    assert len(set(vals)) == 10
    vals = [r.next_int(8) for _ in range(100)]  # power-of-2 path
    assert min(vals) >= 0 and max(vals) <= 7


def test_mt_gaussian_moments():
    r = MersenneTwisterFast(3)
    g = np.asarray([r.next_gaussian() for _ in range(4000)])
    assert abs(g.mean()) < 0.08
    assert abs(g.std() - 1.0) < 0.08


def test_seqgen_pacbio_error_rates():
    g = RandomSequenceGenerator(11)
    s = g.generate_random_sequence(20000)
    assert set(s) <= set("ACGT")
    mutated = g.add_pacbio_error(s)
    # Reference quirk (RandomSequenceGenerator.java:117-134): errorType is
    # compared against the RAW rates without normalizing, so with
    # ins/del/sub = .1188/.0183/.0129 a fraction 1-(.1188+.0129) = 86.8%
    # of the 15% error events fall through to DELETE: the sequence
    # SHRINKS ~11%.  Mirrored faithfully.
    growth = len(mutated) / len(s)
    assert 0.86 < growth < 0.92
    # determinism
    g2 = RandomSequenceGenerator(11)
    assert g2.generate_random_sequence(20000) == s


def test_seqgen_error_rate_validation():
    g = RandomSequenceGenerator(1)
    with pytest.raises(ValueError):
        g.add_error("ACGT", -0.1, 0, 0)
    with pytest.raises(ValueError):
        g.add_error("ACGT", 0.5, 0.5, 0.5)


def test_m4_to_paf_fwd_and_rc():
    m4 = "2 1 0.150000 98.000000 0 10 3000 3100 0 5 2995 3050"
    paf = m4_to_paf(m4).split("\t")
    assert paf[:9] == ["2", "3100", "10", "3000", "+", "1", "3050", "5",
                       "2995"]
    assert paf[11] == "255"
    assert paf[12] == "de:f:0.150000"
    # RC side flips coordinates and strand
    m4 = "2 1 0.150000 98.000000 0 10 3000 3100 1 5 2995 3050"
    paf = m4_to_paf(m4).split("\t")
    assert paf[4] == "-"
    assert paf[7] == str(3050 - 2995 - 1) and paf[8] == str(3050 - 5 - 1)


def test_seqstats_protein_and_stats():
    from mhap_tpu.utils.seqstats import (convert_to_fasta, linear_regression,
                                         mean, pearson_corr, std, to_protein)

    # stops translate to 'X'; the reference loop bound (i < len-3) trims
    # a codon that ends exactly at the sequence end
    assert to_protein("ATGGCCTAAG") == "MAX"
    assert to_protein("ATGGCC") == "M"  # the GCC codon is trimmed
    # reverse frame: rc("CAT") = "ATG"
    assert to_protein("GGCCATGGCC", is_reversed=True)[0:1] in ("G", "M", "A")
    assert convert_to_fasta("A" * 25, width=10) == "A" * 10 + "\n" + \
        "A" * 10 + "\n" + "A" * 5
    a = [1, 2, 3, 4]
    b = [2, 4, 6, 8]
    assert mean(a) == 2.5
    assert std(a) == pytest.approx(np.std(a))
    assert pearson_corr(a, b) == pytest.approx(1.0)
    alpha, beta = linear_regression(a, b)
    assert alpha == pytest.approx(0.0) and beta == pytest.approx(2.0)
