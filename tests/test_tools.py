"""Validation/simulation tool suite (EstimateROC, KmerStatSimulator,
GetHistogramStats, JavaRandom, IntervalIndex)."""

import io

import numpy as np
import pytest

from mhap_tpu.tools.estimate_roc import EstimateROC
from mhap_tpu.tools.get_histogram_stats import GetHistogramStats
from mhap_tpu.tools.kmer_stat_simulator import KmerStatSimulator
from mhap_tpu.utils.intervals import IntervalIndex, range_overlap
from mhap_tpu.utils.javarandom import JavaRandom


def test_javarandom_gold_values():
    """Published java.util.Random(0) outputs."""
    r = JavaRandom(0)
    assert r.next_int32() == -1155484576
    assert r.next_int32() == -723955400
    r = JavaRandom(0)
    assert r.next_double() == pytest.approx(0.730967787376657, abs=1e-15)
    r = JavaRandom(42)
    assert r.next_int32() == -1170105035


def test_interval_index_strict_bounds():
    """Interval.java semantics: strictly exclusive intersection."""
    ix = IntervalIndex()
    ix.add(10, 20, "a")
    ix.add(30, 40, "b")
    assert ix.get(15, 35) == ["a", "b"]
    assert ix.get(20, 30) == []           # touching endpoints don't count
    assert ix.get(19, 31) == ["a", "b"]
    assert ix.stab(15) == ["a"]
    assert ix.stab(10) == []              # exclusive contains
    assert range_overlap(0, 10, 5, 20) == 6
    assert range_overlap(0, 10, 20, 30) == -9


def _mutate(rng, s, err=0.10):
    arr = np.array(list("ACGT"))
    out = []
    for ch in s:
        r = rng.random()
        if r < err * 0.4:
            out.append(ch)
            out.append(str(arr[rng.integers(0, 4)]))
        elif r < err * 0.7:
            pass
        elif r < err:
            out.append(str(arr[rng.integers(0, 4)]))
        else:
            out.append(ch)
    return "".join(out)


@pytest.fixture(scope="module")
def roc_setup(tmp_path_factory):
    """Synthetic genome + reads with known placements; truth M4 + overlaps
    from the device pipeline + FASTA on disk."""
    from mhap_tpu.pipeline.overlapper import TpuOverlapper

    tmp = tmp_path_factory.mktemp("roc")
    rng = np.random.default_rng(21)
    arr = np.array(list("ACGT"))
    genome = "".join(arr[rng.integers(0, 4, 30000)])
    n = 14
    reads, places = [], []
    for i in range(n):
        pos = int(rng.integers(0, 25000))
        ln = 4000
        reads.append(_mutate(rng, genome[pos:pos + ln]))
        places.append((pos, pos + ln))

    fasta = tmp / "reads.fa"
    with open(fasta, "w") as f:
        for i, r in enumerate(reads):
            f.write(f">{i + 1}\n{r}\n")

    truth = tmp / "truth.m4"
    with open(truth, "w") as f:
        for i, (s, e) in enumerate(places):
            ln = len(reads[i])
            f.write(f"{i + 1} chr1 -{ln} 95.0 0 0 {ln} {ln} 0 {s} {e} "
                    f"30000 254\n")

    ovl = tmp / "ovls.mhap"
    lines = TpuOverlapper(dict(num_hashes=256, ordered_sketch_size=1024,
                               num_min_matches=2)).overlap_self(reads)
    with open(ovl, "w") as f:
        f.write("\n".join(lines) + "\n")
    return str(truth), str(ovl), str(fasta), reads, places


def test_estimate_roc_monte_carlo(roc_setup):
    truth, ovl, fasta, reads, places = roc_setup
    g = EstimateROC(min_ovl_len=1500, num_trials=300)
    g.process_reference(truth)
    g.load_fasta(fasta)
    g.process_overlaps(ovl)
    g.estimate_sensitivity()
    g.estimate_specificity()
    g.estimate_ppv()
    assert g.sensitivity() > 0.7
    assert g.specificity() > 0.9
    assert g.ppv > 0.7


def test_estimate_roc_full_mode(roc_setup):
    truth, ovl, fasta, reads, places = roc_setup
    g = EstimateROC(min_ovl_len=1500, num_trials=0)
    g.process_reference(truth)
    g.load_fasta(fasta)
    g.process_overlaps(ovl)
    g.full_estimate()
    assert g.tp > 0
    assert g.ppv > 0.7


def test_estimate_roc_dp_adjudication(roc_setup):
    """A true overlap absent from the truth clusters must be rescued by the
    native Smith-Waterman check (computeDP path)."""
    truth, ovl, fasta, reads, places = roc_setup
    g = EstimateROC(min_ovl_len=1500, num_trials=50, do_dp=True)
    g.process_reference(truth)
    g.load_fasta(fasta)
    g.process_overlaps(ovl)
    # directly exercise computeDP on a known genuine overlap
    rescued = 0
    checked = 0
    for name, o in list(g.ovl_info.items())[:5]:
        checked += 1
        if g._compute_dp(o.id1, o.id2):
            rescued += 1
    assert checked > 0 and rescued > 0


def test_overlap_format_parsers(roc_setup):
    truth, ovl, fasta, reads, places = roc_setup
    g = EstimateROC()
    g.data_seq = reads
    # MHAP 12-col
    o = g.parse_overlap_line("2 1 0.15 98.0 0 10 3000 4000 1 5 2995 4000")
    assert (o.id1, o.id2, o.is_fwd) == ("2", "1", False)
    assert (o.afirst, o.asecond, o.bfirst, o.bsecond) == (10, 3000, 5, 2995)
    # CA 7-col: a/b offsets
    o = g.parse_overlap_line("1 2 N 100 -50 12.0 0.0")
    assert o.is_fwd and o.afirst == 100
    # BLASR M4 13-col fwd
    o = g.parse_overlap_line(
        "1/0_4000 2 -500 99.0 0 0 4000 4000 0 10 3980 4000 254")
    assert o.id1 == "1" and o.afirst == 0 and o.bfirst == 10
    # DAligner bracketed
    o = g.parse_overlap_line(
        "  1  2 n   [ 4,746.. 8,108] x [     0.. 3,896] :   <  982 diffs  "
        "( 34 trace pts)")
    assert (o.afirst, o.asecond, o.bfirst, o.bsecond) == (4746, 8108, 0, 3896)


def test_kmer_stat_simulator_stats():
    sim = KmerStatSimulator(6, kmer=12, requested_length=600, overlap=400)
    out = io.StringIO()
    sim.simulate(0.04, 0.03, 0.03, out=out)
    assert len(sim.shared_jaccard) == 6
    # overlapping pairs share far more k-mers than random pairs
    assert np.mean(sim.shared_jaccard) > 5 * max(np.mean(sim.random_jaccard), 1e-9)
    assert np.mean(sim.shared_minhash) >= np.mean(sim.random_minhash)
    assert "Shared jaccard stats:" in out.getvalue()


def test_kmer_stat_simulator_fasta_mode():
    sim = KmerStatSimulator(4, kmer=-1, requested_length=300)
    out = io.StringIO()
    sim.simulate(0.05, 0.03, 0.02, out=out)
    lines = out.getvalue().splitlines()
    headers = [l for l in lines if l.startswith(">")]
    assert len(headers) == 4
    seqs = [l for l in lines if l and not l.startswith(">")]
    assert all(set(s) <= set("ACGT") for s in seqs)


def test_kmer_simulator_determinism():
    a = KmerStatSimulator(3, kmer=10, requested_length=300, overlap=200)
    b = KmerStatSimulator(3, kmer=10, requested_length=300, overlap=200)
    a.simulate(0.03, 0.03, 0.03, out=io.StringIO())
    b.simulate(0.03, 0.03, 0.03, out=io.StringIO())
    assert a.shared_jaccard == b.shared_jaccard
    assert a.random_minhash == b.random_minhash


def test_get_histogram_stats(tmp_path):
    p = tmp_path / "hist.txt"
    p.write_text("1 4\n2 3\n10 1\n")
    s = GetHistogramStats(str(p), 0.5)
    s.process()
    vals = [1] * 4 + [2] * 3 + [10]
    assert s.mean == pytest.approx(np.mean(vals))
    assert s.stdev == pytest.approx(np.std(vals))
    # cumulative weighted percent: sum=20; 1*4=4 (0.2), +2*3=10 (0.5), +10=20
    assert s.cut == 10
    assert "%.4f" % s.mean in str(s)


def test_estimate_roc_batched_device_dp(roc_setup):
    """Batched on-device SW adjudication agrees with the per-pair native
    path on the PPV estimate."""
    truth, ovl, fasta, reads, places = roc_setup
    a = EstimateROC(min_ovl_len=1500, num_trials=60, do_dp=True)
    a.process_reference(truth)
    a.load_fasta(fasta)
    a.process_overlaps(ovl)
    a.estimate_ppv(batch_dp=False)
    b = EstimateROC(min_ovl_len=1500, num_trials=60, do_dp=True)
    b.process_reference(truth)
    b.load_fasta(fasta)
    b.process_overlaps(ovl)
    b.estimate_ppv(batch_dp=True)
    # same RNG stream -> same trial pairs; adjudication may differ only on
    # co-optimal alignment paths
    assert abs(a.ppv - b.ppv) <= 0.05
