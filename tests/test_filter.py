"""tf-idf / repeat filter parity: device pipeline vs oracle with a filter
file, across weight modes (legacy, tf-idf, suppress-noise)."""

import io

import numpy as np
import pytest

from mhap_tpu.oracle import pipeline as op
from mhap_tpu.oracle.filter import FrequencyCounts
from mhap_tpu.pipeline.freqfilter import VectorFrequencyFilter
from mhap_tpu.pipeline.overlapper import TpuOverlapper

CFG = dict(num_hashes=128, ordered_sketch_size=512, num_min_matches=2)


def make_filter_file(reads, k=16, top_frac=0.02):
    """Build a frequency file from the reads' own most-common k-mers."""
    from collections import Counter

    c = Counter()
    for r in reads:
        for i in range(len(r) - k + 1):
            c[r[i:i + k]] += 1
    total = sum(c.values())
    rows = c.most_common(max(3, int(len(c) * top_frac)))
    lines = [f"{len(c)} {len(rows)}"]
    for mer, cnt in rows:
        lines.append(f"{mer}\t{cnt / total}")
    # include some low-frequency k-mers below the cutoff too
    for mer, cnt in list(c.items())[:20]:
        lines.append(f"{mer}\t{1e-9}")
    return lines


def make_fc(lines, repeat_weight=0.9, remove_unique=0, no_tf=False):
    offset = repeat_weight if 0.0 <= repeat_weight < 1.0 else 0.0
    return FrequencyCounts(iter(lines), 1.0e-5, offset, remove_unique,
                           no_tf, 3.0, True)


@pytest.mark.parametrize("rw,remove_unique,no_tf", [
    (0.9, 0, False),   # default tf-idf
    (0.9, 2, False),   # suppress-noise 2
    (0.9, 0, True),    # no-tf
    (-1.0, 0, False),  # legacy unweighted
    (1.5, 0, False),   # tf-only
])
def test_filtered_overlap_device_vs_oracle(synthetic_reads, rw,
                                           remove_unique, no_tf):
    genome, reads, positions = synthetic_reads
    reads = reads[:8]
    lines = make_filter_file(reads)
    fc = make_fc(lines, rw, remove_unique, no_tf)
    cfg = dict(CFG, repeat_weight=rw)
    want = op.overlap_self(reads, cfg, kmer_filter=fc)
    ov = TpuOverlapper(cfg, kmer_filter=VectorFrequencyFilter(fc))
    got = ov.overlap_self(reads)
    assert got == want
    assert len(want) > 0


def test_filtered_remove_unique_1(synthetic_reads):
    """suppress-noise 1: k-mers absent from the filter file are dropped."""
    genome, reads, positions = synthetic_reads
    reads = reads[:6]
    lines = make_filter_file(reads, top_frac=0.5)
    fc = make_fc(lines, 0.9, remove_unique=1)
    cfg = dict(CFG)
    want = op.overlap_self(reads, cfg, kmer_filter=fc)
    ov = TpuOverlapper(cfg, kmer_filter=VectorFrequencyFilter(fc))
    got = ov.overlap_self(reads)
    assert got == want


def test_vector_filter_matches_oracle_pointwise(synthetic_reads):
    genome, reads, positions = synthetic_reads
    lines = make_filter_file(reads[:6])
    fc = make_fc(lines)
    vf = VectorFrequencyFilter(fc)
    from mhap_tpu.oracle import sketch as osk

    hashes = osk.sequence_kmer_hashes_128(reads[0], 16)
    keys, counts = osk.unique_in_first_occurrence_order(hashes)
    want = osk.compute_weights(keys, counts, fc, 0.9)
    got = vf.weights(keys.astype(np.uint64), counts, 0.9)
    np.testing.assert_array_equal(got, want)
    # keep/popular agree
    for h in keys[:50]:
        assert vf.keep_mask(np.asarray([h], np.uint64))[0] == fc.keep_kmer(int(h))
        assert vf.is_popular(np.asarray([h], np.uint64))[0] == fc.is_popular(int(h))


def test_guava_bloom_matches_exact_set_on_wellsized_filter():
    """With reference sizing (1e-5 FPP) the bloom-backed filter behaves
    identically to the exact set on any realistic input; an undersized
    bloom shows the guava false-positive behavior exists."""
    import numpy as np

    from mhap_tpu.oracle.filter import FrequencyCounts, GuavaBloomFilter

    rng0 = np.random.default_rng(42)
    kmers = ["".join("ACGT"[b] for b in rng0.integers(0, 4, 16))
             for _ in range(300)]
    lines = [f"{len(kmers)} {len(kmers)}"] + \
        [f"{k} 0.01" for k in kmers]
    exact = FrequencyCounts(iter(lines), 1e-5, 0.0, 1, False, 3.0, True)
    bloom = FrequencyCounts(iter(lines), 1e-5, 0.0, 1, False, 3.0, True,
                            use_bloom=True)
    from mhap_tpu.oracle.filter import kmer_string_hash

    for k in kmers:
        h = kmer_string_hash(k, True)
        assert exact.keep_kmer(h) and bloom.keep_kmer(h)
    rng = np.random.default_rng(0)
    for h in rng.integers(0, 2**63, 500).tolist():
        assert exact.keep_kmer(h) == bloom.keep_kmer(h)

    # undersized bloom (expected=1 for 3 inserts + k probes) -> some
    # false positives must appear among random probes
    bf = GuavaBloomFilter(1, 0.5)
    for k in kmers:
        bf.add(kmer_string_hash(k, True))
    fp = sum(1 for h in rng.integers(0, 2**63, 2000).tolist() if h in bf)
    assert fp > 0


def test_guava_bloom_vectorized_matches_scalar():
    import numpy as np

    from mhap_tpu.oracle.filter import GuavaBloomFilter

    rng = np.random.default_rng(3)
    bf = GuavaBloomFilter(100, 1e-5)
    keys = rng.integers(0, 2**63, 100, dtype=np.int64)
    for k in keys.tolist():
        bf.add(k)
    probes = np.concatenate([keys[:50], rng.integers(0, 2**63, 200,
                                                     dtype=np.int64)])
    vec = bf.contains_vec(probes.astype(np.uint64))
    for i, p in enumerate(probes.tolist()):
        assert vec[i] == (p in bf)
    assert vec[:50].all()
