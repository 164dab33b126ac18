"""Alignment layer (L3) + secondary sketch family tests."""

import numpy as np
import pytest

from mhap_tpu.align.aligner import (Aligner, AlignElementString, Operation)
from mhap_tpu.align.elements import MinHashBitSequenceSubSketches
from mhap_tpu.sketches.bitindex import BitVectorIndex
from mhap_tpu.sketches.bits import (BitSketch, MinHashBitSketch, SimHash,
                                    bit_similarity_matrix,
                                    compute_ngram_hashes,
                                    compute_ngram_hashes_exact,
                                    pack_last_bits_msb_first)
from mhap_tpu.sketches.cosine import CosineDistanceSketch
from mhap_tpu.sketches.counters import ClassicCounter, CountMin


def random_dna(rng, n):
    return "".join(np.array(list("ACGT"))[rng.integers(0, 4, n)])


def mutate(rng, s, err=0.1):
    arr = np.array(list("ACGT"))
    out = []
    for ch in s:
        r = rng.random()
        if r < err / 3:
            out.append(ch)
            out.append(str(arr[rng.integers(0, 4)]))
        elif r < 2 * err / 3:
            pass
        elif r < err:
            out.append(str(arr[rng.integers(0, 4)]))
        else:
            out.append(ch)
    return "".join(out)


# ---------------- aligner ----------------

def test_gotoh_exact_match():
    al = Aligner(True, -1.0, -0.5, 0.0)
    a = AlignElementString("ACGTACGTAC")
    r = al.local_align_smith_water_gotoh(a, AlignElementString("ACGTACGTAC"))
    assert r.score == 10.0
    assert r.operations == [Operation.MATCH] * 10
    assert (r.a1, r.a2, r.b1, r.b2) == (0, 9, 0, 9)
    assert r.get_overlap_score(1) == 1.0


def test_gotoh_gap_and_mismatch():
    al = Aligner(True, -2.0, -0.5, 0.0)
    r = al.local_align_smith_water_gotoh(
        AlignElementString("AAACGTTTT"), AlignElementString("AAATTTT"))
    # best local alignment bridges the CG gap: 7 matches - gap cost
    assert r.score == pytest.approx(7 - 2 - 0.5)
    assert r.operations.count(Operation.MATCH) == 7


def test_gotoh_local_substring():
    """The reference recurrence has NO max(.,0) clamp inside the matrix
    (Aligner.java:158-166): a shared substring must pay its way in from the
    zero edges, so 7 matches reached via a gap-open from the boundary score
    7 - 3 = 4.  Mirrored exactly."""
    al = Aligner(False, -3.0, -1.0, 0.0)
    r = al.local_align_smith_water_gotoh(
        AlignElementString("GGGGGACGTACGGGGG"),
        AlignElementString("TTTACGTACGTTT"))
    assert r.score == 4.0


def test_one_skip_free_ends():
    al = Aligner(True, -1.0, -0.5, 0.0)
    # suffix of a matches prefix of b: one-skip should chain the overlap
    r = al.local_align_one_skip(
        AlignElementString("XXXXABCDE"), AlignElementString("ABCDEYYYY"))
    assert r.score == 5.0


# ---------------- bit sketches ----------------

def test_pack_last_bits_msb_first():
    vals = np.zeros(64, np.int32)
    vals[0] = 1  # first value -> MSB
    bits = pack_last_bits_msb_first(vals)
    assert bits[0] == np.uint64(1) << np.uint64(63)
    vals = np.zeros(64, np.int32)
    vals[63] = 1
    assert pack_last_bits_msb_first(vals)[0] == 1


def test_bit_sketch_similarity():
    a = BitSketch(np.asarray([0xFFFFFFFFFFFFFFFF], np.uint64))
    b = BitSketch(np.asarray([0x0], np.uint64))
    assert a.get_intersection_count(b) == 0
    assert a.get_intersection_count(a) == 64
    assert a.similarity(b) == 0.0


def test_minhash_bit_sketch_jaccard():
    rng = np.random.default_rng(3)
    s = random_dna(rng, 2000)
    h1 = MinHashBitSketch(s, 12, 8)
    h2 = MinHashBitSketch(mutate(rng, s, 0.05), 12, 8)
    h3 = MinHashBitSketch(random_dna(rng, 2000), 12, 8)
    assert h1.jaccard(h1) == 1.0
    assert h1.jaccard(h2) > 0.3
    assert h1.jaccard(h3) < 0.2


def test_simhash_similarity_ordering():
    rng = np.random.default_rng(4)
    s = random_dna(rng, 400)
    a = SimHash(s, 10, 2)
    b = SimHash(mutate(rng, s, 0.05), 10, 2)
    c = SimHash(random_dna(rng, 400), 10, 2)
    assert a.jaccard(a) == 1.0
    assert a.jaccard(b) > a.jaccard(c)


def test_ngram_hash_expansion_matches_xorshift():
    from mhap_tpu.oracle import sketch as osk

    rng = np.random.default_rng(5)
    s = random_dna(rng, 50)
    h = compute_ngram_hashes(s, 12, 3)
    base = osk.sequence_kmer_hashes_128(s, 12)
    x = osk.xorshift64(base)
    np.testing.assert_array_equal(h[:, 0], x)
    x = osk.xorshift64(x)
    np.testing.assert_array_equal(h[:, 1], x)
    # exact variant differs from xorshift variant
    he = compute_ngram_hashes_exact(s, 12, 2)
    assert not np.array_equal(h[:, :2], he)


def test_bit_similarity_matrix_device():
    rng = np.random.default_rng(6)
    words = rng.integers(0, 2**32, (4, 8), dtype=np.uint32)
    sim = np.asarray(bit_similarity_matrix(words, words))
    assert sim.shape == (4, 4)
    np.testing.assert_allclose(np.diag(sim), 1.0)
    # cross-check one off-diagonal against numpy popcount
    xor = words[0] ^ words[1]
    diff = int(np.unpackbits(xor.view(np.uint8)).sum())
    assert sim[0, 1] == pytest.approx(1.0 - diff / 256)


# ---------------- counters / index / cosine ----------------

def test_countmin_overestimates():
    cm = CountMin(depth=4, width=512, seed=0)
    for i in range(200):
        cm.add(f"item{i % 20}")
    for i in range(20):
        assert cm.get_count(f"item{i}") >= 10
    assert cm.total_added == 200
    cc = ClassicCounter()
    cc.add("x")
    cc.add("x", 4)
    assert cc.get_count("x") == 5 and cc.max_count == 5


def test_bit_vector_index_neighbors():
    rng = np.random.default_rng(7)
    base = random_dna(rng, 1500)
    pairs = [("near", MinHashBitSketch(mutate(rng, base, 0.03), 12, 8))]
    for i in range(10):
        pairs.append((f"far{i}",
                      MinHashBitSketch(random_dna(rng, 1500), 12, 8)))
    ix = BitVectorIndex(pairs, min_similarity=0.7, confidence=0.95)
    got = ix.get_neighbors(MinHashBitSketch(base, 12, 8))
    assert "near" in got
    assert not any(g.startswith("far") for g in got)


def test_cosine_sketch_angle_property():
    rng = np.random.default_rng(8)
    v = rng.standard_normal(64)
    near = v + 0.1 * rng.standard_normal(64)
    far = rng.standard_normal(64)
    a = CosineDistanceSketch(v, 2, seed=1)
    b = CosineDistanceSketch(near, 2, seed=1)
    c = CosineDistanceSketch(far, 2, seed=1)
    assert a.similarity(b) > a.similarity(c)


# ---------------- windowed sub-sketches ----------------

def test_subsketches_overlap_estimate():
    rng = np.random.default_rng(9)
    genome = random_dna(rng, 6000)
    a = genome[:4000]
    b = genome[2000:6000]
    step, words = 500, 8
    sa = MinHashBitSequenceSubSketches(a, 12, step, words)
    sb = MinHashBitSequenceSubSketches(b, 12, step, words)
    al = Aligner(True, -0.52, 0.0, -0.48)  # AlignmentTry-style params
    score, raw, a1, a2, b1, b2 = sa.get_overlap_info(al, sb)
    assert score > 0
    # overlap covers roughly the second half of a / first half of b
    assert a1 >= 1500 and b1 < 1000 and a2 >= 3400
    # round trip
    back = MinHashBitSequenceSubSketches.from_bytes(sa.to_bytes())
    assert len(back.alignment_sketch.elements) == len(sa.alignment_sketch.elements)
    assert back.alignment_sketch.step_size == step
