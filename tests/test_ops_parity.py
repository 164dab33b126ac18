"""Device-kernel parity vs the bit-exact oracle.

Every JAX op on the overlap path must reproduce the oracle (and therefore
the reference, sketch/MinHashSketch.java + sketch/BottomOverlapSketch.java)
exactly: same int32 sketch values, same (hash,pos) bottom-k entries, same
integer scorer outputs (match counts, UMVU edges, windowed-Jaccard
intersection counts).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from mhap_tpu.oracle import scorer as osc
from mhap_tpu.oracle import sketch as osk
from mhap_tpu.ops import bottomk as kbk
from mhap_tpu.ops import minhash as kmh
from mhap_tpu.ops import murmur3 as km
from mhap_tpu.ops import scorer as ksc
from mhap_tpu.ops import u64


def encode_batch(reads):
    """Pad ASCII reads to a dense [B, L] uint8 batch + per-window valid mask."""
    L = max(len(r) for r in reads)
    B = len(reads)
    seq = np.zeros((B, L), dtype=np.uint8)
    lens = np.zeros(B, dtype=np.int32)
    for i, r in enumerate(reads):
        b = r.encode("ascii")
        seq[i, :len(b)] = np.frombuffer(b, dtype=np.uint8)
        lens[i] = len(b)
    return jnp.asarray(seq), lens


def window_valid(lens, L, k):
    n = L - k + 1
    return jnp.asarray(np.arange(n)[None, :] < (lens[:, None] - k + 1))


def random_reads(rng, count, lo=300, hi=600, alphabet="ACGT"):
    out = []
    arr = np.array(list(alphabet))
    for _ in range(count):
        n = int(rng.integers(lo, hi))
        out.append("".join(arr[rng.integers(0, len(arr), n)]))
    return out


def repeat_reads(rng, count):
    """Reads with tandem repeats -> duplicate k-mer hashes (weight > 1 and
    duplicate-run handling in the stage-2 merge)."""
    arr = np.array(list("ACGT"))
    out = []
    for _ in range(count):
        unit = "".join(arr[rng.integers(0, 4, int(rng.integers(20, 40)))])
        reps = int(rng.integers(3, 8))
        pre = "".join(arr[rng.integers(0, 4, int(rng.integers(50, 150)))])
        post = "".join(arr[rng.integers(0, 4, int(rng.integers(50, 150)))])
        out.append(pre + unit * reps + post)
    return out


@pytest.mark.parametrize("k", [12, 16])
def test_kmer_hashes_device_vs_oracle(k):
    rng = np.random.default_rng(42)
    reads = random_reads(rng, 6, 100, 200, alphabet="ACGTN")
    seq, lens = encode_batch(reads)
    L = seq.shape[1]
    hi, lo = km.kmer_hashes_128(seq, k, 0)
    h32 = km.kmer_hashes_32(seq, k, 0)
    dev128 = (np.asarray(hi, dtype=np.uint64) << np.uint64(32)) | np.asarray(lo, np.uint64)
    dev32 = np.asarray(h32)
    for i, r in enumerate(reads):
        n = len(r) - k + 1
        np.testing.assert_array_equal(
            dev128[i, :n], osk.sequence_kmer_hashes_128(r, k))
        np.testing.assert_array_equal(
            dev32[i, :n].view(np.uint32), osk.sequence_kmer_hashes_32(r, k))


@pytest.mark.parametrize("readgen", ["random", "repeats"])
def test_minhash_device_vs_oracle_tf_mode(readgen):
    """tf mode (pipeline default: repeat_weight=0.9 with no filter file
    -> weight = k-mer occurrence count, MinHashSketch.java:95-128)."""
    rng = np.random.default_rng(7 if readgen == "random" else 8)
    reads = random_reads(rng, 8) if readgen == "random" else repeat_reads(rng, 8)
    k, num_hashes = 16, 64
    seq, lens = encode_batch(reads)
    valid = window_valid(lens, seq.shape[1], k)
    hi, lo = km.kmer_hashes_128(seq, k, 0)

    counts = [max(np.unique(osk.sequence_kmer_hashes_128(r, k),
                            return_counts=True)[1].max(), 1) for r in reads]
    w_max = int(max(counts))
    sketch, n_valid = kmh.minhash_from_hashes(
        hi, lo, valid, num_hashes=num_hashes, w_max=w_max)
    sketch = np.asarray(sketch)
    for i, r in enumerate(reads):
        want = osk.weighted_minhash(osk.sequence_kmer_hashes_128(r, k),
                                    num_hashes, None, 0.9)
        np.testing.assert_array_equal(sketch[i], want, err_msg=f"read {i}")


def test_minhash_device_vs_oracle_legacy_mode():
    """legacy mode (repeat_weight < 0 -> every unique k-mer weight 1)."""
    rng = np.random.default_rng(8)
    reads = repeat_reads(rng, 6)
    k, num_hashes = 16, 64
    seq, lens = encode_batch(reads)
    valid = window_valid(lens, seq.shape[1], k)
    hi, lo = km.kmer_hashes_128(seq, k, 0)
    sketch, _ = kmh.minhash_from_hashes(
        hi, lo, valid, weights_fn=lambda g: jnp.ones_like(g["count"]),
        num_hashes=num_hashes, w_max=1)
    sketch = np.asarray(sketch)
    for i, r in enumerate(reads):
        want = osk.weighted_minhash(osk.sequence_kmer_hashes_128(r, k),
                                    num_hashes, None, -1.0)
        np.testing.assert_array_equal(sketch[i], want, err_msg=f"read {i}")


def test_bottomk_device_vs_oracle():
    rng = np.random.default_rng(9)
    reads = random_reads(rng, 6, 200, 400) + repeat_reads(rng, 2)
    k, S = 12, 128
    seq, lens = encode_batch(reads)
    valid = window_valid(lens, seq.shape[1], k)
    h32 = km.kmer_hashes_32(seq, k, 0)
    out_h, out_p, m = kbk.bottom_sketch(h32, valid, sketch_size=S)
    out_h, out_p, m = np.asarray(out_h), np.asarray(out_p), np.asarray(m)
    for i, r in enumerate(reads):
        want, nk = osk.bottom_sketch(r, k, S)
        assert m[i] == len(want)
        np.testing.assert_array_equal(out_h[i, :m[i]], want[:, 0])
        np.testing.assert_array_equal(out_p[i, :m[i]], want[:, 1])


def _pack_pairs(pairs, k, S):
    """oracle bottom sketches -> device batch arrays."""
    P = len(pairs)
    a_h = np.full((P, S), ksc.PAD_HASH, np.int32)
    a_p = np.full((P, S), np.int32(0x7FFFFFFF), np.int32)
    b_h = a_h.copy()
    b_p = a_p.copy()
    a_m = np.zeros(P, np.int32)
    b_m = np.zeros(P, np.int32)
    a_nk = np.zeros(P, np.int32)
    b_nk = np.zeros(P, np.int32)
    for i, (r1, r2) in enumerate(pairs):
        s1, n1 = osk.bottom_sketch(r1, k, S)
        s2, n2 = osk.bottom_sketch(r2, k, S)
        a_h[i, :len(s1)] = s1[:, 0]
        a_p[i, :len(s1)] = s1[:, 1]
        b_h[i, :len(s2)] = s2[:, 0]
        b_p[i, :len(s2)] = s2[:, 1]
        a_m[i], b_m[i] = len(s1), len(s2)
        a_nk[i], b_nk[i] = n1, n2
    return tuple(jnp.asarray(x) for x in
                 (a_h, a_p, a_m, a_nk, b_h, b_p, b_m, b_nk))


def _mutate(rng, s, err=0.12):
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


def test_scorer_device_vs_oracle():
    rng = np.random.default_rng(11)
    k, S = 12, 256
    genome = random_reads(rng, 1, 4000, 4001)[0]
    pairs = []
    # overlapping noisy pairs (varying overlap), identical, unrelated, repeats
    for ov in (2000, 1200, 600, 300):
        p1 = int(rng.integers(0, 1500))
        r1 = _mutate(rng, genome[p1:p1 + 2000])
        r2 = _mutate(rng, genome[p1 + 2000 - ov:p1 + 4000 - ov])
        pairs.append((r1, r2))
    same = random_reads(rng, 1, 1500, 1501)[0]
    pairs.append((same, same))
    pairs.append((random_reads(rng, 1, 1500, 1501)[0],
                  random_reads(rng, 1, 1500, 1501)[0]))
    reps = repeat_reads(rng, 4)
    pairs.append((reps[0] + reps[1], reps[0] + reps[2]))
    pairs.append((reps[2], reps[2] + reps[3]))

    score_fn = ksc.make_score_pairs(0.2, S)
    args = _pack_pairs(pairs, k, S)
    out = {kk: np.asarray(v) for kk, v in score_fn(*args).items()}

    for i, (r1, r2) in enumerate(pairs):
        s1, n1 = osk.bottom_sketch(r1, k, S)
        s2, n2 = osk.bottom_sketch(r2, k, S)
        want = osc.get_overlap_info(s1, n1, s2, n2, k, 0.2)
        w_score, w_raw, wa1, wa2, wb1, wb2 = want
        if not out["ok"][i]:
            assert want == osc.EMPTY, f"pair {i}: device rejected, oracle {want}"
            continue
        assert want != osc.EMPTY, f"pair {i}: device accepted, oracle EMPTY"
        assert (out["a1"][i], out["a2"][i], out["b1"][i], out["b2"][i]) == \
            (wa1, wa2, wb1, wb2), f"pair {i} edges"
        assert out["valid_cnt"][i] == int(w_raw), f"pair {i} rawScore"
        j = out["inter"][i] / out["k"][i] if out["k"][i] > 0 else 0.0
        got_score = osc.jaccard_to_identity(float(j), k)
        assert got_score == pytest.approx(w_score, abs=0, rel=0) or \
            got_score == w_score, f"pair {i} score {got_score} != {w_score}"


def test_scorer_fuzz_short_pairs():
    """Fuzz many short pairs through the device scorer vs the oracle."""
    rng = np.random.default_rng(13)
    k, S = 12, 128
    score_fn = ksc.make_score_pairs(0.2, S)
    genome = random_reads(rng, 1, 3000, 3001)[0]
    pairs = []
    for _ in range(24):
        a = int(rng.integers(0, 2000))
        b = int(rng.integers(max(0, a - 400), min(2400, a + 400)))
        ln1 = int(rng.integers(300, 600))
        ln2 = int(rng.integers(300, 600))
        pairs.append((_mutate(rng, genome[a:a + ln1]),
                      _mutate(rng, genome[b:b + ln2])))
    args = _pack_pairs(pairs, k, S)
    out = {kk: np.asarray(v) for kk, v in score_fn(*args).items()}
    for i, (r1, r2) in enumerate(pairs):
        s1, n1 = osk.bottom_sketch(r1, k, S)
        s2, n2 = osk.bottom_sketch(r2, k, S)
        want = osc.get_overlap_info(s1, n1, s2, n2, k, 0.2)
        if not out["ok"][i]:
            assert want == osc.EMPTY, f"pair {i}"
            continue
        assert (out["a1"][i], out["a2"][i], out["b1"][i], out["b2"][i]) == \
            want[2:], f"pair {i} edges"
        assert out["valid_cnt"][i] == int(want[1])
        j = out["inter"][i] / out["k"][i] if out["k"][i] > 0 else 0.0
        assert osc.jaccard_to_identity(float(j), k) == want[0], f"pair {i}"


def test_fast_scorer_matches_automaton():
    """Vectorized fast pass == sequential automaton on unflagged lanes;
    flagged lanes exist and are correctly detected (repeat-heavy pairs)."""
    rng = np.random.default_rng(19)
    k, S = 12, 256
    genome = random_reads(rng, 1, 5000, 5001)[0]
    pairs = []
    for _ in range(12):
        a = int(rng.integers(0, 3000))
        b = int(rng.integers(max(0, a - 600), min(3500, a + 600)))
        pairs.append((_mutate(rng, genome[a:a + 1200]),
                      _mutate(rng, genome[b:b + 1200])))
    reps = repeat_reads(rng, 6)
    pairs.append((reps[0] + reps[1] + reps[0], reps[0] + reps[2]))
    pairs.append((reps[3] * 2 + reps[4], reps[4] + reps[3]))

    fast = ksc.make_score_pairs_fast(0.2, S, scan_bound=None)
    slow = ksc.make_score_pairs(0.2, S)
    args = _pack_pairs(pairs, k, S)
    fo = {kk: np.asarray(v) for kk, v in fast(*args).items()}
    so = {kk: np.asarray(v) for kk, v in slow(*args).items()}
    for i in range(len(pairs)):
        if fo["needs_slow"][i]:
            continue  # fast path defers; pipeline re-runs the automaton
        for key in ("ok", "inter", "k", "valid_cnt", "a1", "a2", "b1", "b2"):
            assert fo[key][i] == so[key][i], f"pair {i} field {key}"

    # bounded-scan variant (the production default): identical on lanes it
    # does not flag, and needs_slow is a superset of the unbounded flags
    bounded = ksc.make_score_pairs_fast(0.2, S, scan_bound=8)
    bo = {kk: np.asarray(v) for kk, v in bounded(*args).items()}
    for i in range(len(pairs)):
        if bo["needs_slow"][i]:
            assert True  # deferred lanes re-run the automaton by contract
            continue
        assert not fo["needs_slow"][i]
        for key in ("ok", "inter", "k", "valid_cnt", "a1", "a2", "b1", "b2"):
            assert bo[key][i] == fo[key][i], f"bounded pair {i} field {key}"


def test_fast_scorer_scan_bound_long_run_flag():
    """Lanes with a hash run longer than scan_bound MUST be flagged
    needs_slow (the bounded scans would silently truncate the run
    aggregate otherwise); short-run lanes must not be flagged for the
    run-length reason alone."""
    S = 64
    bound = 8
    bounded = ksc.make_score_pairs_fast(0.2, S, scan_bound=bound, jit=False)

    def mk(hashes_a, hashes_b):
        def side(hs):
            m = len(hs)
            h = np.full(S, ksc.PAD_HASH, np.int32)
            p = np.full(S, np.int32(0x7FFFFFFF), np.int32)
            order = np.argsort(hs, kind="stable")
            h[:m] = np.asarray(hs, np.int32)[order]
            p[:m] = np.arange(m, dtype=np.int32)[order]
            return h, p, np.int32(m)
        a_h, a_p, a_m = side(hashes_a)
        b_h, b_p, b_m = side(hashes_b)
        args = (a_h[None], a_p[None], np.asarray([a_m]),
                np.asarray([a_m + 10], np.int32),
                b_h[None], b_p[None], np.asarray([b_m]),
                np.asarray([b_m + 10], np.int32))
        return tuple(jnp.asarray(x) for x in args)

    # run of length 9 (5 + 4 across the two sides) > bound=8 -> flagged
    long_a = [77] * 5 + list(range(100, 120))
    long_b = [77] * 4 + list(range(200, 220))
    out = bounded(*mk(long_a, long_b))
    assert bool(np.asarray(out["needs_slow"])[0])

    # run of length exactly 8 -> covered by the bound, not flagged
    ok_a = [77] * 4 + list(range(100, 120))
    ok_b = [77] * 4 + list(range(200, 220))
    out2 = bounded(*mk(ok_a, ok_b))
    unbounded = ksc.make_score_pairs_fast(0.2, S, scan_bound=None, jit=False)
    out2u = unbounded(*mk(ok_a, ok_b))
    assert (bool(np.asarray(out2["needs_slow"])[0])
            == bool(np.asarray(out2u["needs_slow"])[0]))
    if not np.asarray(out2["needs_slow"])[0]:
        for key in ("ok", "inter", "k", "valid_cnt", "a1", "a2", "b1", "b2"):
            assert np.asarray(out2[key])[0] == np.asarray(out2u[key])[0]


def test_fast_scorer_pipeline_end_to_end(synthetic_reads):
    """The two-phase dispatcher output equals the oracle (covers flagged
    lanes being re-run through the automaton)."""
    from mhap_tpu.oracle import pipeline as op
    from mhap_tpu.pipeline.overlapper import TpuOverlapper

    genome, reads, positions = synthetic_reads
    cfg = dict(num_hashes=128, ordered_sketch_size=512, num_min_matches=2)
    # add repeat-rich reads to exercise the slow path
    rng = np.random.default_rng(23)
    reps = repeat_reads(rng, 4)
    mixed = reads[:8] + [reps[0] + reps[1] + reps[0] + reps[2],
                         reps[2] + reps[0] + reps[1]]
    want = op.overlap_self(mixed, cfg)
    got = TpuOverlapper(cfg, pair_chunk=64).overlap_self(mixed)
    assert got == want


def test_seg_suffix_scan_vs_numpy():
    rng = np.random.default_rng(29)
    n = 257
    vals = rng.integers(0, 1000, n).astype(np.int32)
    run_last = rng.random(n) < 0.2
    run_last[-1] = True
    out = ksc.seg_suffix_scan(
        {"s": (jnp.asarray(vals), "sum"),
         "mn": (jnp.asarray(vals), "min"),
         "mx": (jnp.asarray(vals), "max")}, jnp.asarray(run_last))
    s, mn, mx = (np.asarray(out[k]) for k in ("s", "mn", "mx"))
    # reference: for each e, reduce until (and including) next run_last
    ends = np.nonzero(run_last)[0]
    for e in range(n):
        end = ends[np.searchsorted(ends, e)]
        seg = vals[e:end + 1]
        assert s[e] == seg.sum(), e
        assert mn[e] == seg.min(), e
        assert mx[e] == seg.max(), e


def test_xorshift_u64_parity():
    rng = np.random.default_rng(17)
    vals = rng.integers(0, 2**64, 256, dtype=np.uint64)
    hi = jnp.asarray((vals >> np.uint64(32)).astype(np.uint32))
    lo = jnp.asarray((vals & np.uint64(0xFFFFFFFF)).astype(np.uint32))
    got = u64.to_numpy(u64.xorshift((hi, lo)))
    np.testing.assert_array_equal(got, osk.xorshift64(vals))


def test_master_structure_merge_vs_sort():
    """The bitonic-merge master structure must equal the 4-key-sort
    formulation on every field reals can influence, for adversarial
    inputs: duplicate hashes within and across sides, hashes equal to the
    PAD sentinel, empty sides, non-power-of-two sketch widths."""
    rng = np.random.default_rng(99)
    for S in (8, 12, 96, 1536):
        for trial in range(12):
            # small hash alphabet -> heavy duplicate runs; sprinkle the
            # 0x7FFFFFFF sentinel as a REAL hash value
            m1 = int(rng.integers(0, S + 1))
            m2 = int(rng.integers(0, S + 1))
            if trial == 0:
                m1, m2 = S, S
            if trial == 1:
                m1 = 0

            def mk(m):
                h = rng.integers(-5, 5, m).astype(np.int32)
                h[rng.random(m) < 0.05] = 0x7FFFFFFF
                p = rng.integers(0, 50, m).astype(np.int32)
                order = np.lexsort((p, h))
                hh = np.full(S, 0x7FFFFFFF, np.int32)
                pp = np.full(S, 0x7FFFFFFF, np.int32)
                hh[:m] = h[order]
                pp[:m] = p[order]
                return hh, pp

            a_h, a_p = mk(m1)
            b_h, b_p = mk(m2)
            args = (jnp.asarray(a_h), jnp.asarray(a_p), jnp.int32(m1),
                    jnp.asarray(b_h), jnp.asarray(b_p), jnp.int32(m2))
            ref = {k: np.asarray(v) for k, v in
                   ksc._sorted_pair_structure_sort(*args).items()}
            got = {k: np.asarray(v) for k, v in
                   ksc._sorted_pair_structure_merge(*args).items()}
            real = ref["real"]
            np.testing.assert_array_equal(got["real"], real, err_msg=f"{S}")
            for f in ("h", "p", "tag", "first", "last"):
                np.testing.assert_array_equal(
                    got[f][real], ref[f][real], err_msg=f"{S}/{f}")
            # pads must contribute nothing: first/last false there
            assert not got["first"][~real].any()
            assert not got["last"][~real].any()
