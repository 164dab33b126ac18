"""Device batched Smith-Waterman vs the native exact implementation."""

import numpy as np
import pytest

from mhap_tpu.ops.swalign import sw_align_batch
from mhap_tpu.utils import native


def random_dna(rng, n):
    return bytes(np.frombuffer(b"ACGT", np.uint8)[rng.integers(0, 4, n)])


def mutate(rng, s, err=0.1):
    bases = np.frombuffer(b"ACGT", np.uint8)
    out = bytearray()
    for ch in s:
        x = rng.random()
        if x < err / 3:
            out.append(ch)
            out.append(bases[rng.integers(0, 4)])
        elif x < 2 * err / 3:
            pass
        elif x < err:
            out.append(bases[rng.integers(0, 4)])
        else:
            out.append(ch)
    return bytes(out)


def pack(pairs):
    n = max(len(a) for a, _ in pairs)
    m = max(len(b) for _, b in pairs)
    P = len(pairs)
    q = np.zeros((P, n), np.uint8)
    r = np.zeros((P, m), np.uint8)
    ql = np.zeros(P, np.int32)
    rl = np.zeros(P, np.int32)
    for i, (a, b) in enumerate(pairs):
        q[i, :len(a)] = np.frombuffer(a, np.uint8)
        r[i, :len(b)] = np.frombuffer(b, np.uint8)
        ql[i], rl[i] = len(a), len(b)
    return q, ql, r, rl


def test_sw_batch_vs_native():
    rng = np.random.default_rng(31)
    genome = random_dna(rng, 3000)
    pairs = []
    for _ in range(6):
        a = int(rng.integers(0, 2000))
        b = int(rng.integers(max(0, a - 300), a + 300))
        la = int(rng.integers(200, 500))
        lb = int(rng.integers(200, 500))
        pairs.append((mutate(rng, genome[a:a + la]),
                      mutate(rng, genome[b:b + lb])))
    pairs.append((genome[:300], genome[:300]))           # identical
    pairs.append((random_dna(rng, 300), random_dna(rng, 300)))  # unrelated

    out = {k: np.asarray(v) for k, v in
           sw_align_batch(*map(np.asarray, pack(pairs))).items()}
    for i, (a, b) in enumerate(pairs):
        want = native.sw_align(a, b)
        assert out["score"][i] == want["score"], f"pair {i} score"
        assert out["q_end"][i] == want["q_end"], f"pair {i} q_end"
        assert out["r_end"][i] == want["r_end"], f"pair {i} r_end"
        # begins can differ only between co-optimal paths; allow slack
        assert abs(out["q_begin"][i] - want["q_begin"]) <= 2, f"pair {i}"
        assert abs(out["r_begin"][i] - want["r_begin"]) <= 2, f"pair {i}"
        # identity from carried stats: equal on the traceback tie-rule,
        # tolerance for co-optimal paths
        got_id = 1 - out["errors"][i] / max(out["length"][i], 1)
        assert got_id == pytest.approx(want["identity"], abs=0.02), f"pair {i}"


def test_sw_batch_identical_perfect():
    s = b"ACGTACGTACGTACGTACGT"
    q, ql, r, rl = pack([(s, s)])
    out = {k: int(np.asarray(v)[0]) for k, v in
           sw_align_batch(q, ql, r, rl).items()}
    assert out["score"] == 2 * len(s)
    assert out["matches"] == len(s)
    assert out["errors"] == 0
    assert out["q_end"] == len(s) - 1 and out["r_end"] == len(s) - 1
