"""Parity tests for the fused VMEM scorer kernel (ops/scorer_pallas.py)
against the XLA fast pass, in pallas interpret mode on the CPU backend.

Escalation contract: the kernel's needs_slow is a SUPERSET of the XLA
pass's (it escalates every ambiguous run instead of replaying); on
mutually non-escalated lanes every output must be bit-identical.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mhap_tpu.ops import scorer as K
from mhap_tpu.ops.scorer_pallas import (reverse_sketch_rows,
                                        score_pairs_pallas)


def _mk_side(rng, S, nk, hashes):
    m = min(S, max(3, nk))
    h = hashes[:m]
    p = rng.integers(0, nk, m).astype(np.int32)
    order = np.lexsort((p, h))
    oh = np.full(S, 0x7FFFFFFF, np.int32)
    op = np.full(S, 0x7FFFFFFF, np.int32)
    oh[:m] = h[order]
    op[:m] = p[order]
    return oh, op, m


def _gen(rng, S, T, nval_lo, nval_hi, overlap_frac=0.0):
    A = dict(h=[], p=[], m=[], nk=[])
    Bd = dict(h=[], p=[], m=[], nk=[])
    for _ in range(T):
        nk1 = int(rng.integers(10, 3 * S))
        nk2 = int(rng.integers(10, 3 * S))
        nvals = int(rng.integers(nval_lo, nval_hi))
        m1, m2 = min(S, nk1), min(S, nk2)
        if overlap_frac:
            pool = rng.integers(-2**31, 2**31 - 1, m1 + m2,
                                dtype=np.int64).astype(np.int32)
            nsh = int(overlap_frac * min(m1, m2))
            h1 = pool[:m1]
            h2 = np.concatenate([pool[:nsh], pool[m1:m1 + m2 - nsh]])
        else:
            h1 = rng.integers(-nvals, nvals, m1).astype(np.int32)
            h2 = rng.integers(-nvals, nvals, m2).astype(np.int32)
        for side, (h, nk) in ((A, (h1, nk1)), (Bd, (h2, nk2))):
            oh, op, m = _mk_side(rng, S, nk, h)
            side["h"].append(oh)
            side["p"].append(op)
            side["m"].append(m)
            side["nk"].append(nk)
    return ([np.stack(A["h"]), np.stack(A["p"]),
             np.array(A["m"], np.int32), np.array(A["nk"], np.int32)],
            [np.stack(Bd["h"]), np.stack(Bd["p"]),
             np.array(Bd["m"], np.int32), np.array(Bd["nk"], np.int32)])


def _run_both(a, b, S):
    n = 1 << (2 * S - 1).bit_length()
    W = min(512, n)
    fast = K.make_score_pairs_fast(0.2, S, cap=W, jit=False,
                                   scan_bound=8, shared_cap=W)
    ref = {k: np.asarray(v) for k, v in
           jax.jit(fast)(*[jnp.asarray(x) for x in a + b]).items()}
    bhr, bpr = reverse_sketch_rows(b[0], b[1], b[2])
    out = score_pairs_pallas(
        jnp.asarray(a[0]), jnp.asarray(a[1]), jnp.asarray(a[2]),
        jnp.asarray(a[3]), jnp.asarray(np.ascontiguousarray(bhr)),
        jnp.asarray(np.ascontiguousarray(bpr)), jnp.asarray(b[2]),
        jnp.asarray(b[3]), max_shift_mul=K.fixed_point_constant(0.2),
        sketch_size=S, interpret=True)
    return {k: np.asarray(v) for k, v in out.items()}, ref


def _assert_parity(out, ref, min_compared):
    esc = out["needs_slow"]
    ref_ns = ref["needs_slow"].astype(bool)
    cmp_lanes = ~esc & ~ref_ns
    assert int(cmp_lanes.sum()) >= min_compared
    for key in ("ok", "inter", "k", "valid_cnt", "a1", "a2", "b1", "b2"):
        a = out[key][cmp_lanes]
        b = ref[key][cmp_lanes]
        if key == "ok":
            b = b.astype(bool)
        np.testing.assert_array_equal(a, b, err_msg=key)


def test_adversarial_tiny_hash_space():
    """Tiny hash spaces force deep shared runs, shift retries, replays --
    the corner-case generator.  Many lanes escalate; survivors must be
    bit-exact."""
    rng = np.random.default_rng(7)
    a, b = _gen(rng, S=64, T=96, nval_lo=4, nval_hi=60)
    out, ref = _run_both(a, b, 64)
    _assert_parity(out, ref, min_compared=10)


def test_realistic_overlapping_pairs():
    """Wide hash space + 30% shared hashes with a consistent shift: the
    real-data regime; escalation should be rare and parity total."""
    rng = np.random.default_rng(11)
    a, b = _gen(rng, S=128, T=128, nval_lo=2**30, nval_hi=2**31,
                overlap_frac=0.3)
    out, ref = _run_both(a, b, 128)
    assert out["needs_slow"].sum() <= 8
    _assert_parity(out, ref, min_compared=100)


def test_disjoint_pairs_not_ok():
    rng = np.random.default_rng(3)
    a, b = _gen(rng, S=64, T=32, nval_lo=2**30, nval_hi=2**31)
    out, ref = _run_both(a, b, 64)
    _assert_parity(out, ref, min_compared=20)
    assert not out["ok"][~out["needs_slow"]].any()


def test_escalation_superset():
    """Kernel escalation must cover every lane the XLA pass flags (the
    kernel never claims exactness where the scan model breaks)."""
    rng = np.random.default_rng(19)
    a, b = _gen(rng, S=64, T=64, nval_lo=3, nval_hi=30)
    out, ref = _run_both(a, b, 64)
    ref_ns = ref["needs_slow"].astype(bool)
    assert (out["needs_slow"] | ~ref_ns).all()
