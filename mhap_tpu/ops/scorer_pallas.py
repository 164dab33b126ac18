"""Fully-fused Pallas TPU scorer: the whole stage-2 fast pass in VMEM.

The XLA fast-pass scorer (ops/scorer.make_score_pairs_fast; reference
automaton sketch/BottomOverlapSketch.java:397-516) spends ~200KB of HBM
traffic per lane across its lax.sorts and scans; on the bench chip the
effective HBM bandwidth (~15GB/s measured) makes that the stage's wall.
This kernel runs the ENTIRE per-pair computation VMEM-resident -- one
read of the two sketches (24KB/lane), one 512B/lane result write:

  bitonic MERGE of the two pre-sorted (hash,pos) lists (the reference's
    construction invariant makes a 12-stage merge sufficient; the XLA
    path needs a full sort network)
  -> run flags + shared-run classification (run-bounded roll scans)
  -> stable compaction of shared entries to [W] via LSB-first butterfly
     routing (monotone displacements are collision-free; validated in
     tests against compact-by-sort)
  -> pass-1 shifts (segmented scans) -> median (in-VMEM bitonic sort)
  -> pass-2 windowed records -> record compaction (butterfly routing)
  -> optimizeShifts (segmented run-min) -> edges (UMVU integer math)
  -> windowed jaccard on the full merged structure.

Lanes the scan model cannot reproduce bit-exactly (ambiguous shift
retries, >max_span hash runs, >W shared entries, huge reads) raise
``escal`` and are re-scored by the XLA fast pass (which replays those
cases in-program) or the exact automaton -- identical to the existing
escalation contract, so results stay bit-identical to the oracle.

The b-side inputs arrive with REVERSED rows (entry j = slot S-1-j):
Mosaic has no `rev`, and the bitonic merge wants b descending anyway;
the store precomputes reversed ordered-sketch columns once.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os

# vreg-aligned lane rotations as slice-concats instead of pltpu.roll
# (off until measured faster on the chip; MHAP_SCORER_SLICE_ROLL=1 to A/B)
_SLICE_ROLL = os.environ.get("MHAP_SCORER_SLICE_ROLL", "0") == "1"

I32 = jnp.int32
U32 = jnp.uint32
_IMAX = np.int32(0x7FFFFFFF)
_IMIN = np.int32(-0x80000000)
_NEG = np.int32(-0x7FFFFFFF - 1)

OUT_COLS = 16
# output column layout
(C_OK, C_INTER, C_K, C_VCNT, C_A1, C_A2, C_B1, C_B2, C_ESCAL,
 C_CNT1, C_CNT2, C_CNT3, C_NSH) = range(13)

# reads with more k-mers than this escalate (bit-packing guards in the
# optimize run-min key assume positions < 2^20; real long reads stream
# through the windowed sketcher far below this)
NK_LIMIT = 1 << 20


_M16 = np.uint32(0xFFFF)
_S16 = np.uint32(16)


def _mul32_full_np(a, b_const: int):
    """32x32 -> 64 unsigned multiply against a COMPILE-TIME constant,
    numpy-scalar constants only (jnp scalars would be captured tracers
    in a pallas kernel body)."""
    a0 = a & _M16
    a1 = a >> _S16
    b0 = np.uint32(b_const & 0xFFFF)
    b1 = np.uint32((b_const >> 16) & 0xFFFF)
    ll = a0 * b0
    m1 = a0 * b1
    m2 = a1 * b0
    hh = a1 * b1
    t = (ll >> _S16) + (m1 & _M16) + (m2 & _M16)
    lo = (t << _S16) | (ll & _M16)
    hi = hh + (m1 >> _S16) + (m2 >> _S16) + (t >> _S16)
    return hi, lo


def _floor_mul_k(ov, m: int, s: int):
    """floor(ov * m / 2**s) for uint32 ov -- Mosaic-safe variant of
    ops/scorer._floor_mul (sign-flipped compare for the carry)."""
    ov = ov.astype(U32)
    h0, l0 = _mul32_full_np(ov, m & 0xFFFFFFFF)
    m1_int = (m >> 32) & 0xFFFFFFFF
    if m1_int:
        h1, l1 = _mul32_full_np(ov, m1_int)
    else:
        h1 = l1 = jnp.zeros_like(ov)
    t = h0 + l1
    carry = ((t.astype(I32) ^ _NEG) < (h0.astype(I32) ^ _NEG)).astype(U32)
    L0, L1, L2 = l0, t, h1 + carry
    if s == 0:
        r = L0
    elif s < 32:
        r = (L0 >> np.uint32(s)) | (L1 << np.uint32(32 - s))
    elif s == 32:
        r = L1
    elif s < 64:
        r = (L1 >> np.uint32(s - 32)) | (L2 << np.uint32(64 - s))
    elif s == 64:
        r = L2
    elif s < 96:
        r = L2 >> np.uint32(s - 64)
    else:
        r = jnp.zeros_like(ov)
    return r.astype(I32)


def _make_kernel(S: int, n: int, W: int, max_span: int, m_c: int, s_c: int,
                 BT: int):
    half = n // 2
    midw = half - S

    def kernel(ah_ref, ap_ref, bhr_ref, bpr_ref, scal_ref, out_ref):
        lane4 = jax.lax.broadcasted_iota(I32, (BT, n), 1)
        laneS = jax.lax.broadcasted_iota(I32, (BT, S), 1)
        laneW = jax.lax.broadcasted_iota(I32, (BT, W), 1)
        m1 = scal_ref[:, 0:1]
        m2 = scal_ref[:, 1:2]
        nk1 = scal_ref[:, 2:3]
        nk2 = scal_ref[:, 3:4]

        def _rot(x, left_by: int, width: int):
            """Lane rotation.  For vreg-aligned distances (multiples of
            the 128-lane vector width) a concat of two lane slices is
            pure vreg moves -- measured vs pltpu.roll via
            MHAP_SCORER_SLICE_ROLL (scripts/bench_scorer_stages.py);
            sub-vreg distances keep the roll primitive."""
            if (_SLICE_ROLL and left_by % 128 == 0 and width % 128 == 0
                    and 0 < left_by < width):
                return jnp.concatenate(
                    [x[:, left_by:], x[:, :left_by]], axis=1)
            return pltpu.roll(x, width - left_by, 1)

        def rollL(x, d, width):
            # Mosaic cannot rotate i1 vectors: round-trip bools via i32
            if x.dtype == jnp.bool_:
                return _rot(x.astype(I32), d, width) != 0
            return _rot(x, d, width)

        def rollR(x, d):
            width = x.shape[1]
            if x.dtype == jnp.bool_:
                return _rot(x.astype(I32), width - d, width) != 0
            return _rot(x, width - d, width)

        # ---- 1. packed 2-limb keys; bitonic arrangement ----
        pad_a = laneS >= m1
        k0a = jnp.where(pad_a, _IMAX, ah_ref[:])
        k1a = jnp.where(pad_a, _IMAX, ap_ref[:] ^ _IMIN)  # tag 0
        pad_b = laneS < (S - m2)
        k0b = jnp.where(pad_b, _IMAX, bhr_ref[:])
        k1b = jnp.where(pad_b, _IMAX, bpr_ref[:])         # tag 1
        mid = jnp.full((BT, midw), _IMAX, I32)
        v0 = jnp.concatenate([k0a, mid, mid, k0b], axis=1)
        v1 = jnp.concatenate([k1a, mid, mid, k1b], axis=1)

        # ---- 2. bitonic merge: log2(n) compare-exchange stages ----
        d = half
        while d >= 1:
            keep_lower = (lane4 & d) == 0
            p0l, p0h = rollR(v0, d), rollL(v0, d, n)
            p1l, p1h = rollR(v1, d), rollL(v1, d, n)
            q0 = jnp.where(keep_lower, p0h, p0l)
            q1 = jnp.where(keep_lower, p1h, p1l)
            less = (q0 < v0) | ((q0 == v0) & (q1 < v1))
            eq = (q0 == v0) & (q1 == v1)
            take = (keep_lower & less) | (~keep_lower & ~less & ~eq)
            v0 = jnp.where(take, q0, v0)
            v1 = jnp.where(take, q1, v1)
            d //= 2

        # ---- 3. structure flags ----
        real = ~((v0 == _IMAX) & (v1 == _IMAX))
        h = v0
        tag1 = v1 >= 0  # meaningful only at real entries
        p = v1 & _IMAX
        prev_h = rollR(h, 1)
        prev_real = rollR(real, 1)
        first = real & ((lane4 == 0) | (prev_h != h) | ~prev_real)
        next_h = rollL(h, 1, n)
        next_real = rollL(real, 1, n) & (lane4 < n - 1)
        last = real & ((next_h != h) | ~next_real)

        # runs longer than max_span break the bounded scans: exact flag
        hs = rollL(h, max_span, n)
        rs = rollL(real, max_span, n) & (lane4 < n - max_span)
        long_run = jnp.sum(
            (real & rs & (h == hs)).astype(I32), axis=1, keepdims=True) > 0

        def seg_suffix(leaves, f0, width, limit):
            """Bounded backward segmented scans (mirror of
            ops/scorer.seg_suffix_scan with rolls)."""
            vals = [v for v, _ in leaves]
            ops = [o for _, o in leaves]
            lane = jax.lax.broadcasted_iota(I32, (BT, width), 1)
            f = f0
            d = 1
            while d < limit:
                over = lane >= width - d
                fs = (rollL(f, d, width) & ~over) | over
                nv = []
                for v, op in zip(vals, ops):
                    vs = rollL(v, d, width)
                    if op == "sum":
                        vs = jnp.where(over, 0, vs)
                        m = v + vs
                    elif op == "min":
                        vs = jnp.where(over, _IMAX, vs)
                        m = jnp.minimum(v, vs)
                    else:
                        vs = jnp.where(over, _IMIN, vs)
                        m = jnp.maximum(v, vs)
                    nv.append(jnp.where(f, v, m))
                vals = nv
                f = f | fs
                d *= 2
            return vals

        # ---- 4. shared-run classification ----
        one4 = jnp.ones((BT, n), I32)
        zero4 = jnp.zeros((BT, n), I32)
        c1r, c2r = seg_suffix(
            [(jnp.where(real & ~tag1, one4, zero4), "sum"),
             (jnp.where(real & tag1, one4, zero4), "sum")],
            last, n, max_span)
        shared = first & (c1r > 0) & (c2r > 0)
        d = 1
        while d < max_span:
            shared = shared | (rollR(shared, d) & (rollR(h, d) == h)
                               & real & rollR(real, d) & (lane4 >= d))
            d *= 2
        shared = shared & real
        n_shared = jnp.sum(shared.astype(I32), axis=1, keepdims=True)
        shared_over = n_shared > W

        # ---- 5. rank + butterfly compaction to [W] ----
        def cumsum_incl(x, width):
            lane = jax.lax.broadcasted_iota(I32, (BT, width), 1)
            s = x
            d = 1
            while d < width:
                s = s + jnp.where(lane >= d, rollR(s, d), 0)
                d *= 2
            return s

        def route(arrays, keep, width):
            """Stable compaction: element i with keep -> rank(i).
            LSB-first butterfly routing; monotone displacements are
            collision-free."""
            lane = jax.lax.broadcasted_iota(I32, (BT, width), 1)
            kk = keep.astype(I32)
            rank_x = cumsum_incl(kk, width) - kk
            rem = jnp.where(keep, lane - rank_x, 0)
            valid = keep
            arrs = list(arrays)
            b = 1
            while b < width:
                mv = valid & ((rem & b) != 0)
                came = rollL(mv, b, width) & (lane < width - b)
                arrs = [jnp.where(came, rollL(a, b, width), a)
                        for a in arrs]
                rem = jnp.where(came, rollL(rem, b, width) - b, rem)
                valid = came | (valid & ~mv)
                b *= 2
            return arrs

        h2f, pt2f = route((h, v1), shared, n)
        h2 = h2f[:, :W]
        pt2 = pt2f[:, :W]

        real2 = laneW < n_shared
        t1 = real2 & (pt2 >= 0)
        t0 = real2 & (pt2 < 0)
        p2 = pt2 & _IMAX
        first2 = real2 & ((laneW == 0) | (rollR(h2, 1) != h2)
                          | ~rollR(real2, 1))
        last2 = real2 & ((rollL(h2, 1, W) != h2)
                         | ~(rollL(real2, 1, W) & (laneW < W - 1)))

        oneW = jnp.ones((BT, W), I32)
        zeroW = jnp.zeros((BT, W), I32)

        def fast_pass(okv, median, abs_max, pass1):
            leaves = seg_suffix(
                [(jnp.where(okv & t0, oneW, zeroW), "sum"),
                 (jnp.where(okv & t1, oneW, zeroW), "sum"),
                 (jnp.where(okv & t0, p2, _IMAX), "min"),
                 (jnp.where(okv & t1, p2, _IMAX), "min"),
                 (jnp.where(okv & t0, p2, _IMIN), "max"),
                 (jnp.where(okv & t1, p2, _IMIN), "max")],
                last2, W, max_span)
            c1, c2, fp1, fp2, lp1, lp2 = leaves
            valid_run = first2 & (c1 > 0) & (c2 > 0)
            if pass1:
                amb = jnp.zeros((BT, W), bool)
                rec_first = valid_run
            else:
                shift = fp2 - fp1
                diff = shift - median
                sf_hi = diff > abs_max
                sf_lo = diff < -abs_max
                amb = valid_run & ((sf_hi & (c1 > 1)) | (sf_lo & (c2 > 1)))
                rec_first = valid_run & ~sf_hi & ~sf_lo & ~amb
            moved = (lp1 != fp1) | (lp2 != fp2)
            rec_last = rec_first & moved
            rc = rec_first.astype(I32) + rec_last.astype(I32)
            cnt = jnp.sum(rc, axis=1, keepdims=True)
            rl_s = rollR(rec_last, 1) & (laneW > 0)
            return dict(rec_first=rec_first, rl_s=rl_s, cnt=cnt, amb=amb,
                        fp1=fp1, fp2=fp2, lp1=lp1, lp2=lp2)

        def sort_asc(x, width):
            """Full bitonic sort (single i32 array, ascending)."""
            lane = jax.lax.broadcasted_iota(I32, (BT, width), 1)
            k = 2
            while k <= width:
                asc = (lane & k) == 0
                d = k // 2
                while d >= 1:
                    # partner side is set by bit d of the index; the
                    # keep-direction by the block's sort direction
                    lower_pos = (lane & d) == 0
                    ql = rollR(x, d)
                    qh = rollL(x, d, width)
                    q = jnp.where(lower_pos, qh, ql)
                    keep_small = (asc & lower_pos) | (~asc & ~lower_pos)
                    less = q < x
                    take = (keep_small & less) \
                        | (~keep_small & ~less & ~(q == x))
                    x = jnp.where(take, q, x)
                    d //= 2
                k *= 2
            return x

        def select_at(x, idx, width):
            lane = jax.lax.broadcasted_iota(I32, (BT, width), 1)
            return jnp.sum(jnp.where(lane == idx, x, 0), axis=1,
                           keepdims=True)

        def median_of(shifts, cnt, width):
            s = sort_asc(shifts, width)
            idx = jnp.clip(cnt // 2, 0, width - 1)
            return select_at(s, idx, width)

        def shift_stats(shifts, cnt, width):
            median = median_of(shifts, cnt, width)
            left = jnp.maximum(0, -median)
            right = jnp.minimum(nk1, nk2 - median)
            overlap = jnp.maximum(10, right - left)
            abs_max = jnp.minimum(jnp.maximum(nk1, nk2),
                                  _floor_mul_k(overlap, m_c, s_c))
            return median, abs_max

        # ---- 6. pass 1 (shifts only) ----
        f1 = fast_pass(real2, None, None, True)
        cnt1 = f1["cnt"]
        shifts1 = jnp.where(f1["rec_first"], f1["fp2"] - f1["fp1"], _IMAX)
        shifts1 = jnp.where(f1["rl_s"],
                            rollR(f1["lp2"] - f1["lp1"], 1), shifts1)
        median1, abs_max1 = shift_stats(shifts1, cnt1, W)

        v1l = jnp.maximum(0, -median1 - abs_max1)
        v1u = jnp.minimum(nk1, nk2 - median1 + abs_max1)
        v2l = jnp.maximum(0, median1 - abs_max1)
        v2u = jnp.minimum(nk2, nk1 + median1 + abs_max1)

        # ---- 7. pass 2 (windowed records) ----
        # logical ops, not jnp.where: Mosaic cannot lower i1-valued where
        okv2 = real2 & ((t0 & (p2 >= v1l) & (p2 < v1u))
                        | (~t0 & (p2 >= v2l) & (p2 < v2u)))
        f2 = fast_pass(okv2, median1, abs_max1, False)
        cnt2 = f2["cnt"]
        amb_any = jnp.sum(f2["amb"].astype(I32), axis=1, keepdims=True) > 0

        rec_v1 = jnp.where(f2["rec_first"], f2["fp1"], _IMAX)
        rec_v1 = jnp.where(f2["rl_s"], rollR(f2["lp1"], 1), rec_v1)
        rec_v2 = jnp.where(f2["rec_first"], f2["fp2"], _IMAX)
        rec_v2 = jnp.where(f2["rl_s"], rollR(f2["lp2"], 1), rec_v2)
        valid_rec = f2["rec_first"] | f2["rl_s"]
        p1b, p2b = route((rec_v1, rec_v2), valid_rec, W)
        in_cnt = laneW < cnt2
        p1b = jnp.where(in_cnt, p1b, _IMAX)
        p2b = jnp.where(in_cnt, p2b, _IMAX)

        # ---- 8. optimizeShifts: per adjacent-equal-p1 run keep the
        # record with min (|shift - median2|, index) ----
        shifts2 = jnp.where(in_cnt, p2b - p1b, _IMAX)
        median2 = median_of(shifts2, cnt2, W)
        key = jnp.where(in_cnt, jnp.abs(shifts2 - median2), _IMAX)
        prev_same = (rollR(p1b, 1) == p1b) & in_cnt & (laneW > 0) \
            & rollR(in_cnt, 1)
        new_run = in_cnt & ~prev_same
        run_id = cumsum_incl(new_run.astype(I32), W)  # 1-based run ids
        run_id = jnp.where(in_cnt, run_id, -laneW - 1)  # distinct sentinels
        run_last2 = in_cnt & ~((rollL(p1b, 1, W) == p1b)
                               & rollL(in_cnt, 1, W) & (laneW < W - 1))
        pack = jnp.where(in_cnt, key * W + laneW, _IMAX)
        (run_min,) = seg_suffix([(pack, "min")], run_last2, W, W)
        # broadcast the rep's run-min forward along the run
        bc = jnp.where(new_run, run_min, _IMAX)
        d = 1
        while d < W:
            same = (rollR(run_id, d) == run_id) & (laneW >= d)
            bc = jnp.where(same, jnp.minimum(bc, rollR(bc, d)), bc)
            d *= 2
        keep = in_cnt & (pack == bc)
        cnt3 = jnp.sum(keep.astype(I32), axis=1, keepdims=True)

        # ---- 9. edges ----
        shifts3 = jnp.where(keep, p2b - p1b, _IMAX)
        median3, abs_max3 = shift_stats(shifts3, cnt3, W)
        validr = keep & (jnp.abs((p2b - p1b) - median3) <= abs_max3)
        nrec = jnp.sum(validr.astype(I32), axis=1, keepdims=True)
        l1 = jnp.min(jnp.where(validr, p1b, _IMAX), axis=1, keepdims=True)
        l2 = jnp.min(jnp.where(validr, p2b, _IMAX), axis=1, keepdims=True)
        r1 = jnp.max(jnp.where(validr, p1b, -_IMAX), axis=1, keepdims=True)
        r2 = jnp.max(jnp.where(validr, p2b, -_IMAX), axis=1, keepdims=True)
        den = jnp.maximum(nrec - 1, 1)

        def umvu(lo, hi_):
            num = nrec * lo - hi_
            q0 = jnp.floor_divide(num, den)
            rem_ = num - q0 * den
            return q0 + (2 * rem_ >= den).astype(I32)

        a1 = jnp.maximum(0, umvu(l1, r1))
        a2 = jnp.minimum(nk1, umvu(r1, l1))
        b1 = jnp.maximum(0, umvu(l2, r2))
        b2 = jnp.minimum(nk2, umvu(r2, l2))

        # ---- 10. windowed jaccard on the full merged structure ----
        in1 = real & ~tag1 & (p >= a1) & (p <= a2)
        in2 = real & tag1 & (p >= b1) & (p <= b2)
        s1 = jnp.sum(in1.astype(I32), axis=1, keepdims=True)
        s2 = jnp.sum(in2.astype(I32), axis=1, keepdims=True)
        kk = jnp.minimum(s1, s2)
        c1j, c2j = seg_suffix(
            [(jnp.where(in1, one4, zero4), "sum"),
             (jnp.where(in2, one4, zero4), "sum")],
            last, n, max_span)
        u = jnp.where(first, jnp.maximum(c1j, c2j), 0)
        i_ = jnp.where(first, jnp.minimum(c1j, c2j), 0)
        cum_u = cumsum_incl(u, n) - u
        contrib = jnp.minimum(jnp.maximum(kk - cum_u, 0), i_)
        inter = jnp.sum(contrib, axis=1, keepdims=True)

        ok = (cnt1 > 0) & (cnt2 > 0) & (cnt3 > 0) & (nrec >= 3)
        escal = long_run | shared_over | amb_any \
            | (nk1 >= NK_LIMIT) | (nk2 >= NK_LIMIT)

        cols = [ok.astype(I32), inter, kk, nrec, a1, a2, b1, b2,
                escal.astype(I32), cnt1, cnt2, cnt3, n_shared]
        cols += [jnp.zeros((BT, 1), I32)] * (OUT_COLS - len(cols))
        out_ref[:] = jnp.concatenate(cols, axis=1)

    return kernel


@partial(jax.jit, static_argnames=("max_shift_mul", "sketch_size",
                                   "block_rows", "max_span", "interpret"))
def score_pairs_pallas(a_h, a_p, a_m, a_nk, b_hr, b_pr, b_m, b_nk, *,
                       max_shift_mul: tuple, sketch_size: int,
                       block_rows: int = 32, max_span: int = 8,
                       interpret: bool = False):
    """Batched fused scorer.  b_hr/b_pr are ROW-REVERSED ordered-sketch
    columns (entry j = slot S-1-j).  Returns a dict of [T] arrays:
    ok, inter, k, valid_cnt, a1, a2, b1, b2, needs_slow (= escal).

    max_shift_mul: the (m, s) fixed-point constant from
    ops/scorer.fixed_point_constant(max_shift_percent)."""
    m_c, s_c = max_shift_mul
    S = sketch_size
    T = a_h.shape[0]
    n = 1 << (2 * S - 1).bit_length()
    W = min(512, n)
    BT = block_rows
    pad_t = (-T) % BT
    if pad_t:
        ext = lambda x, v: jnp.pad(x, ((0, pad_t), (0, 0)),
                                   constant_values=v)
        a_h = ext(a_h, _IMAX)
        a_p = ext(a_p, _IMAX)
        b_hr = ext(b_hr, _IMAX)
        b_pr = ext(b_pr, _IMAX)
        pz = lambda x: jnp.pad(x, ((0, pad_t),))
        a_m, a_nk, b_m, b_nk = pz(a_m), pz(a_nk), pz(b_m), pz(b_nk)
    Tp = a_h.shape[0]
    scal = jnp.stack([a_m.astype(jnp.int32), b_m.astype(jnp.int32),
                      a_nk.astype(jnp.int32), b_nk.astype(jnp.int32),
                      jnp.zeros((Tp,), I32), jnp.zeros((Tp,), I32),
                      jnp.zeros((Tp,), I32), jnp.zeros((Tp,), I32)],
                     axis=1)

    out = pl.pallas_call(
        _make_kernel(S, n, W, max_span, m_c, s_c, BT),
        grid=(Tp // BT,),
        in_specs=[pl.BlockSpec((BT, S), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)] * 4
        + [pl.BlockSpec((BT, 8), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((BT, OUT_COLS), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Tp, OUT_COLS), jnp.int32),
        interpret=interpret,
    )(a_h.astype(I32), a_p.astype(I32), b_hr.astype(I32),
      b_pr.astype(I32), scal)
    out = out[:T]
    return {
        "ok": out[:, C_OK] != 0, "inter": out[:, C_INTER],
        "k": out[:, C_K], "valid_cnt": out[:, C_VCNT],
        "a1": out[:, C_A1], "a2": out[:, C_A2],
        "b1": out[:, C_B1], "b2": out[:, C_B2],
        "needs_slow": out[:, C_ESCAL] != 0,
        "cnt1": out[:, C_CNT1], "cnt2": out[:, C_CNT2],
        "cnt3": out[:, C_CNT3], "n_shared": out[:, C_NSH],
    }


def reverse_sketch_rows(oh, op, m):
    """Row-reversed ordered-sketch columns for the kernel's b side
    (precomputed once per store): entry j = original S-1-j."""
    return oh[:, ::-1], op[:, ::-1]
