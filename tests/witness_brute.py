"""Third independent witness for the stage-2 overlap scorer.

Re-derived DIRECTLY from the Java text of
sketch/BottomOverlapSketch.java (recordMatchingKmers :397-516,
MatchData :64-298, computeKBottomSketchJaccard :304-364,
getOverlapInfo :592-630) and deliberately structured UNLIKE both
existing implementations (the Python oracle automaton in
mhap_tpu/oracle/scorer.py and the C++ port in native/scorer.h, which
both walk two flat cursors):

  * sketches are pre-grouped into hash RUNS (hash -> position list),
    and the merge state is (run index, offset-in-run) per side;
  * the duplicate-run cursor extension (:457-506) becomes a takewhile
    over the remainder of the CURRENT run only (grouping makes the
    "same hash" condition structural instead of checked);
  * MatchData border math, optimizeShifts, UMVU edges and the windowed
    bottom-k join are re-written from the Java afresh (groupby/min for
    optimizeShifts instead of in-place compaction; an explicit
    union-budget loop for the bottom-k join).

If any of the three implementations misreads the Java, agreement on
adversarial fuzz inputs should break: a common-mode misreading would
have to be made three times independently in three structures.

All arithmetic that the Java does in `int` goes through j32().
"""

from __future__ import annotations

import math
from itertools import groupby, takewhile


def j32(x: int) -> int:
    """Java int semantics: wrap to signed 32-bit."""
    return (int(x) & 0xFFFFFFFF) - 0x100000000 * ((int(x) >> 31) & 1)


def _runs(sketch):
    """Group a hash-sorted (hash, pos) sketch into [(hash, [pos...])].

    Input rows are already sorted by (hash, pos) as BottomOverlapSketch
    construction guarantees (radix sort by hash is stable over the
    position-ordered input, :543-558)."""
    return [(h, [int(p) for _, p in grp])
            for h, grp in groupby(((int(r[0]), int(r[1])) for r in sketch),
                                  key=lambda r: r[0])]


class Borders:
    """MatchData's derived state (performUpdate :191-215 and the
    valid*() border getters :246-276), computed once from a match list
    instead of cached/invalidated like the Java."""

    def __init__(self, shifts, len1, len2, max_shift_pct):
        self.len1, self.len2 = len1, len2
        if shifts:
            # Utils.quickSelect(copy, count/2, count): k-th order
            # statistic, upper median for even counts (Utils.java:445)
            self.median = sorted(shifts)[len(shifts) // 2]
            left = max(0, j32(-self.median))
            right = min(len1, j32(len2 - self.median))
            ovl = max(10, j32(right - left))
            # (int)((double) overlapSize * pct): truncation; ovl >= 10
            self.abs_max = min(max(len1, len2), int(ovl * max_shift_pct))
        else:
            self.median = 0
            self.abs_max = j32(max(len1, len2) + 1)
        self.v1_lo = max(0, j32(-self.median - self.abs_max))
        self.v1_hi = min(len1, j32(len2 - self.median + self.abs_max))
        self.v2_lo = max(0, j32(self.median - self.abs_max))
        self.v2_hi = min(len2, j32(len1 + self.median + self.abs_max))

    def ok1(self, p):
        return self.v1_lo <= p < self.v1_hi

    def ok2(self, p):
        return self.v2_lo <= p < self.v2_hi


def one_pass(runs1, runs2, bd: Borders):
    """One recordMatchingKmers pass (:397-516) over run-grouped input.

    Returns the recorded (pos1, pos2, shift) list."""
    rec = []
    r1 = o1 = r2 = o2 = 0

    def cur(runs, r, o):
        return runs[r][0], runs[r][1][o]

    def step(runs, r, o):
        return (r, o + 1) if o + 1 < len(runs[r][1]) else (r + 1, 0)

    while r1 < len(runs1) and r2 < len(runs2):
        h1, p1 = cur(runs1, r1, o1)
        h2, p2 = cur(runs2, r2, o2)
        # Java advance predicates, in order (:438-441): an invalid pos1
        # advances side 1 even when hash1 >= hash2
        if h1 < h2 or not bd.ok1(p1):
            r1, o1 = step(runs1, r1, o1)
        elif h2 < h1 or not bd.ok2(p2):
            r2, o2 = step(runs2, r2, o2)
        else:
            shift = j32(p2 - p1)
            diff = j32(shift - bd.median)
            if diff > bd.abs_max:
                r1, o1 = step(runs1, r1, o1)
            elif diff < -bd.abs_max:
                r2, o2 = step(runs2, r2, o2)
            else:
                rec.append((p1, p2, shift))
                # duplicate-run extension (:457-506): within the CURRENT
                # run, take the maximal all-valid streak after the match
                ext1 = len(list(takewhile(bd.ok1, runs1[r1][1][o1 + 1:])))
                ext2 = len(list(takewhile(bd.ok2, runs2[r2][1][o2 + 1:])))
                if ext1 or ext2:
                    lp1 = runs1[r1][1][o1 + ext1]
                    lp2 = runs2[r2][1][o2 + ext2]
                    # recorded with NO window/shift check (:499-505)
                    rec.append((lp1, lp2, j32(lp2 - lp1)))
                    o1 += ext1
                    o2 += ext2
                r1, o1 = step(runs1, r1, o1)
                r2, o2 = step(runs2, r2, o2)
    return rec


def optimize_shifts(rec, median):
    """optimizeShifts (:156-189): collapse CONSECUTIVE equal-pos1
    entries, keeping the one with smallest |shift - median| (strict >
    replacement == first minimum on ties)."""
    out = []
    for _, grp in groupby(rec, key=lambda m: m[0]):
        out.append(min(grp, key=lambda m: abs(j32(m[2] - median))))
    return out


def compute_edges(rec, bd: Borders):
    """computeEdges (:90-137): UMVU edge estimators over shift-valid
    matches.  None if fewer than 3 valid."""
    valid = [(p1, p2) for p1, p2, s in rec
             if abs(j32(s - bd.median)) <= bd.abs_max]
    n = len(valid)
    if n < 3:
        return None
    lo1 = min(p for p, _ in valid)
    hi1 = max(p for p, _ in valid)
    lo2 = min(p for _, p in valid)
    hi2 = max(p for _, p in valid)

    def umvu(lo, hi):
        # (int) Math.round((double)(n*lo - hi) / (n - 1)): the numerator
        # wraps in int; Math.round(x) == floor(x + 0.5)
        return int(math.floor(j32(n * lo - hi) / (n - 1) + 0.5))

    a1 = max(0, umvu(lo1, hi1))
    a2 = min(bd.len1, umvu(hi1, lo1))
    b1 = max(0, umvu(lo2, hi2))
    b2 = min(bd.len2, umvu(hi2, lo2))
    return a1, a2, b1, b2, n


def bottom_k_jaccard(sk1, sk2, a1, a2, b1, b2):
    """computeKBottomSketchJaccard (:304-364): restrict each sketch to
    its estimated window (inclusive), then count intersections within a
    union budget of k = min(|f1|, |f2|) via an explicit budget loop."""
    f1 = [int(h) for h, p in sk1 if a1 <= p <= a2]
    f2 = [int(h) for h, p in sk2 if b1 <= p <= b2]
    k = min(len(f1), len(f2))
    if k == 0:
        return 0.0
    i = j = inter = 0
    for _ in range(k):          # unionCount budget (:344-359)
        if f1[i] < f2[j]:
            i += 1
        elif f1[i] > f2[j]:
            j += 1
        else:
            inter += 1
            i += 1
            j += 1
    return inter / k


def brute_overlap_info(sk1, num_kmers1, sk2, num_kmers2, kmer_size,
                       max_shift_pct):
    """Full getOverlapInfo (:592-630).  sk1/sk2: int32 [n, 2] arrays or
    (hash, pos) row lists, hash-sorted.  Returns
    (score, raw_score, a1, a2, b1, b2); all-zero EMPTY on rejection."""
    EMPTY = (0.0, 0.0, 0, 0, 0, 0)
    runs1, runs2 = _runs(sk1), _runs(sk2)

    rec = one_pass(runs1, runs2,
                   Borders([], num_kmers1, num_kmers2, max_shift_pct))
    if not rec:
        return EMPTY
    bd = Borders([s for _, _, s in rec], num_kmers1, num_kmers2,
                 max_shift_pct)
    rec = one_pass(runs1, runs2, bd)
    if not rec:
        return EMPTY
    # pass-2 matches redefine the median/bounds used by optimizeShifts
    # and computeEdges (needRecompute on every recordMatch, :217-233)
    bd2 = Borders([s for _, _, s in rec], num_kmers1, num_kmers2,
                  max_shift_pct)
    rec = optimize_shifts(rec, bd2.median)
    if not rec:
        return EMPTY
    # optimizeShifts sets needRecompute (:188): edges see a median/bound
    # recomputed from the DEDUPED shifts
    bd3 = Borders([s for _, _, s in rec], num_kmers1, num_kmers2,
                  max_shift_pct)
    edges = compute_edges(rec, bd3)
    if edges is None:
        return EMPTY
    a1, a2, b1, b2, valid = edges
    rows1 = [(int(r[0]), int(r[1])) for r in sk1]
    rows2 = [(int(r[0]), int(r[1])) for r in sk2]
    jac = bottom_k_jaccard(rows1, rows2, a1, a2, b1, b2)
    return _identity_tuple(jac, kmer_size, valid, a1, a2, b1, b2)


def _identity_tuple(jac, kmer_size, valid, a1, a2, b1, b2):
    # jaccardToIdentity (:391-395), operation order preserved for
    # bit-exact comparison with the other two witnesses
    if jac <= 0.0:
        score = 0.0
    else:
        d = -1.0 / kmer_size * math.log(2.0 * jac / (1.0 + jac))
        score = math.exp(-d)
    return (score, float(valid), a1, a2, b1, b2)
