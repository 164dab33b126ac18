"""Vectorized tf-idf k-mer filter for the device pipeline.

Wraps the parsing/semantics oracle (oracle/filter.py, parity target
sketch/FrequencyCounts.java) into dense numpy arrays so the per-batch
weight computation is vectorized:

  * ``keep_mask``  -- keepKmer (suppress-noise==1 drops non-file k-mers)
  * ``weights``    -- MinHashSketch.java:95-128 weight modes.  The tf-idf
    product and Math.round run in IEEE-754 float64 (numpy), which is
    bit-identical to Java's double arithmetic, so device sketches stay
    exactly parity with the reference.

The sketch kernels stay on device; only the weight table lookup (a
data-dependent hash-map probe) runs host-side.  A fully device-resident
variant (sorted-table searchsorted + integer fixed-point rounding) is the
planned optimization once profiling shows the host hop matters.
"""

from __future__ import annotations

import numpy as np

from ..oracle.filter import FrequencyCounts


class VectorFrequencyFilter:
    def __init__(self, fc: FrequencyCounts):
        self.fc = fc
        self.remove_unique = fc.remove_unique
        self.no_tf = fc.no_tf
        self.range = fc.range

        keys = np.fromiter(fc.fraction_counts.keys(), dtype=np.uint64,
                           count=len(fc.fraction_counts))
        order = np.argsort(keys)
        self.frac_keys = keys[order]
        # scaled idf per *file* k-mer, precomputed in float64 (Java double)
        self.frac_sidf = np.asarray(
            [fc.scaled_idf(int(k)) for k in self.frac_keys], dtype=np.float64)
        from ..oracle.filter import GuavaBloomFilter

        self.valid_bloom = None
        if isinstance(fc.valid_mers, GuavaBloomFilter):
            # strict-parity bloom mode: probe the guava-compatible filter
            self.valid_bloom = fc.valid_mers
            self.valid_keys = None
        elif fc.valid_mers is not None:
            self.valid_keys = np.sort(np.fromiter(
                fc.valid_mers, dtype=np.uint64, count=len(fc.valid_mers)))
        else:
            self.valid_keys = None

    def _member(self, table: np.ndarray, h: np.ndarray) -> np.ndarray:
        if len(table) == 0:
            return np.zeros(h.shape, bool)
        idx = np.searchsorted(table, h)
        idx_c = np.minimum(idx, len(table) - 1)
        return table[idx_c] == h

    def _valid_member(self, h: np.ndarray) -> np.ndarray:
        if self.valid_bloom is not None:
            return self.valid_bloom.contains_vec(h.reshape(-1)).reshape(
                h.shape)
        return self._member(self.valid_keys, h)

    def keep_mask(self, h: np.ndarray) -> np.ndarray:
        """keepKmer (FrequencyCounts.java:272-278) vectorized."""
        if self.remove_unique == 1:
            return self._valid_member(h)
        return np.ones(h.shape, bool)

    def is_popular(self, h: np.ndarray) -> np.ndarray:
        return self._member(self.frac_keys, h)

    def scaled_idf(self, h: np.ndarray) -> np.ndarray:
        """scaledIdf (FrequencyCounts.java:290-311) vectorized, float64."""
        out = np.full(h.shape, float(self.range), dtype=np.float64)
        if len(self.frac_keys):
            idx = np.searchsorted(self.frac_keys, h)
            idx_c = np.minimum(idx, len(self.frac_keys) - 1)
            found = self.frac_keys[idx_c] == h
            out[found] = self.frac_sidf[idx_c[found]]
        if self.remove_unique == 2 and (self.valid_keys is not None or
                                        self.valid_bloom is not None):
            out[~self._valid_member(h)] = 1.0
        return out

    # ---- device-resident weighting (pipeline/overlapper.py filtered
    # sketch flow) ----
    #
    # The weight of a k-mer depends only on (is it a file k-mer -> which
    # one, occurrence count): max(1, round(tf(count) * scaledIdf(key)))
    # in tf-idf mode, 1/0 by popularity in legacy mode
    # (MinHashSketch.java:95-128).  The filter table is tiny (the file's
    # over-cutoff k-mers), so the WHOLE weight function is a [K+2, CMAX]
    # int32 lookup table computed here in float64 (bit-identical Java
    # double semantics) and gathered on device by (matched table index,
    # clipped count).  Rows: 0..K-1 = file k-mers in (hi, lo) sort
    # order; K = the never-matching pad entry (same weights as a miss);
    # K+1 = miss (not a file k-mer).

    def device_tables(self, repeat_weight: float, cmax: int = 128):
        """Sorted match table + weight LUT for the device sketch path.

        Returns dict(t_hi, t_lo [K+1] uint32, wlut [(K+2)*cmax] int32
        flat, W static window, cmax, counts_matter) or None when the
        mode needs per-key host machinery (remove_unique 1/2 consult
        the valid-mer set/bloom per k-mer; tf mode >= 1.0 is weight ==
        count, i.e. the plain unfiltered kernel).
        """
        if self.remove_unique != 0:
            return None
        if repeat_weight >= 1.0:
            return None  # weight == count: identical to the plain path
        keys = self.frac_keys  # u64, ascending == (hi, lo) lex order
        K = len(keys)
        t_hi = (keys >> np.uint64(32)).astype(np.uint32)
        t_lo = (keys & np.uint64(0xFFFFFFFF)).astype(np.uint32)
        # pad entry: all-ones key; a real k-mer hashing to it would
        # harmlessly read the pad row, which carries MISS weights
        t_hi = np.concatenate([t_hi, [np.uint32(0xFFFFFFFF)]])
        t_lo = np.concatenate([t_lo, [np.uint32(0xFFFFFFFF)]])
        # match window: max run of equal hi halves in the sorted table
        if K:
            runs = np.diff(np.nonzero(np.concatenate(
                [[True], t_hi[1:K] != t_hi[:K - 1], [True]]))[0])
            W = int(runs.max())
        else:
            W = 1
        counts = np.arange(1, cmax + 1, dtype=np.float64)
        wlut = np.empty((K + 2, cmax), np.int64)
        if repeat_weight < 0.0:
            # legacy: weight 1, popular (= file k-mer) -> 0
            wlut[:K] = 0
            wlut[K:] = 1
            counts_matter = False
        else:
            tf = np.ones_like(counts) if self.no_tf else counts
            sidf = np.concatenate(
                [self.frac_sidf, [float(self.range)] * 2])
            prod = tf[None, :] * sidf[:, None]     # Java double multiply
            wlut[:] = np.maximum(1, np.floor(prod + 0.5).astype(np.int64))
            counts_matter = not self.no_tf
        return dict(t_hi=t_hi, t_lo=t_lo,
                    wlut=np.minimum(wlut, np.iinfo(np.int32).max)
                    .astype(np.int32).reshape(-1),
                    W=W, cmax=cmax, counts_matter=counts_matter)

    def weights(self, keys: np.ndarray, counts: np.ndarray,
                repeat_weight: float) -> np.ndarray:
        """Integer weights per unique k-mer (MinHashSketch.java:95-128)."""
        counts = np.asarray(counts, dtype=np.int64)
        if repeat_weight < 0.0:
            w = np.ones(keys.shape, np.int64)
            w[self.is_popular(keys)] = 0
            return w
        if 0.0 <= repeat_weight < 1.0:
            tf = np.ones(keys.shape, np.float64) if self.no_tf \
                else counts.astype(np.float64)
            prod = tf * self.scaled_idf(keys)          # Java double multiply
            w = np.floor(prod + 0.5).astype(np.int64)  # Java Math.round
            return np.maximum(1, w)
        return counts.copy()
