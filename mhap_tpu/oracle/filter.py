"""Oracle of MHAP's tf-idf / repeat k-mer filter.

Parity target: sketch/FrequencyCounts.java.

The filter file format (first line: ``<bloomSize> <repeatCount>``; rows:
``<kmer> <fraction> ...``) is parsed the same way; k-mers with fraction >=
filter_cutoff land in the fraction map keyed by the guava murmur3_128 h1 of
the (optionally canonicalized) k-mer string (FrequencyCounts.java:169-186).

Divergence note (documented, deliberate): the reference stores *all* file
k-mers in a guava BloomFilter with 1e-5 FPR when suppress-noise > 0
(:137, :189-193); we use an exact hash set, so the ~1e-5 false-positive
behavior of ``keepKmer``/``scaledIdf`` is absent.  This only matters for
suppress-noise modes 1/2 and changes nothing on a default run.
"""

from __future__ import annotations

import math

import numpy as np

from . import murmur3 as _m3
from .seq import reverse_complement


def kmer_string_hash(kmer: str, do_reverse_compliment: bool, seed: int = 0) -> int:
    """Hash of one k-mer string (HashUtils.computeSequenceHashesLong with the
    whole string as the single k-mer), canonicalized if requested."""
    s = kmer
    if do_reverse_compliment:
        r = reverse_complement(s)
        if r < s:
            s = r
    codes = np.frombuffer(s.encode("ascii"), dtype=np.uint8).reshape(1, -1)
    return int(_m3.hash_kmers_128(codes, seed)[0])


class FrequencyCounts:
    """Exact-set oracle of sketch/FrequencyCounts.java."""

    def __init__(self, lines, filter_cutoff: float, offset: float,
                 remove_unique: int, no_tf: bool, range_: float,
                 do_reverse_compliment: bool):
        if remove_unique < 0 or remove_unique > 2:
            raise ValueError(f"Unknown removeUnique option {remove_unique}.")
        if offset < 0.0 or offset >= 1.0:
            raise ValueError("Offset can only be between 0 and 1.0.")
        self.range = range_
        self.remove_unique = remove_unique
        self.no_tf = no_tf
        self.kmer_sizes: set[int] = set()

        it = iter(lines)
        try:
            first = next(it)
        except StopIteration:
            first = None
        # header: bloom size + repeat count (sizes only; exact set used here)
        if first is not None:
            parts = first.strip().split()
            _ = int(parts[0]), int(parts[1])

        fraction: dict[int, float] = {}
        valid: set[int] = set()
        max_value = -math.inf
        for line in it:
            parts = line.split(None, 2)
            if not parts:
                continue
            kmer = parts[0]
            self.kmer_sizes.add(len(kmer))
            h = kmer_string_hash(kmer, do_reverse_compliment)
            if len(parts) >= 2:
                percent = float(parts[1])
                if percent >= filter_cutoff:
                    max_value = max(max_value, percent)
                    fraction[h] = percent
            if remove_unique > 0:
                valid.add(h)

        self.fraction_counts = fraction
        self.valid_mers = valid if remove_unique > 0 else None
        self.filter_cutoff = filter_cutoff
        self.offset = offset
        self.max_value = max_value
        self.min_value = filter_cutoff
        self.min_idf_value = self.idf_freq(self.max_value)
        self.max_idf_value = self.idf_freq(self.min_value)

    def idf_freq(self, freq: float) -> float:
        return math.log(self.max_value / freq - self.offset)

    def document_frequency_ratio(self, h: int) -> float:
        return self.fraction_counts.get(h, self.min_value)

    def is_popular(self, h: int) -> bool:
        return h in self.fraction_counts

    def keep_kmer(self, h: int) -> bool:
        if self.remove_unique == 1:
            return h in self.valid_mers
        return True

    def max_idf(self) -> float:
        return self.max_idf_value

    def min_idf(self) -> float:
        return self.min_idf_value

    def scaled_idf(self, h: int, max_value: float | None = None) -> float:
        if max_value is None:
            max_value = self.range
        if self.remove_unique == 2 and self.valid_mers is not None and h not in self.valid_mers:
            return 1.0
        val = self.fraction_counts.get(h)
        if val is None:
            return max_value
        idf = self.idf_freq(val)
        scale = (self.max_idf() - self.min_idf()) / (max_value - 1.0)
        return 1.0 + (idf - self.min_idf()) / scale

    def tf_weight(self, weight: int) -> float:
        return 1.0 if self.no_tf else float(weight)
