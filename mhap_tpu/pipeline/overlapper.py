"""TPU-native end-to-end overlapper pipeline.

The device path mirrors the reference pipeline (main/MhapMain.java:377-552;
impl/MinHashSearch.java; impl/AbstractMatchSearch.java) with a dense batched
dataflow instead of thread pools:

  encode reads -> [B, L] uint8 length-bucketed batches
    -> murmur3 k-mer hash kernels (ops/murmur3.py)
    -> weighted-MinHash min-reduce (ops/minhash.py)     [stage-1 sketch]
    -> bottom-k sort kernel (ops/bottomk.py)            [stage-2 sketch]
  -> sorted-postings LSH vote (this file; device variant in index/)
  -> batched two-pass merge scorer (ops/scorer.py)
  -> host float64 mash-identity conversion + M4 text emission

Output parity: the emitted line *set* is identical to the oracle
(mhap_tpu/oracle/pipeline.py) and therefore to the reference jar.

Weight handling: stage-1 weights are the per-read k-mer occurrence counts
(tf mode, the default when no filter file is given: repeat_weight=0.9 with
no filter -> weight = count, MinHashSketch.java:95-128).  The min-reduce is
compiled for a static per-batch weight cap; batches whose true max weight
exceeds the cap escalate to a higher-cap variant (weights are tiny for real
reads, so the base cap almost always holds).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..oracle import scorer as _oscorer
from ..ops import bottomk as _bottomk
from ..ops import minhash as _minhash
from ..ops import murmur3 as _murmur3
from ..ops import scorer as _kscorer

DEFAULTS = dict(
    kmer_size=16,
    num_hashes=512,
    num_min_matches=3,
    threshold=0.78,
    ordered_kmer_size=12,
    ordered_sketch_size=1536,
    max_shift=0.2,
    min_store_length=0,
    min_olap_length=116,
    repeat_weight=0.9,
)

_RC_TABLE = np.arange(256, dtype=np.uint8)
for _a, _b in [("A", "T"), ("C", "G"), ("M", "K"), ("R", "Y"), ("W", "W"),
               ("S", "S"), ("V", "B"), ("H", "D"), ("N", "N")]:
    _RC_TABLE[ord(_a)] = ord(_b)
    _RC_TABLE[ord(_b)] = ord(_a)


def _rc_codes(codes: np.ndarray) -> np.ndarray:
    """Reverse complement of ASCII codes (utils/Utils.java rc(), IUPAC)."""
    return _RC_TABLE[codes[::-1]]


def _bucket_len(n: int, quantum: int = 256) -> int:
    return max(quantum, ((n + quantum - 1) // quantum) * quantum)


@dataclass
class SketchStore:
    """Host-side dense sketch arrays for a set of oriented reads.

    Mirrors impl/SequenceSketch.java's bundle, as columns:
      header_id [N] int64, is_fwd [N] bool, length [N] int32,
      minhash [N, H] int32, ordered_h/[N, S] int32, ordered_p [N, S] int32,
      ordered_m [N] int32 (valid entries), num_kmers [N] int32.
    """
    header_id: np.ndarray
    is_fwd: np.ndarray
    length: np.ndarray
    minhash: np.ndarray
    ordered_h: np.ndarray
    ordered_p: np.ndarray
    ordered_m: np.ndarray
    num_kmers: np.ndarray
    headers: list = field(default_factory=list)

    def __len__(self):
        return len(self.header_id)

    def display(self, i: int) -> str:
        h = self.headers[i]
        return h if h is not None else str(int(self.header_id[i]))

    @staticmethod
    def concat(stores: list["SketchStore"]) -> "SketchStore":
        cols = {}
        for name in ("header_id", "is_fwd", "length", "minhash", "ordered_h",
                     "ordered_p", "ordered_m", "num_kmers"):
            cols[name] = np.concatenate([getattr(s, name) for s in stores])
        headers = [h for s in stores for h in s.headers]
        return SketchStore(headers=headers, **cols)


@partial(jax.jit, static_argnames=("k1", "k2", "H", "S", "w_cap"))
def _sketch_fused_jit(seq, lens, k1, k2, H, S, w_cap):
    """Whole sketch chunk in one compiled program (hash128 -> weighted
    min-reduce; hash32 -> bottom-k)."""
    n1 = seq.shape[1] - k1 + 1
    valid1 = jnp.arange(n1)[None, :] < (lens[:, None] - k1 + 1)
    hi, lo = _murmur3.kmer_hashes_128(seq, k1, 0)
    g = _minhash.sort_and_count(hi, lo, valid1)
    w = jnp.where(g["first"], g["count"], 0)
    active = g["first"] & (w > 0)
    n_valid = jnp.sum(active, axis=1).astype(jnp.int32)
    max_w = jnp.max(jnp.where(active, w, 0), axis=1)
    sketch = _min_reduce(g["hi"], g["lo"], jnp.minimum(w, w_cap), active,
                         g["tiebreak"], num_hashes=H, w_max=w_cap)
    n2 = seq.shape[1] - k2 + 1
    valid2 = jnp.arange(n2)[None, :] < (lens[:, None] - k2 + 1)
    h32 = _murmur3.kmer_hashes_32(seq, k2, 0)
    oh, op, om = _bottomk.bottom_sketch(h32, valid2, sketch_size=S)
    return sketch, n_valid, max_w, oh, op, om


@partial(jax.jit, static_argnames=("k1",))
def _sketch_hash128_jit(seq, k1):
    return _murmur3.kmer_hashes_128(seq, k1, 0)


@partial(jax.jit, static_argnames=("k2", "S"))
def _sketch_bottom_jit(seq, lens, k2, S):
    n2 = seq.shape[1] - k2 + 1
    valid2 = jnp.arange(n2)[None, :] < (lens[:, None] - k2 + 1)
    h32 = _murmur3.kmer_hashes_32(seq, k2, 0)
    return _bottomk.bottom_sketch(h32, valid2, sketch_size=S)


class TpuOverlapper:
    """Single-chip overlapper. Multi-chip sharding lives in parallel/."""

    def __init__(self, cfg=None, w_caps=(4, 16, 128, 512), pair_chunk: int = 512,
                 kmer_filter=None):
        self.cfg = dict(DEFAULTS)
        if cfg:
            self.cfg.update(cfg)
        self.w_caps = tuple(w_caps)
        self.pair_chunk = pair_chunk
        self.kmer_filter = kmer_filter  # VectorFrequencyFilter or None
        # record capacity 1024 < 2S: shrinks the shift-median/optimize sort
        # widths; the rare overflowing lanes (near-duplicate reads) re-run
        # exactly on the host oracle via needs_slow
        self._score_fast = _kscorer.make_score_pairs_fast(
            self.cfg["max_shift"], self.cfg["ordered_sketch_size"],
            cap=min(1024, 2 * self.cfg["ordered_sketch_size"]))
        self.slow_pair_count = 0  # observability: host-oracle fallbacks
        self._gather_score_cache: dict = {}
        self.long_window = 1 << 17  # streaming window for very long reads
        # device_vote: run the LSH vote with the on-device postings kernel
        # (index/postings.py); any span-cap overflow falls back to the
        # exact host vote for the whole query batch
        self.device_vote = False
        # search statistics (MinHashSearch.java:51-58 atomics equivalent)
        self.stats = dict(matches_processed=0, sequences_searched=0,
                          elements_processed=0, sequences_hit=0,
                          sequences_fully_compared=0)

    # ---------------- sketching ----------------

    def _sketch_batch(self, codes: np.ndarray, lens: np.ndarray):
        """codes: [B, L] uint8 (padded). Returns host numpy arrays
        (minhash [B,H], mh_valid [B] bool, oh, op, om, num_kmers).

        The whole device computation (hashing + min-reduce + bottom-k) is
        ONE jit call per chunk: eager jnp ops would each round-trip
        through the remote-device tunnel."""
        cfg = self.cfg
        k1, k2 = cfg["kmer_size"], cfg["ordered_kmer_size"]
        H, S = cfg["num_hashes"], cfg["ordered_sketch_size"]

        if self.kmer_filter is not None:
            seq = jnp.asarray(codes)
            lens_j = jnp.asarray(lens)
            n1 = codes.shape[1] - k1 + 1
            valid1 = jnp.arange(n1)[None, :] < (lens_j[:, None] - k1 + 1)
            hi, lo = _sketch_hash128_jit(seq, k1)
            mh, mh_valid = self._minhash_filtered(hi, lo, np.asarray(valid1))
            h32_out = _sketch_bottom_jit(seq, lens_j, k2, S)
            oh, op, om = h32_out
        else:
            out = _sketch_fused_jit(jnp.asarray(codes), jnp.asarray(lens),
                                    k1, k2, H, S, self.w_caps[0])
            sketch, n_valid, max_w, oh, op, om = out
            mh = np.array(sketch)
            nv = np.asarray(n_valid)
            maxw = np.asarray(max_w)
            redo = maxw > self.w_caps[0]
            for cap in self.w_caps[1:]:
                if not redo.any():
                    break
                out2 = _sketch_fused_jit(jnp.asarray(codes),
                                         jnp.asarray(lens),
                                         k1, k2, H, S, cap)
                mh[redo] = np.asarray(out2[0])[redo]
                redo = redo & (maxw > cap)
            if redo.any():
                raise RuntimeError(
                    f"k-mer weight exceeds largest cap {self.w_caps[-1]}")
            mh_valid = nv > 0
        num_kmers = np.maximum(lens - k2 + 1, 0).astype(np.int32)
        return (mh, mh_valid, np.asarray(oh), np.asarray(op),
                np.asarray(om), num_kmers)

    def _minhash_filtered(self, hi, lo, window_valid):
        """Filtered sketch: device hashing, vectorized host keepKmer +
        tf-idf weights (exact Java double semantics, see freqfilter.py),
        device min-reduce."""
        import jax

        cfg = self.cfg
        H = cfg["num_hashes"]
        f = self.kmer_filter
        h64 = (np.asarray(hi, dtype=np.uint64) << np.uint64(32)) | \
            np.asarray(lo, dtype=np.uint64)
        valid = window_valid & f.keep_mask(h64)

        # group duplicates per row: sort by (invalid, hash), stable
        B, n = h64.shape
        o1 = np.argsort(h64, axis=1, kind="stable")
        inval_s = np.take_along_axis(~valid, o1, 1)
        o2 = np.argsort(inval_s, axis=1, kind="stable")
        order = np.take_along_axis(o1, o2, 1).astype(np.int32)
        s_h = np.take_along_axis(h64, order, 1)
        s_valid = np.take_along_axis(valid, order, 1)
        prev_same = np.zeros((B, n), bool)
        prev_same[:, 1:] = s_h[:, 1:] == s_h[:, :-1]
        first = s_valid & ~prev_same
        # run lengths via position-difference of first indices
        counts = np.zeros((B, n), np.int64)
        nvalid_row = s_valid.sum(axis=1)
        for b in range(B):
            fi = np.nonzero(first[b])[0]
            if len(fi) == 0:
                continue
            ends = np.append(fi[1:], nvalid_row[b])
            counts[b, fi] = ends - fi
        w = np.zeros((B, n), np.int64)
        fm = first.reshape(-1)
        if fm.any():
            w.reshape(-1)[fm] = f.weights(
                s_h.reshape(-1)[fm], counts.reshape(-1)[fm],
                cfg["repeat_weight"])
        active = first & (w > 0)
        nv = active.sum(axis=1)
        w_max = max(int(w.max()) if w.size else 1, 1)
        for cap in self.w_caps:
            if w_max <= cap:
                w_max = cap
                break
        s_hi = jnp.asarray((s_h >> np.uint64(32)).astype(np.uint32))
        s_lo = jnp.asarray((s_h & np.uint64(0xFFFFFFFF)).astype(np.uint32))
        mh = _min_reduce(
            s_hi, s_lo, jnp.asarray(w.astype(np.int32)),
            jnp.asarray(active), jnp.asarray(order),
            num_hashes=H, w_max=w_max)
        return np.asarray(mh), nv > 0

    # reads longer than this stream through the windowed sketcher instead
    # of the dense length-bucketed batch (padding/bucket-explosion control;
    # SURVEY.md section 5 "long-context" guidance)
    LONG_READ_THRESHOLD = 1 << 17

    def _sketch_long(self, codes: np.ndarray, window: int | None = None):
        """Streaming sketch of one very long read: hash in overlapping
        windows (bounded device memory), dedup/count on host, then one
        single-row device min-reduce over the unique k-mers and a merged
        bottom-k.  Bit-identical to the dense path (the weighted-MinHash
        min and the bottom-k are mergeable across windows)."""
        window = window or self.long_window
        cfg = self.cfg
        k1, k2 = cfg["kmer_size"], cfg["ordered_kmer_size"]
        H, S = cfg["num_hashes"], cfg["ordered_sketch_size"]
        L = len(codes)

        # --- stage 1: windowed 128-bit hashing -> host u64 stream ---
        h64_parts = []
        for s in range(0, L - k1 + 1, window):
            e = min(L, s + window + k1 - 1)
            wlen = ((e - s + 255) // 256) * 256
            buf = np.zeros((1, wlen), np.uint8)
            buf[0, :e - s] = codes[s:e]
            hi, lo = _sketch_hash128_jit(jnp.asarray(buf), k1)
            n_here = e - s - k1 + 1
            h64 = (np.asarray(hi, dtype=np.uint64) << np.uint64(32)) | \
                np.asarray(lo, dtype=np.uint64)
            h64_parts.append(h64[0, :n_here])
        h64 = np.concatenate(h64_parts)

        if self.kmer_filter is not None:
            keep = self.kmer_filter.keep_mask(h64)
            h64_kept = h64[keep]
        else:
            h64_kept = h64
        if len(h64_kept) == 0:
            return None
        keys, first_idx, counts = np.unique(
            h64_kept, return_index=True, return_counts=True)
        if self.kmer_filter is not None:
            w = self.kmer_filter.weights(keys, counts, cfg["repeat_weight"])
        else:
            w = counts.astype(np.int64)
        act = w > 0
        if not act.any():
            return None
        # single padded row over the unique k-mers
        U = len(keys)
        U_pad = max(256, ((U + 255) // 256) * 256)
        hi_r = np.zeros((1, U_pad), np.uint32)
        lo_r = np.zeros((1, U_pad), np.uint32)
        w_r = np.zeros((1, U_pad), np.int32)
        tb_r = np.full((1, U_pad), np.int32(0x7FFFFFFF), np.int32)
        act_r = np.zeros((1, U_pad), bool)
        hi_r[0, :U] = (keys >> np.uint64(32)).astype(np.uint32)
        lo_r[0, :U] = (keys & np.uint64(0xFFFFFFFF)).astype(np.uint32)
        w_r[0, :U] = np.minimum(w, np.iinfo(np.int32).max)
        tb_r[0, :U] = np.minimum(first_idx, np.iinfo(np.int32).max)
        act_r[0, :U] = act
        w_max = max(1, int(w[act].max()))
        for capw in self.w_caps:
            if w_max <= capw:
                w_max = capw
                break
        mh = np.asarray(_min_reduce(
            jnp.asarray(hi_r), jnp.asarray(lo_r), jnp.asarray(w_r),
            jnp.asarray(act_r), jnp.asarray(tb_r),
            num_hashes=H, w_max=w_max))[0]

        # --- stage 2: windowed bottom-k, merged across windows ---
        parts = []
        for s in range(0, L - k2 + 1, window):
            e = min(L, s + window + k2 - 1)
            wlen = ((e - s + 255) // 256) * 256
            buf = np.zeros((1, wlen), np.uint8)
            buf[0, :e - s] = codes[s:e]
            n_here = e - s - k2 + 1
            oh, op, om = _sketch_bottom_jit(
                jnp.asarray(buf), jnp.asarray([n_here + k2 - 1], np.int32),
                k2, S)
            m = int(np.asarray(om)[0])
            part = np.stack([np.asarray(oh)[0, :m],
                             np.asarray(op)[0, :m] + s], axis=1)
            parts.append(part)
        allp = np.concatenate(parts)
        order = np.lexsort((allp[:, 1], allp[:, 0]))
        m = min(S, L - k2 + 1)
        merged = allp[order[:m]].astype(np.int32)
        return mh, merged, L - k2 + 1

    def sketch_reads(self, reads: list[str], headers=None, offset: int = 0,
                     do_rc: bool = True) -> SketchStore:
        """Sketch fwd (+rev) of every read with the reference's skip rules
        (SequenceSketchStreamer.java:123-177: drop < minOlapLength, skip
        zero-ngram reads; ids keep counting across dropped reads)."""
        cfg = self.cfg
        entries = []  # (header_id, is_fwd, header, codes)
        for i, r in enumerate(reads):
            hid = i + 1 + offset
            if len(r) < cfg["min_olap_length"]:
                continue
            hdr = headers[i] if headers is not None else None
            codes = np.frombuffer(r.upper().encode("ascii"), dtype=np.uint8)
            entries.append((hid, True, hdr, codes))
            if do_rc:
                entries.append((hid, False, hdr, _rc_codes(codes)))

        # length-bucketed batches; very long reads stream separately
        by_bucket: dict[int, list[int]] = {}
        long_idx: list[int] = []
        for j, e in enumerate(entries):
            if len(e[3]) >= self.LONG_READ_THRESHOLD:
                long_idx.append(j)
            else:
                by_bucket.setdefault(_bucket_len(len(e[3])), []).append(j)

        N = len(entries)
        H, S = cfg["num_hashes"], cfg["ordered_sketch_size"]
        minhash = np.zeros((N, H), np.int32)
        mh_valid = np.zeros(N, bool)
        ordered_h = np.zeros((N, S), np.int32)
        ordered_p = np.zeros((N, S), np.int32)
        ordered_m = np.zeros(N, np.int32)
        num_kmers = np.zeros(N, np.int32)

        ROWS = 256  # fixed row-tile: bounds jit variants to (bucket_len,)
        for blen, idxs in sorted(by_bucket.items()):
            for s in range(0, len(idxs), ROWS):
                chunk = idxs[s:s + ROWS]
                B = ROWS if len(idxs) > ROWS else len(chunk)
                codes = np.zeros((B, blen), np.uint8)
                lens = np.zeros(B, np.int32)
                for r, j in enumerate(chunk):
                    c = entries[j][3]
                    codes[r, :len(c)] = c
                    lens[r] = len(c)
                mh, mhv, oh, op, om, nk = self._sketch_batch(codes, lens)
                ii = np.asarray(chunk)
                m = len(chunk)
                minhash[ii] = mh[:m]
                mh_valid[ii] = mhv[:m]
                ordered_h[ii] = oh[:m]
                ordered_p[ii] = op[:m]
                ordered_m[ii] = om[:m]
                num_kmers[ii] = nk[:m]

        for j in long_idx:
            res = self._sketch_long(entries[j][3])
            if res is not None:
                mh, merged, nk = res
                minhash[j] = mh
                mh_valid[j] = True
                ordered_h[j, :len(merged)] = merged[:, 0]
                ordered_p[j, :len(merged)] = merged[:, 1]
                ordered_h[j, len(merged):] = np.int32(0x7FFFFFFF)
                ordered_p[j, len(merged):] = np.int32(0x7FFFFFFF)
                ordered_m[j] = len(merged)
                num_kmers[j] = nk

        # zero-ngram skip rules: fwd fails -> drop the read entirely;
        # rev fails -> keep fwd only (enqueue() + enqueueUntilFound()).
        keep = np.ones(N, bool)
        for j, (hid, fwd, hdr, codes) in enumerate(entries):
            if fwd and not mh_valid[j]:
                keep[j] = False
                if do_rc and j + 1 < N and entries[j + 1][0] == hid:
                    keep[j + 1] = False
            elif not fwd and not mh_valid[j]:
                keep[j] = False
        sel = np.nonzero(keep)[0]
        return SketchStore(
            header_id=np.asarray([entries[j][0] for j in sel], np.int64),
            is_fwd=np.asarray([entries[j][1] for j in sel], bool),
            length=np.asarray([len(entries[j][3]) for j in sel], np.int32),
            minhash=minhash[sel],
            ordered_h=ordered_h[sel],
            ordered_p=ordered_p[sel],
            ordered_m=ordered_m[sel],
            num_kmers=num_kmers[sel],
            headers=[entries[j][2] for j in sel],
        )

    # ---------------- LSH vote ----------------

    @staticmethod
    def build_postings(store: SketchStore):
        """Sorted postings over (position, hashValue): the array-based
        re-expression of MinHashSearch's 512 hash tables (:85-147)."""
        N, H = store.minhash.shape
        pos = np.repeat(np.arange(H, dtype=np.int64), N)
        val = store.minhash.T.reshape(-1).astype(np.int64) & 0xFFFFFFFF
        key = (pos << 32) | val
        sid = np.tile(np.arange(N, dtype=np.int64), H)
        order = np.argsort(key, kind="stable")
        return key[order], sid[order]

    @staticmethod
    def vote(postings, query_mh: np.ndarray):
        """Vote counting for a query batch (MinHashSearch.java:161-204).

        Returns (q_idx, cand_idx, counts) arrays over candidate pairs."""
        keys, sids = postings
        Q, H = query_mh.shape
        qpos = np.broadcast_to(np.arange(H, dtype=np.int64), (Q, H))
        qval = query_mh.astype(np.int64) & 0xFFFFFFFF
        qkey = ((qpos << 32) | qval).reshape(-1)
        left = np.searchsorted(keys, qkey, side="left")
        right = np.searchsorted(keys, qkey, side="right")
        cnt = right - left
        tot = int(cnt.sum())
        if tot == 0:
            e = np.zeros(0, np.int64)
            return e, e, e
        # expand hit ranges
        hit_q = np.repeat(np.arange(Q * H, dtype=np.int64) // H, cnt)
        starts = np.repeat(left - np.concatenate([[0], np.cumsum(cnt)[:-1]]), cnt)
        hit_slot = np.arange(tot, dtype=np.int64) + starts
        hit_cand = sids[hit_slot]
        pair = (hit_q << 32) | hit_cand
        upair, votes = np.unique(pair, return_counts=True)
        return upair >> 32, upair & 0xFFFFFFFF, votes

    def _vote_dispatch(self, store, postings, query_mh):
        """Host numpy vote by default; optional device postings kernel
        (exact host fallback when any span overflows)."""
        if not self.device_vote:
            return self.vote(postings, query_mh)
        from ..index.postings import build_postings_device, vote_device

        dev = getattr(store, "_dev_postings", None)
        if dev is None:
            dev = build_postings_device(store.minhash)
            store._dev_postings = dev
        K = min(256, len(store))
        out = vote_device(dev[0], dev[1], query_mh, span_cap=32, top_k=K,
                          min_matches=self.cfg["num_min_matches"])
        votes = np.asarray(out["votes"])
        # exactness guards: span-cap overflow, or a full candidate list
        # (possible truncation of equally-voted candidates)
        if int(np.asarray(out["overflow"]).max()) > 0 or \
                (K < len(store) and (votes[:, -1] > 0).any()):
            return self.vote(postings, query_mh)
        cand = np.asarray(out["cand"])
        rows, cols = np.nonzero(votes > 0)
        return rows.astype(np.int64), cand[rows, cols].astype(np.int64), \
            votes[rows, cols].astype(np.int64)

    # ---------------- pair scoring ----------------

    def _dev_store(self, store: SketchStore, quantum: int = 1024):
        """Device-resident ordered-sketch columns, padded to a size quantum
        (bounds jit variants); pushed once per store and cached on it."""
        N = len(store)
        N_pad = max(quantum, ((N + quantum - 1) // quantum) * quantum)
        cached = getattr(store, "_dev_cache", None)
        if cached is not None and cached[0] == N_pad:
            return cached[1]

        def pad(a, fill):
            out = np.full((N_pad,) + a.shape[1:], fill, a.dtype)
            out[:N] = a
            return jnp.asarray(out)

        dev = (pad(store.ordered_h, _kscorer.PAD_HASH),
               pad(store.ordered_p, np.int32(0x7FFFFFFF)),
               pad(store.ordered_m, 0), pad(store.num_kmers, 0))
        store._dev_cache = (N_pad, dev)
        return dev

    def _score_chunk(self, fn, qs, cs, qq, cc):
        """Gather+score fully on device: sketch columns live on device
        (pushed once), only the pair index vectors cross the host link."""
        q_dev = self._dev_store(qs)
        c_dev = self._dev_store(cs) if cs is not qs else q_dev
        key = (id(fn), q_dev[0].shape[0], c_dev[0].shape[0], len(qq))
        gf = self._gather_score_cache.get(key)
        if gf is None:
            import jax

            def impl(qoh, qop, qom, qnk, coh, cop, com, cnk, qi, ci):
                return fn(qoh[qi], qop[qi], qom[qi], qnk[qi],
                          coh[ci], cop[ci], com[ci], cnk[ci])

            gf = jax.jit(impl)
            self._gather_score_cache[key] = gf
        return gf(*q_dev, *c_dev, jnp.asarray(qq.astype(np.int32)),
                  jnp.asarray(cc.astype(np.int32)))

    def score_pairs(self, qs: SketchStore, cs: SketchStore,
                    qi: np.ndarray, ci: np.ndarray):
        """Batched stage-2 scoring of (qs[qi[t]], cs[ci[t]]) pairs.

        Two-phase dispatch: the vectorized fast pass scores every pair; the
        rare lanes it flags (duplicate-run/shift-retry corner cases, see
        ops/scorer._fast_pass) are re-scored with the exact sequential
        automaton, so the result set is bit-identical to the reference.

        Returns (score float64 [T], raw float64 [T], edges int32 [T, 4])."""
        T = len(qi)
        k2 = self.cfg["ordered_kmer_size"]
        score = np.zeros(T, np.float64)
        raw = np.zeros(T, np.float64)
        edges = np.zeros((T, 4), np.int32)
        slow_q, slow_c, slow_t = [], [], []
        P = self.pair_chunk

        def fill(dst_idx, out, sel=None):
            o = {k: np.asarray(v) for k, v in out.items()}
            if sel is not None:
                o = {k: v[sel] for k, v in o.items()}
            ok = o["ok"].astype(bool)
            kk = o["k"]
            with np.errstate(divide="ignore", invalid="ignore"):
                j = np.where(kk > 0, o["inter"] / np.maximum(kk, 1), 0.0)
            sc = np.array([_oscorer.jaccard_to_identity(float(x), k2)
                           for x in j])
            score[dst_idx] = np.where(ok, sc, 0.0)
            raw[dst_idx] = np.where(ok, o["valid_cnt"].astype(np.float64), 0.0)
            for n, name in enumerate(("a1", "a2", "b1", "b2")):
                edges[dst_idx, n] = np.where(ok, o[name], 0)

        for s in range(0, T, P):
            e = min(s + P, T)
            pad = P - (e - s)
            qq = np.concatenate([qi[s:e], np.repeat(qi[s:s + 1], pad)])
            cc = np.concatenate([ci[s:e], np.repeat(ci[s:s + 1], pad)])
            out = self._score_chunk(self._score_fast, qs, cs, qq, cc)
            ns = np.asarray(out["needs_slow"])[:e - s]
            dst = np.arange(s, e)
            fill(dst, {k: np.asarray(v)[:e - s] for k, v in out.items()})
            if ns.any():
                slow_t.extend(dst[ns])
                slow_q.extend(qq[:e - s][ns])
                slow_c.extend(cc[:e - s][ns])

        if slow_t:
            # flagged lanes are rare (automaton corner cases); the host
            # oracle scores them exactly in microseconds each, far cheaper
            # than a latency-bound device while_loop relaunch
            self.slow_pair_count += len(slow_t)
            from ..oracle import scorer as _osc

            for t, qj, cj in zip(slow_t, slow_q, slow_c):
                m1 = int(qs.ordered_m[qj])
                m2 = int(cs.ordered_m[cj])
                s1 = np.stack([qs.ordered_h[qj, :m1],
                               qs.ordered_p[qj, :m1]], axis=1)
                s2 = np.stack([cs.ordered_h[cj, :m2],
                               cs.ordered_p[cj, :m2]], axis=1)
                sc, rw, a1, a2, b1, b2 = _osc.get_overlap_info(
                    s1, int(qs.num_kmers[qj]), s2, int(cs.num_kmers[cj]),
                    k2, self.cfg["max_shift"])
                score[t] = sc
                raw[t] = rw
                edges[t] = (a1, a2, b1, b2)
        return score, raw, edges

    # ---------------- match driving ----------------

    def _format(self, qs: SketchStore, cs: SketchStore, qi, ci, score, raw,
                edges) -> list[str]:
        """MatchResult coordinate flips + formatting (MatchResult.java)."""
        lines = []
        for t in range(len(qi)):
            q, c = int(qi[t]), int(ci[t])
            a1, a2, b1, b2 = (int(x) for x in edges[t])
            qlen = int(qs.length[q])
            clen = int(cs.length[c])
            qf = bool(qs.is_fwd[q])
            cf = bool(cs.is_fwd[c])
            fa1 = a1 if qf else qlen - a2 - 1
            fa2 = a2 if qf else qlen - a1 - 1
            fb1 = b1 if cf else clen - b2 - 1
            fb2 = b2 if cf else clen - b1 - 1
            sc = min(float(score[t]), 1.0)
            lines.append("%s %s %.6f %.6f %d %d %d %d %d %d %d %d" % (
                qs.display(q), cs.display(c), 1.0 - sc, float(raw[t]),
                0 if qf else 1, fa1, fa2, qlen,
                0 if cf else 1, fb1, fb2, clen))
        return lines

    def _find_matches(self, store: SketchStore, postings, queries: SketchStore,
                      q_sel: np.ndarray, to_self: bool) -> list[str]:
        """Vote + suppression rules + scoring (MinHashSearch.java:149-251)."""
        cfg = self.cfg
        if len(q_sel) == 0:
            return []
        q_idx, cand, votes = self._vote_dispatch(store, postings,
                                                 queries.minhash[q_sel])
        self.stats["sequences_searched"] += len(q_sel)
        self.stats["elements_processed"] += int(votes.sum())
        self.stats["sequences_hit"] += len(q_idx)
        if len(q_idx) == 0:
            return []
        qg = q_sel[q_idx]  # global query row in `queries`
        keepm = votes >= cfg["num_min_matches"]
        msl = cfg["min_store_length"]
        q_hid = queries.header_id[qg]
        c_hid = store.header_id[cand]
        q_len = queries.length[qg].astype(np.int64)
        c_len = store.length[cand].astype(np.int64)
        if to_self:
            keepm &= c_hid != q_hid
        keepm &= ~((c_len < msl) & (q_len < msl))
        if to_self:
            keepm &= ~((c_hid > q_hid) & (c_len >= msl) & (q_len >= msl))
            keepm &= ~((c_len < msl) & (q_len >= msl))
        qg, cand = qg[keepm], cand[keepm]
        if len(qg) == 0:
            return []
        self.stats["sequences_fully_compared"] += len(qg)
        score, raw, edges = self.score_pairs(queries, store, qg, cand)
        acc = score >= cfg["threshold"]
        self.stats["matches_processed"] += int(acc.sum())
        return self._format(queries, store, qg[acc], cand[acc],
                            score[acc], raw[acc], edges[acc])

    def overlap_self(self, reads: list[str], headers=None) -> list[str]:
        """Self-overlap run; returns the sorted list of M4 lines."""
        store = self.sketch_reads(reads, headers)
        postings = self.build_postings(store)
        q_sel = np.nonzero(store.is_fwd)[0]
        return sorted(self._find_matches(store, postings, store, q_sel, True))

    def overlap_query(self, box_reads: list[str], query_reads: list[str],
                      no_self: bool = False) -> list[str]:
        """Box-vs-query run (MhapMain usage 1 with -q)."""
        box = self.sketch_reads(box_reads)
        postings = self.build_postings(box)
        lines = []
        if not no_self:
            q_sel = np.nonzero(box.is_fwd)[0]
            lines += self._find_matches(box, postings, box, q_sel, True)
        n_box = len(box) // 2
        queries = self.sketch_reads(query_reads, offset=n_box, do_rc=False)
        q_sel = np.arange(len(queries))
        lines += self._find_matches(box, postings, queries, q_sel, False)
        return sorted(lines)


import os

# MHAP_TPU_MINHASH=pallas selects the VMEM-resident pallas kernel
# (ops/minhash_pallas.py): it compiles ~50x faster than the XLA scan but
# currently runs slower on v5e (lane-axis reductions in mosaic); the scan
# is the default until its block layout is tuned.
_MINHASH_IMPL = os.environ.get("MHAP_TPU_MINHASH", "scan")


def _min_reduce(hi, lo, w, active, tiebreak, num_hashes: int, w_max: int):
    """Backend dispatch for the min-reduction kernel."""
    import jax

    if (_MINHASH_IMPL == "pallas" and jax.default_backend() != "cpu"
            and w_max <= 64 and num_hashes % 8 == 0):
        from ..ops.minhash_pallas import weighted_min_reduce_pallas

        return weighted_min_reduce_pallas(
            hi, lo, w, active, tiebreak, num_hashes=num_hashes, w_max=w_max)
    return _minhash.weighted_min_reduce(
        hi, lo, w, active, tiebreak, num_hashes=num_hashes, w_max=w_max)


# jitted helper: minhash + per-read max weight in one device call
_MINHASH_CACHE: dict = {}


def _sketch_minhash_with_maxw(hi, lo, valid, num_hashes: int, w_cap: int):
    import jax

    key = (num_hashes, w_cap, hi.shape)
    fn = _MINHASH_CACHE.get(key)
    if fn is None:
        def impl(hi, lo, valid):
            g = _minhash.sort_and_count(hi, lo, valid)
            w = jnp.where(g["first"], g["count"], 0)
            active = g["first"] & (w > 0)
            n_valid = jnp.sum(active, axis=1).astype(jnp.int32)
            max_w = jnp.max(jnp.where(active, w, 0), axis=1)
            wc = jnp.minimum(w, w_cap)
            sketch = _min_reduce(
                g["hi"], g["lo"], wc, active, g["tiebreak"],
                num_hashes=num_hashes, w_max=w_cap)
            return sketch, n_valid, max_w

        fn = jax.jit(impl)
        _MINHASH_CACHE[key] = fn
    return fn(hi, lo, valid)
