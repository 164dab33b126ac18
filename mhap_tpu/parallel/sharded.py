"""Multi-chip SPMD overlap step (mesh + shard_map + XLA collectives).

The reference is a single-JVM thread-pool program (SURVEY.md section 2.8);
this module re-expresses its three concurrency structures as SPMD:

  * data-parallel sketching  -> reads sharded over the mesh axis, each
    device sketches its shard (SequenceSketchStreamer.enqueueFullFile)
  * concurrent LSH index     -> band-sharded vote: device d owns hash
    positions [d*H/D, (d+1)*H/D); the index "build" is an all-gather of
    sketch rows; votes are partial per-band counts merged with
    psum_scatter back to the query's owner (MinHashSearch.java:85-181)
  * work-stealing query loop -> fixed top-K candidate selection per query
    + batched second-stage scoring on-device (MinHashSearch.java:194-251)

Everything below is ONE jittable function over a jax.sharding.Mesh; the
driver's dryrun and the multi-chip bench both call it.  Fixed-capacity
discipline: each query keeps at most `top_k` candidates; the overflow
count (candidates above the vote threshold that didn't fit) is returned so
callers can detect truncation (SURVEY.md hard part #2).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from ..ops import bottomk as _bottomk
from ..ops import minhash as _minhash
from ..ops import murmur3 as _murmur3
from ..ops import scorer as _kscorer

I32 = jnp.int32


def make_mesh(devices=None, axis: str = "d") -> Mesh:
    import numpy as np

    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def make_self_overlap_step(mesh: Mesh, cfg: dict, *, top_k: int = 8,
                           w_cap: int = 8, axis: str = "d"):
    """Build the jitted sharded self-overlap step.

    fn(seq [B,L] u8, lens [B] i32, header_id [B] i32, is_fwd [B] bool)
      -> dict of arrays sharded on the first axis:
        votes    [B, top_k] i32   vote count per kept candidate
        cand     [B, top_k] i32   global stored-row index of the candidate
        valid    [B, top_k] bool  candidate passed vote + suppression rules
        overflow [B] i32          suppressed candidates that did not fit
        ok/inter/k/valid_cnt/a1/a2/b1/b2  [B, top_k] i32 scorer outputs

    B and num_hashes must be divisible by mesh size.  All reads are both
    stored and (if is_fwd) queried -- self-overlap semantics.
    """
    D = mesh.devices.size
    H = cfg["num_hashes"]
    S = cfg["ordered_sketch_size"]
    k1 = cfg["kmer_size"]
    k2 = cfg["ordered_kmer_size"]
    mm = cfg["num_min_matches"]
    msl = cfg["min_store_length"]
    if H % D:
        raise ValueError(f"num_hashes={H} not divisible by mesh size {D}")
    Hl = H // D
    score_fast = _kscorer.make_score_pairs_fast(cfg["max_shift"], S,
                                                jit=False)
    score_slow = _kscorer.make_score_pairs(cfg["max_shift"], S, jit=False)

    def local_sketch(seq, lens):
        B, L = seq.shape
        n1 = L - k1 + 1
        valid1 = jnp.arange(n1)[None, :] < (lens[:, None] - k1 + 1)
        hi, lo = _murmur3.kmer_hashes_128(seq, k1, 0)
        g = _minhash.sort_and_count(hi, lo, valid1)
        w = jnp.where(g["first"], jnp.minimum(g["count"], w_cap), 0)
        active = g["first"] & (w > 0)
        mh = _minhash.weighted_min_reduce(
            g["hi"], g["lo"], w, active, g["tiebreak"],
            num_hashes=H, w_max=w_cap)
        n2 = L - k2 + 1
        valid2 = jnp.arange(n2)[None, :] < (lens[:, None] - k2 + 1)
        h32 = _murmur3.kmer_hashes_32(seq, k2, 0)
        oh, op, om = _bottomk.bottom_sketch(h32, valid2, sketch_size=S)
        nk = jnp.maximum(lens - k2 + 1, 0).astype(I32)
        return mh, oh, op, om, nk

    @partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis)),
        out_specs=P(axis),
        # loop carries in the min-reduce/scorer kernels are initialized from
        # constants, which trips the varying-manual-axes checker; the
        # dataflow is purely per-shard + explicit collectives, so disable it
        check_vma=False)
    def step(seq, lens, header_id, is_fwd):
        # ---- stage 1: data-parallel sketching of the local read shard ----
        mh, oh, op, om, nk = local_sketch(seq, lens)
        b = seq.shape[0]

        # ---- stage 2: band-sharded index + vote ----
        # "index build" = all-gather of sketch rows (each device serves its
        # own band range of the full sketch matrix)
        mh_all = jax.lax.all_gather(mh, axis, tiled=True)        # [B, H]
        hid_all = jax.lax.all_gather(header_id, axis, tiled=True)
        len_all = jax.lax.all_gather(lens, axis, tiled=True)
        B = mh_all.shape[0]
        d = jax.lax.axis_index(axis)
        bands = jax.lax.dynamic_slice(mh_all, (0, d * Hl), (B, Hl))
        # partial votes on the local bands, all queries x all stored
        part = jnp.sum(
            bands[:, None, :] == bands[None, :, :], axis=-1, dtype=I32)
        # merge partial band votes; each device receives its queries' rows
        votes = jax.lax.psum_scatter(
            part, axis, scatter_dimension=0, tiled=True)         # [b, B]

        # ---- stage 3: suppression rules (MinHashSearch.java:194-225) ----
        q_hid = header_id
        q_len = lens.astype(I32)
        cand_rows = jnp.arange(B, dtype=I32)
        ok_pair = votes >= mm
        ok_pair &= len_all[None, :] > 0  # padding rows never match
        ok_pair &= hid_all[None, :] != q_hid[:, None]
        both_short = (len_all[None, :] < msl) & (q_len[:, None] < msl)
        ok_pair &= ~both_short
        ok_pair &= ~((hid_all[None, :] > q_hid[:, None])
                     & (len_all[None, :] >= msl) & (q_len[:, None] >= msl))
        ok_pair &= ~((len_all[None, :] < msl) & (q_len[:, None] >= msl))
        ok_pair &= is_fwd[:, None]  # only forward reads query in self mode

        n_ok = jnp.sum(ok_pair, axis=1).astype(I32)
        overflow = jnp.maximum(n_ok - top_k, 0)
        sel_votes = jnp.where(ok_pair, votes, -1)
        top_votes, top_idx = jax.lax.top_k(sel_votes, top_k)     # [b, top_k]
        valid = top_votes >= 0

        # ---- stage 4: fetch candidate stage-2 sketches + score ----
        oh_all = jax.lax.all_gather(oh, axis, tiled=True)        # [B, S]
        op_all = jax.lax.all_gather(op, axis, tiled=True)
        om_all = jax.lax.all_gather(om, axis, tiled=True)
        nk_all = jax.lax.all_gather(nk, axis, tiled=True)
        flat = top_idx.reshape(-1)                               # [b*K]
        c_oh = oh_all[flat]
        c_op = op_all[flat]
        c_om = jnp.where(valid.reshape(-1), om_all[flat], 0)
        c_nk = nk_all[flat]
        rep = lambda x: jnp.repeat(x, top_k, axis=0)
        sargs = (rep(oh), rep(op),
                 jnp.where(valid.reshape(-1), rep(om), 0), rep(nk),
                 c_oh, c_op, c_om, c_nk)
        out = score_fast(*sargs)
        needs_slow = out.pop("needs_slow") & valid.reshape(-1)
        # exact-automaton fallback, executed only when some lane flags
        # (batch-level cond; the predicate is a per-device scalar)
        slow = jax.lax.cond(
            jnp.any(needs_slow),
            lambda: score_slow(*sargs),
            lambda: {k: out[k] for k in
                     ("ok", "inter", "k", "valid_cnt", "a1", "a2", "b1", "b2")})
        out = {k: jnp.where(needs_slow, slow[k], v) for k, v in out.items()}
        res = {k: v.reshape(b, top_k).astype(I32) for k, v in out.items()}
        res["votes"] = top_votes
        res["cand"] = top_idx
        res["valid"] = valid
        res["overflow"] = overflow
        return res

    in_sh = NamedSharding(mesh, P(axis))
    return jax.jit(step, in_shardings=(in_sh,) * 4), step


def self_overlap_sharded(mesh: Mesh, cfg: dict, reads: list[str], *,
                         top_k: int = 16, w_cap: int = 8) -> list[str]:
    """Host driver: run the sharded step on a read set and emit M4 lines.

    Parity wrapper used by tests: pads the read set to a mesh-divisible
    batch, applies the reference's skip rules on the host, converts the
    integer scorer outputs to mash identities, and formats matches.
    Raises if any query overflowed its top_k candidate budget.
    """
    import numpy as np

    from ..oracle.scorer import jaccard_to_identity
    from ..pipeline.overlapper import _rc_codes

    D = mesh.devices.size
    entries = []
    for i, r in enumerate(reads):
        hid = i + 1
        if len(r) < cfg["min_olap_length"]:
            continue
        codes = np.frombuffer(r.upper().encode("ascii"), dtype=np.uint8)
        if len(codes) < cfg["kmer_size"]:
            continue
        entries.append((hid, True, codes))
        entries.append((hid, False, _rc_codes(codes)))
    N = len(entries)
    B = ((N + D - 1) // D) * D
    L = max(len(e[2]) for e in entries)
    L = ((L + 255) // 256) * 256
    seq = np.zeros((B, L), np.uint8)
    lens = np.zeros(B, np.int32)
    hid = np.zeros(B, np.int32)
    fwd = np.zeros(B, bool)
    for j, (h, f, c) in enumerate(entries):
        seq[j, :len(c)] = c
        lens[j] = len(c)
        hid[j] = h
        fwd[j] = f
    # padding rows: header_id 0 never queries (is_fwd False) and never
    # passes the vote threshold as a candidate (length-0 rows hash pads)

    fn, _ = make_self_overlap_step(mesh, cfg, top_k=top_k, w_cap=w_cap)
    out = {k: np.asarray(v) for k, v in
           fn(jnp.asarray(seq), jnp.asarray(lens), jnp.asarray(hid),
              jnp.asarray(fwd)).items()}
    if out["overflow"].max() > 0:
        raise RuntimeError(
            f"candidate overflow: max {int(out['overflow'].max())} over "
            f"top_k={top_k}; raise top_k")

    k2 = cfg["ordered_kmer_size"]
    lines = []
    for q in range(B):
        if not fwd[q] or lens[q] == 0:
            continue
        for t in range(top_k):
            if not out["valid"][q, t] or not out["ok"][q, t]:
                continue
            c = int(out["cand"][q, t])
            if lens[c] == 0:
                continue
            kk = int(out["k"][q, t])
            j = out["inter"][q, t] / kk if kk > 0 else 0.0
            score = jaccard_to_identity(float(j), k2)
            if score < cfg["threshold"]:
                continue
            a1, a2 = int(out["a1"][q, t]), int(out["a2"][q, t])
            b1, b2 = int(out["b1"][q, t]), int(out["b2"][q, t])
            qlen, clen = int(lens[q]), int(lens[c])
            qf, cf = bool(fwd[q]), bool(fwd[c])
            fa1 = a1 if qf else qlen - a2 - 1
            fa2 = a2 if qf else qlen - a1 - 1
            fb1 = b1 if cf else clen - b2 - 1
            fb2 = b2 if cf else clen - b1 - 1
            sc = min(score, 1.0)
            lines.append("%s %s %.6f %.6f %d %d %d %d %d %d %d %d" % (
                hid[q], hid[c], 1.0 - sc, float(out["valid_cnt"][q, t]),
                0 if qf else 1, fa1, fa2, qlen,
                0 if cf else 1, fb1, fb2, clen))
    return sorted(lines)
