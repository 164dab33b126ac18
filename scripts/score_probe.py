"""Scorer throughput + sub-stage breakdown at real 40k shapes.

Stage 1 (cached): sketch the scale40k reads, derive realistic score
pairs from the KNOWN placements (overlapping reads), save the gathered
scorer inputs to /tmp/score40k_cache.npz.
Stage 2: time the full fast-pass scorer and its sub-stages at 16k lanes.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

CACHE = "/tmp/score40k_cache.npz"
T = 16384


def build_cache():
    import bench as B
    from mhap_tpu.pipeline.overlapper import TpuOverlapper

    reads, placements, _ = B.make_reads_placed(40_000, seed=B.SEED + 3)
    ov = TpuOverlapper(pair_chunk=2048)
    t0 = time.perf_counter()
    store = ov.sketch_reads(reads, defer_flags=True)
    print(f"sketch: {time.perf_counter()-t0:.1f}s rows={len(store)}",
          flush=True)
    # overlapping read pairs from truth placements
    pl = np.asarray(placements)
    order = np.argsort(pl[:, 0])
    pairs = []
    for ii in range(0, 40_000, 7):
        i = order[ii]
        j = ii + 1
        while j < 40_000 and pl[order[j], 0] < pl[i, 1] - 500:
            pairs.append((i, order[j]))
            j += 1
            if len(pairs) >= T * 2:
                break
        if len(pairs) >= T * 2:
            break
    pairs = np.asarray(pairs[:T])
    print(f"truth-overlap pairs: {len(pairs)}", flush=True)
    # map read index -> fwd store row
    fwd_rows = np.nonzero(store.is_fwd)[0]
    hid_of_fwd = store.header_id[fwd_rows]
    row_of_read = np.full(40_001, -1, np.int64)
    row_of_read[hid_of_fwd] = fwd_rows
    qi = row_of_read[pairs[:, 0] + 1]
    ci = row_of_read[pairs[:, 1] + 1]
    okm = (qi >= 0) & (ci >= 0)
    qi, ci = qi[okm], ci[okm]
    reps = int(np.ceil(T / len(qi)))
    qi = np.tile(qi, reps)[:T].astype(np.int32)
    ci = np.tile(ci, reps)[:T].astype(np.int32)
    np.savez(CACHE,
             qoh=store.ordered_h[qi], qop=store.ordered_p[qi],
             qom=store.ordered_m[qi], qnk=store.num_kmers[qi],
             coh=store.ordered_h[ci], cop=store.ordered_p[ci],
             com=store.ordered_m[ci], cnk=store.num_kmers[ci])
    print("cache saved", flush=True)


if not os.path.exists(CACHE):
    build_cache()

d = np.load(CACHE)
args = [jax.device_put(d[k]) for k in
        ("qoh", "qop", "qom", "qnk", "coh", "cop", "com", "cnk")]
jax.block_until_ready(args)
S = args[0].shape[1]
print(f"lanes={args[0].shape[0]} S={S}", flush=True)

from mhap_tpu.ops import scorer as K


def timed(fn, label, iters=3):
    f = jax.jit(fn)
    t0 = time.perf_counter()
    np.asarray(f(*args))
    comp = time.perf_counter() - t0
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        np.asarray(f(*args))
        ts.append(time.perf_counter() - t0)
    med = sorted(ts)[1]
    print(f"{label:12s} compile {comp:6.1f}s  steady {med*1e3:8.1f}ms "
          f"= {med/T*1e6:5.1f}us/lane", flush=True)


# full fast scorer
fast = K.make_score_pairs_fast(0.2, S, cap=min(512, 2 * S), jit=False)


def full(*a):
    out = fast(*a)
    return sum(jnp.sum(v.astype(jnp.int32)) for v in out.values())


timed(full, "full")


def v(fn):
    return jax.vmap(fn)


def structure(qoh, qop, qom, qnk, coh, cop, com, cnk):
    def one(a_h, a_p, a_m, b_h, b_p, b_m):
        st = K._sorted_pair_structure(a_h, a_p, a_m, b_h, b_p, b_m)
        return sum(jnp.sum(x.astype(jnp.int32)) for x in st.values())
    return jnp.sum(v(one)(qoh, qop, qom, coh, cop, com))


timed(structure, "structure")


def struct_compact(qoh, qop, qom, qnk, coh, cop, com, cnk):
    def one(a_h, a_p, a_m, b_h, b_p, b_m):
        st = K._sorted_pair_structure(a_h, a_p, a_m, b_h, b_p, b_m)
        stp, ns = K._compact_shared_runs(st, 1024, 8)
        return (sum(jnp.sum(x.astype(jnp.int32)) for x in stp.values())
                + ns)
    return jnp.sum(v(one)(qoh, qop, qom, coh, cop, com))


timed(struct_compact, "st+compact")


def thru_pass1(qoh, qop, qom, qnk, coh, cop, com, cnk):
    def one(a_h, a_p, a_m, a_nk, b_h, b_p, b_m, b_nk):
        st = K._sorted_pair_structure(a_h, a_p, a_m, b_h, b_p, b_m)
        stp, ns = K._compact_shared_runs(st, 1024, 8)
        abs_max0 = jnp.maximum(a_nk, b_nk) + 1
        shifts1, _, cnt1, _ = K._fast_pass_scan(
            stp, jnp.int32(0), abs_max0, jnp.int32(0), a_nk,
            jnp.int32(0), b_nk, None, pass1=True, max_span=8)
        return jnp.sum(shifts1) + cnt1
    return jnp.sum(v(one)(*[qoh, qop, qom, qnk, coh, cop, com, cnk]))


timed(thru_pass1, "+pass1")


def thru_pass2(qoh, qop, qom, qnk, coh, cop, com, cnk):
    def one(a_h, a_p, a_m, a_nk, b_h, b_p, b_m, b_nk):
        m_c, s_c = K.fixed_point_constant(0.2)
        st = K._sorted_pair_structure(a_h, a_p, a_m, b_h, b_p, b_m)
        stp, ns = K._compact_shared_runs(st, 1024, 8)
        abs_max0 = jnp.maximum(a_nk, b_nk) + 1
        shifts1, _, cnt1, _ = K._fast_pass_scan(
            stp, jnp.int32(0), abs_max0, jnp.int32(0), a_nk,
            jnp.int32(0), b_nk, None, pass1=True, max_span=8)
        median1, abs_max1 = K._shift_stats(shifts1, cnt1, a_nk, b_nk,
                                           m_c, s_c)
        v1l, v1u, v2l, v2u = K._window_params(median1, abs_max1, a_nk, b_nk)
        p1b, p2b, cnt2, ns2 = K._fast_pass_scan(
            stp, median1, abs_max1, v1l, v1u, v2l, v2u, 512, max_span=8)
        return jnp.sum(p1b) + jnp.sum(p2b) + cnt2 + ns2.astype(jnp.int32)
    return jnp.sum(v(one)(*[qoh, qop, qom, qnk, coh, cop, com, cnk]))


timed(thru_pass2, "+pass2")


def jaccard_only(qoh, qop, qom, qnk, coh, cop, com, cnk):
    def one(a_h, a_p, a_m, a_nk, b_h, b_p, b_m, b_nk):
        st = K._sorted_pair_structure(a_h, a_p, a_m, b_h, b_p, b_m)
        inter, k = K._windowed_jaccard_scan(
            st, a_m, b_m, jnp.int32(0), a_nk, jnp.int32(0), b_nk,
            max_span=8)
        return inter + k
    return jnp.sum(v(one)(*[qoh, qop, qom, qnk, coh, cop, com, cnk]))


timed(jaccard_only, "st+jaccard")
