"""Reality probe for the 40k-regime vote redesign: run-count (bucket
span) distribution, residual mass beyond candidate-span cutoffs, pair
counts after suppression, and scorer throughput at real shapes."""
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

import bench as B
from mhap_tpu.pipeline.overlapper import TpuOverlapper
from mhap_tpu.index.postings import build_postings_device

I32 = jnp.int32

N_READS = int(sys.argv[1]) if len(sys.argv) > 1 else 40_000

t0 = time.perf_counter()
reads, _, _ = B.make_reads_placed(N_READS, seed=B.SEED + 3)
print(f"make_reads: {time.perf_counter()-t0:.1f}s", flush=True)

ov = TpuOverlapper()
t0 = time.perf_counter()
store = ov.sketch_reads(reads, defer_flags=True)
print(f"sketch_reads(cold): {time.perf_counter()-t0:.1f}s "
      f"rows={len(store)}", flush=True)

t0 = time.perf_counter()
post_vals, post_sids = build_postings_device(store.dev("minhash"))
post_vals.block_until_ready()
print(f"postings: {time.perf_counter()-t0:.1f}s", flush=True)

q_sel = np.nonzero(store.is_fwd)[0]
Q = len(q_sel)
N = len(store)
H = store.dev("minhash").shape[1]
print(f"N={N} Q={Q} H={H}", flush=True)


@jax.jit
def join_ranks(post_vals, post_sids, qmh_all, q_rows):
    qT = qmh_all[q_rows].T                       # [H, Q]
    Hh, Nn = post_vals.shape
    Qq = qT.shape[1]
    M = Nn + Qq
    j_vals = jnp.concatenate([post_vals, qT], axis=1)
    j_tagpay = jnp.concatenate(
        [jnp.arange(Nn, dtype=I32)[None, :].repeat(Hh, 0),
         (jnp.arange(Qq, dtype=I32) + (1 << 24))[None, :].repeat(Hh, 0)],
        axis=1)
    s_val, s_tagpay = jax.lax.sort((j_vals, j_tagpay), dimension=1,
                                   num_keys=2)
    s_tag = (s_tagpay >> 24).astype(I32)
    pos_j = jnp.broadcast_to(jnp.arange(M, dtype=I32), (Hh, M))
    cum_q = jnp.cumsum(s_tag, axis=1)
    right_j = pos_j + 1 - cum_q
    new_run = jnp.concatenate(
        [jnp.ones((Hh, 1), bool), s_val[:, 1:] != s_val[:, :-1]], axis=1)
    left_j = jax.lax.cummax(
        jnp.where(new_run, pos_j - (cum_q - s_tag), 0), axis=1)
    lr = ((left_j.astype(jnp.uint32) << jnp.uint32(16))
          | jnp.where(s_tag == 1, right_j - left_j, 0).astype(jnp.uint32))
    # unsort: queries last Q slots
    _, b_lr = jax.lax.sort((s_tagpay, lr), dimension=1, num_keys=1)
    cnt = (b_lr & jnp.uint32(0xFFFF)).astype(I32)[:, Nn:].T  # [Q, H]
    # stats
    hist = jnp.zeros(130, I32)
    cc = jnp.clip(cnt, 0, 129)
    hist = hist.at[cc.reshape(-1)].add(1)
    per_q_max = jnp.max(cnt, axis=1)
    per_q_sum = jnp.sum(cnt, axis=1)
    resid16 = jnp.sum(jnp.maximum(cnt - 16, 0), axis=1)
    resid32 = jnp.sum(jnp.maximum(cnt - 32, 0), axis=1)
    resid8 = jnp.sum(jnp.maximum(cnt - 8, 0), axis=1)
    return hist, per_q_max, per_q_sum, resid8, resid16, resid32


t0 = time.perf_counter()
out = join_ranks(post_vals, post_sids, store.dev("minhash"),
                 jnp.asarray(q_sel.astype(np.int32)))
hist, per_q_max, per_q_sum, resid8, resid16, resid32 = [
    np.asarray(x) for x in out]
print(f"join_ranks(cold): {time.perf_counter()-t0:.1f}s", flush=True)
t0 = time.perf_counter()
out = join_ranks(post_vals, post_sids, store.dev("minhash"),
                 jnp.asarray(q_sel.astype(np.int32)))
jax.block_until_ready(out)
np.asarray(out[0])
print(f"join_ranks(steady): {time.perf_counter()-t0:.2f}s", flush=True)

tot = hist.sum()
print("cnt histogram (cnt: count, pct>):")
cum = 0
for c in range(130):
    cum += hist[c]
    if hist[c] and (c <= 8 or c % 8 == 0 or c > 120):
        print(f"  cnt={c:4d}  n={hist[c]:>10d}  cum={100.0*cum/tot:.4f}%")
print(f"  total (q,h) cells: {tot}")
print(f"per-q max cnt: p50={np.percentile(per_q_max,50):.0f} "
      f"p90={np.percentile(per_q_max,90):.0f} "
      f"p99={np.percentile(per_q_max,99):.0f} max={per_q_max.max()}")
print(f"hits/query: mean={per_q_sum.mean():.1f} max={per_q_sum.max()}")
print(f"residual beyond span 8: total={resid8.sum()} "
      f"per-q p99={np.percentile(resid8,99):.0f} max={resid8.max()}")
print(f"residual beyond span 16: total={resid16.sum()} "
      f"per-q p99={np.percentile(resid16,99):.0f} max={resid16.max()}")
print(f"residual beyond span 32: total={resid32.sum()} "
      f"per-q p99={np.percentile(resid32,99):.0f} max={resid32.max()}",
      flush=True)

# ---- pair counts after suppression: host vote on a sample ----
SAMPLE = 2048
postings_host = ov.build_postings(store)
t0 = time.perf_counter()
qi, ci, votes = ov.vote(postings_host, store.minhash[q_sel[:SAMPLE]])
print(f"host vote sample({SAMPLE}): {time.perf_counter()-t0:.1f}s",
      flush=True)
mm = ov.cfg["num_min_matches"]
keep = votes >= mm
qg = q_sel[qi[keep]]
cand = ci[keep].astype(np.int64)
c_hid = store.header_id[cand]
q_hid = store.header_id[qg]
keep2 = (c_hid != q_hid) & ~(c_hid > q_hid)
print(f"pairs >=mm per query: {keep.sum()/SAMPLE:.1f}; after suppression: "
      f"{keep2.sum()/SAMPLE:.1f} -> est total "
      f"{int(keep2.sum()/SAMPLE*Q)}", flush=True)

# ---- scorer throughput at real shapes ----
pairs_q = qg[keep2][:16384].astype(np.int32)
pairs_c = cand[keep2][:16384].astype(np.int32)
T = len(pairs_q)
print(f"scoring {T} real pairs...", flush=True)
t0 = time.perf_counter()
out = ov._score_dispatch(store, store, pairs_q, pairs_c)
print(f"score dispatch(cold): {time.perf_counter()-t0:.1f}s", flush=True)
for _ in range(3):
    t0 = time.perf_counter()
    out = ov._score_dispatch(store, store, pairs_q, pairs_c)
    dt = time.perf_counter() - t0
    print(f"score dispatch(steady): {dt:.2f}s = {dt/T*1e6:.1f}us/lane",
          flush=True)
print(f"needs_slow: {int(out['needs_slow'].sum())}", flush=True)
