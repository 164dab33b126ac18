"""Stage-boundary HBM probe for the 100k OOM."""
import sys, time, gc
import numpy as np
sys.path.insert(0, __file__.rsplit("/", 2)[0])
import jax, jax.numpy as jnp
import bench as B
from mhap_tpu.pipeline.overlapper import TpuOverlapper
from mhap_tpu.index import joinvote as JV

def free_hbm():
    """Probe free HBM in 256MB steps (max 16GB)."""
    held, step = [], 256 * 1024 * 1024
    try:
        for i in range(64):
            held.append(jnp.zeros((step // 4,), jnp.int32))
            held[-1].block_until_ready()
    except Exception:
        pass
    n = len(held)
    del held
    gc.collect()
    return n * 0.25

n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
reads, _, _ = B.make_reads_placed(n, seed=B.SEED + 4)
print(f"free before: {free_hbm():.2f}GB", flush=True)
ov = TpuOverlapper()
t0 = time.perf_counter()
store = ov.sketch_reads(reads, defer_flags=True)
print(f"sketch {time.perf_counter()-t0:.0f}s rows={len(store)} "
      f"free: {free_hbm():.2f}GB", flush=True)
index = ov._build_index(store)
print(f"postings built; free: {free_hbm():.2f}GB", flush=True)
q_sel = np.nonzero(store.is_fwd)[0].astype(np.int32)
t0 = time.perf_counter()
ji = JV.JoinedIndex(index[1][0], index[1][1], store.dev("minhash"), q_sel)
print(f"stage A {time.perf_counter()-t0:.0f}s G={ji.G} "
      f"free: {free_hbm():.2f}GB", flush=True)
span, fb = ji.plan_span()
t0 = time.perf_counter()
cand = ji.build_candidates(span)
cand.block_until_ready()
print(f"stage B span={span} {time.perf_counter()-t0:.0f}s "
      f"free: {free_hbm():.2f}GB", flush=True)
t0 = time.perf_counter()
cand, over = ji.apply_residuals(cand, span)
cand.block_until_ready()
print(f"residuals {time.perf_counter()-t0:.0f}s free: {free_hbm():.2f}GB",
      flush=True)
lines = ov._find_matches_wide(index, store, np.nonzero(store.is_fwd)[0], True)
print(f"full find ok lines={len(lines)} free: {free_hbm():.2f}GB", flush=True)
