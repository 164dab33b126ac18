"""Stage-level profiler for the single-chip pipeline (run on TPU)."""
import time, numpy as np, sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench as B
reads = B.make_reads()
from mhap_tpu.pipeline.overlapper import TpuOverlapper
ov = TpuOverlapper(pair_chunk=2048)
ov.overlap_self(reads)  # warmup/compile
t0=time.perf_counter()
store = ov.sketch_reads(reads)
t1=time.perf_counter()
postings = ov.build_postings(store)
t2=time.perf_counter()
q_sel = np.nonzero(store.is_fwd)[0]
q_idx, cand, votes = ov.vote(postings, store.minhash[q_sel])
t3=time.perf_counter()
lines = ov._find_matches(store, postings, store, q_sel, True)
t4=time.perf_counter()
print(f"sketch {t1-t0:.2f}s postings {t2-t1:.2f}s vote {t3-t2:.2f}s find {t4-t3:.2f}s", flush=True)
print("sketches:", len(store), "vote pairs:", len(q_idx), "pairs>=3:", int((votes>=3).sum()), flush=True)
