"""Stage-level profiler for the single-chip pipeline (run on TPU)."""
import time, numpy as np, sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench as B
reads = B.make_reads()
from mhap_tpu.pipeline.overlapper import TpuOverlapper
ov = TpuOverlapper(pair_chunk=2048)
ov.overlap_self(reads)  # warmup/compile

for trial in range(2):
    ov.stats = {k: 0 if not k.endswith("time") else 0.0
                for k in ov.stats}
    t0 = time.perf_counter()
    store = ov.sketch_reads(reads)
    t1 = time.perf_counter()
    index = ov._build_index(store)
    q_sel = np.nonzero(store.is_fwd)[0]
    t2 = time.perf_counter()
    q_idx, cand, votes, hits, distinct = ov._vote_dispatch(index, store, q_sel)
    t3 = time.perf_counter()
    # suppression (host numpy)
    qg = q_sel[q_idx]
    keepm = votes >= ov.cfg["num_min_matches"]
    keepm &= store.header_id[cand] > 0
    msl = ov.cfg["min_store_length"]
    q_hid = store.header_id[qg]; c_hid = store.header_id[cand]
    q_len = store.length[qg].astype(np.int64)
    c_len = store.length[cand].astype(np.int64)
    keepm &= c_hid != q_hid
    keepm &= ~((c_len < msl) & (q_len < msl))
    keepm &= ~((c_hid > q_hid) & (c_len >= msl) & (q_len >= msl))
    keepm &= ~((c_len < msl) & (q_len >= msl))
    qg, cand = qg[keepm], cand[keepm]
    t4 = time.perf_counter()
    score, raw, edges = ov.score_pairs(store, store, qg, cand)
    t5 = time.perf_counter()
    acc = score >= ov.cfg["threshold"]
    lines = ov._format(store, store, qg[acc], cand[acc],
                       score[acc], raw[acc], edges[acc])
    lines = sorted(lines)
    t6 = time.perf_counter()
    print(f"trial{trial}: sketch {t1-t0:.3f}s index {t2-t1:.3f}s "
          f"vote {t3-t2:.3f}s suppress {t4-t3:.3f}s score {t5-t4:.3f}s "
          f"format {t6-t5:.3f}s total {t6-t0:.3f}s", flush=True)
    print(f"  rows {len(store)} cand_pairs {len(q_idx)} scored {len(qg)} "
          f"lines {len(lines)} slow {ov.slow_pair_count}", flush=True)
