"""Steady-state stage profile of the 100k wide path (MHAP_WIDE_PROFILE=1).

Run: MHAP_WIDE_PROFILE=1 python scripts/profile_wide100k.py [n_reads]
Prints per-stage [wprof] lines for the warm run and two steady runs.
NOTE: the profiling blocks serialize the dispatch pipeline, so totals
here are UPPER bounds on production steady time.
"""
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import bench as B
from mhap_tpu.pipeline.overlapper import TpuOverlapper

n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
reads, _, _ = B.make_reads_placed(n, seed=B.SEED + 4)
print(f"reads ready: {n}", flush=True)
ov = TpuOverlapper()
t0 = time.perf_counter()
lines = ov.overlap_self(reads)
print(f"WARM total {time.perf_counter() - t0:.1f}s "
      f"lines={len(lines)}", flush=True)
for it in range(2):
    t0 = time.perf_counter()
    lines = ov.overlap_self(reads)
    print(f"STEADY[{it}] total {time.perf_counter() - t0:.1f}s "
          f"lines={len(lines)}", flush=True)
