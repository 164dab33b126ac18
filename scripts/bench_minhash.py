"""Microbenchmark: minhash min-reduce variants on the real TPU.

Usage: python scripts/bench_minhash.py [variant ...]
Variants: scan pallas pallas1  (default: all)
"""
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

from mhap_tpu.ops import minhash as M
from mhap_tpu.ops import minhash_pallas as MP

B, n, H = 256, 2944, 512
rng = np.random.default_rng(0)
hi = jnp.asarray(rng.integers(0, 2**32, (B, n), dtype=np.uint64).astype(np.uint32))
lo = jnp.asarray(rng.integers(0, 2**32, (B, n), dtype=np.uint64).astype(np.uint32))
w = jnp.asarray(np.minimum(rng.geometric(0.9, (B, n)), 4).astype(np.int32))
act = jnp.asarray(rng.random((B, n)) < 0.95)
tb = jnp.asarray(np.arange(n, dtype=np.int32)[None].repeat(B, 0))


def timeit(name, fn, reps=3):
    out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
        jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:>28}: {dt*1000:9.1f} ms/call  ({dt*8*1000:.0f} ms per 2048 rows)",
          flush=True)
    return out


variants = sys.argv[1:] or ["scan", "pallas", "pallas1"]

if "scan" in variants:
    timeit("scan w_max=4", lambda: M.weighted_min_reduce(
        hi, lo, w, act, tb, num_hashes=H, w_max=4))
if "pallas" in variants:
    timeit("pallas w_max=4", lambda: MP.weighted_min_reduce_pallas(
        hi, lo, w, act, tb, num_hashes=H, w_max=4))
if "pallas1" in variants:
    w1 = jnp.ones_like(w)
    timeit("pallas w_max=1", lambda: MP.weighted_min_reduce_pallas(
        hi, lo, w1, act, tb, num_hashes=H, w_max=1))
