"""Does the remote compile server process requests concurrently?

Compiles FRESH sketch-chunk programs (distinct bucket widths, never
seen by this process) sequentially vs. from worker threads, and prints
both wall times.  If threading wins ~Nx, the sketch warm path should
precompile its bucket shapes in parallel (VERDICT r4 item 5).
"""

import sys
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from mhap_tpu.pipeline.overlapper import _sketch_packed_rc_jit

K1, K2, H, S = 16, 12, 512, 1536
R2 = 128


def compile_one(wlen, cap):
    packed = jnp.zeros((R2, wlen // 4), jnp.uint8)
    lens = jnp.full((R2,), np.int32(wlen // 2))
    out = _sketch_packed_rc_jit(packed, lens, 0, K1, K2, H, S, cap, R2)
    jax.block_until_ready(out["minhash"])


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "both"
    # widths unseen by any bench run (odd 512-multiples)
    seq_shapes = [(2560, 1), (4608, 1)]
    par_shapes = [(5632, 1), (6656, 1)]
    if mode in ("both", "seq"):
        t0 = time.perf_counter()
        for w, c in seq_shapes:
            t1 = time.perf_counter()
            compile_one(w, c)
            print(f"seq {w}: {time.perf_counter() - t1:.1f}s", flush=True)
        print(f"SEQ total: {time.perf_counter() - t0:.1f}s", flush=True)
    if mode in ("both", "par"):
        t0 = time.perf_counter()
        with ThreadPoolExecutor(4) as ex:
            futs = [ex.submit(compile_one, w, c) for w, c in par_shapes]
            for f in futs:
                f.result()
        print(f"PAR total ({len(par_shapes)} shapes): "
              f"{time.perf_counter() - t0:.1f}s", flush=True)


if __name__ == "__main__":
    main()
