"""End-to-end overlap throughput benchmark (single chip).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Workload: self-overlap of synthetic noisy long reads (PacBio-like error
profile, ~11%) tiling a random genome, MHAP default settings (k=16,
512 min-hashes, 1536-entry ordered sketch, threshold 0.78) — the same
computation as `java -jar mhap.jar -s reads.fa` (reference
main/MhapMain.java defaults).

value        = reads overlapped per second, end-to-end (sketch + LSH vote +
               second-stage scoring + formatting), steady-state (2nd run;
               the 1st run pays XLA compiles).
vs_baseline  = value / baseline reads/s from bench_baseline.json.  The
               baseline is the bit-exact CPU oracle pipeline measured on
               this host (the reference jar cannot run here: no JVM in the
               image); it is a conservative stand-in for the Java
               reference, labeled in the JSON.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

N_READS = 1024
READ_LEN = 2900
GENOME_LEN = 480_000
SEED = 4242
ERR = 0.11

_BASELINE_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "bench_baseline.json")


def make_reads(n_reads=N_READS, read_len=READ_LEN, genome_len=GENOME_LEN,
               seed=SEED):
    rng = np.random.default_rng(seed)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    genome = rng.integers(0, 4, genome_len)
    reads = []
    for _ in range(n_reads):
        pos = int(rng.integers(0, genome_len - 2 * read_len))
        raw = genome[pos:pos + int(read_len * 1.15)]
        r = rng.random(len(raw))
        out = []
        for i, b in enumerate(raw):
            if r[i] < ERR * 0.4:
                out.append(b)
                out.append(int(rng.integers(0, 4)))
            elif r[i] < ERR * 0.7:
                pass
            elif r[i] < ERR:
                out.append(int(rng.integers(0, 4)))
            else:
                out.append(b)
            if len(out) >= read_len:
                break
        arr = np.asarray(out[:read_len], dtype=np.int64)
        reads.append(bytes(bases[arr]).decode("ascii"))
    return reads


def bench_device(reads):
    from mhap_tpu.pipeline.overlapper import TpuOverlapper

    ov = TpuOverlapper(pair_chunk=2048)
    t0 = time.perf_counter()
    lines = ov.overlap_self(reads)
    warm = time.perf_counter() - t0
    t0 = time.perf_counter()
    lines = ov.overlap_self(reads)
    steady = time.perf_counter() - t0
    return len(reads) / steady, len(lines), warm, steady


def bench_oracle(reads):
    from mhap_tpu.oracle.pipeline import overlap_self

    t0 = time.perf_counter()
    lines = overlap_self(reads)
    dt = time.perf_counter() - t0
    return len(reads) / dt, len(lines)


def bench_native(reads, threads=None):
    """Time the native multithreaded CPU pipeline (the Java-reference
    stand-in: same algorithm + data structures as the reference, compiled,
    all host cores; parity-tested in tests/test_native_cpu.py)."""
    import subprocess
    import tempfile

    repo = os.path.dirname(os.path.abspath(__file__))
    binary = os.path.join(repo, "native", "build", "mhap_cpu")
    if not os.path.exists(binary):
        subprocess.run(["make", "-C", os.path.join(repo, "native")],
                       check=True, capture_output=True)
    threads = threads or os.cpu_count()
    with tempfile.NamedTemporaryFile("w", suffix=".fa", delete=False) as f:
        for i, r in enumerate(reads):
            f.write(f">r{i}\n{r}\n")
        path = f.name
    try:
        t0 = time.perf_counter()
        out = subprocess.run(
            [binary, "-s", path, "--num-threads", str(threads)],
            capture_output=True, text=True, check=True)
        dt = time.perf_counter() - t0
    finally:
        os.unlink(path)
    return len(reads) / dt, len(out.stdout.strip().splitlines()), threads


def main():
    if "--make-baseline" in sys.argv:
        # the baseline is the native CPU pipeline at the SAME problem size
        # as the device run (reads/s is not size-invariant: candidate work
        # grows with coverage)
        reads = make_reads()
        rps, n_lines, threads = bench_native(reads)
        data = {"native_reads_per_s": rps, "n_reads": len(reads),
                "read_len": READ_LEN, "seed": SEED, "overlaps": n_lines,
                "threads": threads,
                "note": "native/mhap_cpu.cc: multithreaded C++ port of the "
                        "reference pipeline on all host cores (no JVM in "
                        "image; same algorithm + data structures as the "
                        "Java, parity-tested vs oracle + device)"}
        with open(_BASELINE_PATH, "w") as f:
            json.dump(data, f, indent=1)
        print(json.dumps(data))
        return

    reads = make_reads()
    rps, n_overlaps, warm, steady = bench_device(reads)
    base = None
    if os.path.exists(_BASELINE_PATH):
        with open(_BASELINE_PATH) as f:
            base = json.load(f).get("native_reads_per_s")
    vs = rps / base if base else None
    print(json.dumps({
        "metric": "reads_overlapped_per_s_per_chip",
        "value": round(rps, 3),
        "unit": "reads/s",
        "vs_baseline": round(vs, 3) if vs is not None else None,
        "detail": {"n_reads": len(reads), "read_len": READ_LEN,
                   "overlaps": n_overlaps, "warm_s": round(warm, 2),
                   "steady_s": round(steady, 2),
                   "baseline": "native C++ reference port, all host cores "
                               "(see bench_baseline.json)"},
    }))


if __name__ == "__main__":
    main()
