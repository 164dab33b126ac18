"""The C bulk M4 formatter must be byte-identical to the Python
%-format path (impl/MatchResult.java:98-113 layout), including %.6f
rounding on exact binary tie values."""

import numpy as np

from mhap_tpu.utils.native import format_m4


def _python_lines(qid, cid, err, raw, qrc, a1, a2, ql, crc, b1, b2, cl):
    return ["%s %s %.6f %.6f %d %d %d %d %d %d %d %d" % t
            for t in zip([str(x) for x in qid.tolist()],
                         [str(x) for x in cid.tolist()],
                         err.tolist(), raw.tolist(), qrc.tolist(),
                         a1.tolist(), a2.tolist(), ql.tolist(),
                         crc.tolist(), b1.tolist(), b2.tolist(),
                         cl.tolist())]


def _compare(n, err, raw, rng):
    qid = rng.integers(1, 10 ** 7, n)
    cid = rng.integers(1, 10 ** 7, n)
    qrc = rng.integers(0, 2, n).astype(np.int32)
    crc = rng.integers(0, 2, n).astype(np.int32)
    a1 = rng.integers(0, 10 ** 5, n)
    a2 = rng.integers(0, 10 ** 5, n)
    ql = rng.integers(1, 10 ** 5, n)
    b1 = rng.integers(0, 10 ** 5, n)
    b2 = rng.integers(0, 10 ** 5, n)
    cl = rng.integers(1, 10 ** 5, n)
    got = format_m4(qid, cid, err, raw, qrc, a1, a2, ql, crc, b1, b2, cl)
    want = _python_lines(qid, cid, err, raw, qrc, a1, a2, ql, crc, b1,
                         b2, cl)
    assert got == want


def test_random_values_byte_identical():
    rng = np.random.default_rng(1)
    n = 50_000
    _compare(n, rng.random(n), (rng.random(n) * 500).round(0), rng)


def test_tie_and_edge_values():
    """Exact binary fractions whose decimal expansion ends at or past
    the 6th place (2^-k family) exercise the round-half-even tie path of
    both formatters; plus 0, 1, and subnormal-ish tinies."""
    rng = np.random.default_rng(2)
    specials = [0.0, 1.0, 0.5, 0.25, 0.0078125, 0.5 ** 10, 0.5 ** 20,
                0.5 ** 30, 1e-7, 4.9e-7, 5e-7, 1.5e-6, 0.9999995,
                0.00000049999999, 0.328125, 123.4567891]
    n = 4096
    err = np.asarray((specials * ((n // len(specials)) + 1))[:n])
    raw = err[::-1].copy()
    _compare(n, err, raw, rng)


def test_empty():
    z = np.zeros(0)
    zi = np.zeros(0, np.int64)
    z32 = np.zeros(0, np.int32)
    assert format_m4(zi, zi, z, z, z32, zi, zi, zi, z32, zi, zi, zi) == []


def test_pipeline_native_format_line_parity(synthetic_reads):
    """End-to-end: forcing the native formatter on a real run gives the
    same line list as the Python path."""
    from mhap_tpu.pipeline.overlapper import TpuOverlapper

    _, reads, _ = synthetic_reads
    reads = reads[:10]
    ref = TpuOverlapper(dict(num_hashes=128, ordered_sketch_size=512,
                             num_min_matches=2))
    want = ref.overlap_self(reads)
    ov = TpuOverlapper(dict(num_hashes=128, ordered_sketch_size=512,
                            num_min_matches=2))
    ov.NATIVE_FORMAT_MIN = 1
    got = ov.overlap_self(reads)
    assert got == want and len(got) > 0
