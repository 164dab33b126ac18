"""CLI + IO layer: flags/presets, FASTA/FASTQ parsing, .dat round-trip."""

import gzip
import io
import sys

import numpy as np
import pytest

from mhap_tpu.cli import main as cli
from mhap_tpu.io import datstore, fasta
from mhap_tpu.oracle import pipeline as op
from mhap_tpu.pipeline.overlapper import TpuOverlapper

CFG_FLAGS = ["--num-hashes", "128", "--ordered-sketch-size", "512",
             "--num-min-matches", "2"]
CFG = dict(num_hashes=128, ordered_sketch_size=512, num_min_matches=2)


def write_fasta(path, reads, headers=None):
    with open(path, "w") as f:
        for i, r in enumerate(reads):
            h = headers[i] if headers else f"read{i + 1}"
            f.write(f">{h}\n")
            for j in range(0, len(r), 70):
                f.write(r[j:j + 70] + "\n")


def run_cli(argv, capsys):
    rc = cli.main(argv)
    captured = capsys.readouterr()
    assert rc == 0, captured.err
    return [l for l in captured.out.splitlines() if l.strip()]


def test_cli_self_overlap_matches_oracle(synthetic_reads, tmp_path, capsys):
    genome, reads, positions = synthetic_reads
    fa = tmp_path / "reads.fa"
    write_fasta(fa, reads[:8])
    got = sorted(run_cli(["-s", str(fa)] + CFG_FLAGS, capsys))
    want = op.overlap_self(reads[:8], CFG)
    assert got == want


def test_cli_oracle_backend_same_output(synthetic_reads, tmp_path, capsys):
    genome, reads, positions = synthetic_reads
    fa = tmp_path / "reads.fa"
    write_fasta(fa, reads[:6])
    dev = sorted(run_cli(["-s", str(fa)] + CFG_FLAGS, capsys))
    ora = sorted(run_cli(["-s", str(fa), "--backend", "oracle"] + CFG_FLAGS,
                         capsys))
    assert dev == ora


def test_cli_sharded_backend_same_output(synthetic_reads, tmp_path,
                                         capsys):
    genome, reads, positions = synthetic_reads
    fa = tmp_path / "reads.fa"
    write_fasta(fa, reads[:6])
    ora = sorted(run_cli(["-s", str(fa), "--backend", "oracle"] + CFG_FLAGS,
                         capsys))
    shd = sorted(run_cli(["-s", str(fa), "--backend", "sharded"] + CFG_FLAGS,
                         capsys))
    assert shd == ora


def test_cli_query_mode(synthetic_reads, tmp_path, capsys):
    genome, reads, positions = synthetic_reads
    box_fa = tmp_path / "box.fa"
    q_fa = tmp_path / "q.fa"
    write_fasta(box_fa, reads[:8])
    write_fasta(q_fa, reads[8:12])
    got = sorted(run_cli(["-s", str(box_fa), "-q", str(q_fa)] + CFG_FLAGS,
                         capsys))
    want = op.overlap_query(reads[:8], reads[8:12], CFG)
    assert got == want


def test_cli_store_full_id(synthetic_reads, tmp_path, capsys):
    genome, reads, positions = synthetic_reads
    headers = [f"mol/{i}/0_{len(r)} extra comment" for i, r in
               enumerate(reads[:6])]
    fa = tmp_path / "reads.fa"
    write_fasta(fa, reads[:6], headers)
    got = run_cli(["-s", str(fa), "--store-full-id"] + CFG_FLAGS, capsys)
    toks = [h.split()[0] for h in headers]
    for l in got:
        p = l.split()
        assert p[0] in toks and p[1] in toks


def test_cli_presets(tmp_path, capsys):
    fa = tmp_path / "empty.fa"
    rng = np.random.default_rng(3)
    reads = ["".join(np.array(list("ACGT"))[rng.integers(0, 4, 500)])]
    write_fasta(fa, reads)
    out = run_cli(["-s", str(fa), "--settings", "2"], capsys)
    assert out == []  # single read, no overlaps; flags parsed + presets ok


def test_cli_dat_roundtrip(synthetic_reads, tmp_path, capsys):
    """Usage 2 (-p precompute) then -s box.dat resumes from sketches."""
    genome, reads, positions = synthetic_reads
    fa_dir = tmp_path / "fastas"
    dat_dir = tmp_path / "dats"
    fa_dir.mkdir()
    dat_dir.mkdir()
    write_fasta(fa_dir / "reads.fa", reads[:8])
    run_cli(["-p", str(fa_dir), "-q", str(dat_dir)] + CFG_FLAGS, capsys)
    assert (dat_dir / "reads.dat").exists()
    got = sorted(run_cli(["-s", str(dat_dir / "reads.dat")] + CFG_FLAGS,
                         capsys))
    want = op.overlap_self(reads[:8], CFG)
    assert got == want


def test_dat_binary_layout(synthetic_reads, tmp_path):
    """Byte-level check of the Java-compatible record framing."""
    import struct

    genome, reads, positions = synthetic_reads
    ov = TpuOverlapper(CFG)
    store = ov.sketch_reads(reads[:2])
    path = tmp_path / "x.dat"
    datstore.write_dat(str(path), store, ordered_kmer_size=12)
    data = path.read_bytes()
    is_fwd, blen = struct.unpack_from(">Bi", data, 0)
    assert is_fwd == 1
    payload = data[5:5 + blen]
    fwd, hid = struct.unpack_from(">Bq", payload, 0)
    assert fwd == 1 and hid == 1
    (hl,) = struct.unpack_from(">H", payload, 9)
    header = payload[11:11 + hl].decode()
    assert header == "1"
    p = 11 + hl
    (seq_len,) = struct.unpack_from(">i", payload, p)
    assert seq_len == len(reads[0])
    (nmh,) = struct.unpack_from(">i", payload, p + 4)
    assert nmh == CFG["num_hashes"]

    back = datstore.read_dat(str(path),
                             sketch_size=CFG["ordered_sketch_size"])
    np.testing.assert_array_equal(back.minhash, store.minhash)
    np.testing.assert_array_equal(back.ordered_h, store.ordered_h)
    np.testing.assert_array_equal(back.ordered_m, store.ordered_m)
    np.testing.assert_array_equal(back.num_kmers, store.num_kmers)
    assert back.headers == ["1", "1", "2", "2"]  # fwd+rev per read


def test_npz_roundtrip(synthetic_reads, tmp_path):
    genome, reads, positions = synthetic_reads
    ov = TpuOverlapper(CFG)
    store = ov.sketch_reads(reads[:3])
    path = tmp_path / "x.npz"
    datstore.write_npz(str(path), store)
    back = datstore.read_npz(str(path))
    np.testing.assert_array_equal(back.minhash, store.minhash)
    np.testing.assert_array_equal(back.ordered_p, store.ordered_p)
    assert list(back.header_id) == list(store.header_id)


def test_fasta_gz_and_fastq(tmp_path):
    rng = np.random.default_rng(5)
    reads = ["".join(np.array(list("ACGT"))[rng.integers(0, 4, 200)])
             for _ in range(3)]
    gz = tmp_path / "r.fa.gz"
    with gzip.open(gz, "wt") as f:
        for i, r in enumerate(reads):
            f.write(f">s{i} desc\n{r[:100].lower()}\n{r[100:]}\n")
    got = list(fasta.read_sequences(str(gz), store_full_id=True))
    assert [h for h, _ in got] == ["s0", "s1", "s2"]
    assert [s for _, s in got] == reads  # uppercased + joined

    fq = tmp_path / "r.fastq"
    with open(fq, "w") as f:
        for i, r in enumerate(reads):
            f.write(f"@q{i} x\n{r}\n+\n{'I' * len(r)}\n")
    got = list(fasta.read_sequences(str(fq), store_full_id=True))
    assert [h for h, _ in got] == ["q0", "q1", "q2"]
    assert [s for _, s in got] == reads


def test_fasta_suffix_whitelist(tmp_path):
    for name, ok in [("a.fa", True), ("a.fasta.gz", True), ("a.fna", True),
                     ("a.fastq", True), ("a.txt", False), ("a.dat", False)]:
        assert fasta.is_sequence_file(name) == ok, name


def test_cli_dat_query_file(synthetic_reads, tmp_path, capsys):
    """-q can point at precomputed .dat sketches (reference
    getSequenceHashStreamer handles .dat for both -s and -q)."""
    genome, reads, positions = synthetic_reads
    box, queries = reads[:8], reads[8:12]
    fa_dir = tmp_path / "qf"
    dat_dir = tmp_path / "qd"
    fa_dir.mkdir()
    dat_dir.mkdir()
    write_fasta(tmp_path / "box.fa", box)
    write_fasta(fa_dir / "queries.fa", queries)
    # precompute query sketches to .dat
    run_cli(["-p", str(fa_dir), "-q", str(dat_dir)] + CFG_FLAGS, capsys)
    got = sorted(run_cli(["-s", str(tmp_path / "box.fa"),
                          "-q", str(dat_dir / "queries.dat")] + CFG_FLAGS,
                         capsys))
    # reference semantics: .dat sketches carry their header STRINGS from
    # write time (SequenceSketch.fromByteStream reads the stored UTF
    # header; MatchResult displays getHeader()), so queries print their
    # original -p-time ids (1..4), not offset ones
    want = []
    for l in op.overlap_query(box, queries, CFG):
        p = l.split()
        if int(p[0]) > len(box):
            p[0] = str(int(p[0]) - len(box))
        want.append(" ".join(p))
    assert got == sorted(want)
