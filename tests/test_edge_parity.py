"""Edge-configuration parity: no-RC mode, min-store-length suppression
branches, fast/sensitive presets (different k2/sketch sizes)."""

import numpy as np
import pytest

from mhap_tpu.cli import main as cli
from mhap_tpu.oracle import pipeline as op
from mhap_tpu.pipeline.overlapper import TpuOverlapper


def write_fasta(path, reads):
    with open(path, "w") as f:
        for i, r in enumerate(reads):
            f.write(f">{i + 1}\n{r}\n")


def run_cli(argv, capsys):
    rc = cli.main(argv)
    captured = capsys.readouterr()
    assert rc == 0, captured.err
    return sorted(l for l in captured.out.splitlines() if l.strip())


def test_no_rc_device_vs_oracle_cli(synthetic_reads, tmp_path, capsys):
    genome, reads, positions = synthetic_reads
    from mhap_tpu.oracle.seq import reverse_complement

    mixed = reads[:5] + [reverse_complement(reads[1])]
    fa = tmp_path / "r.fa"
    write_fasta(fa, mixed)
    flags = ["--num-hashes", "128", "--ordered-sketch-size", "512",
             "--num-min-matches", "2", "--no-rc"]
    dev = run_cli(["-s", str(fa)] + flags, capsys)
    ora = run_cli(["-s", str(fa), "--backend", "oracle"] + flags, capsys)
    assert dev == ora
    # without RC, the reverse-complemented copy must NOT match read 2
    assert not any(set(l.split()[:2]) == {"6", "2"} for l in dev)
    # forward overlaps still found
    assert len(dev) > 0


def test_min_store_length_rules(synthetic_reads):
    """msl > 0 exercises the short/long suppression branches
    (MinHashSearch.java:199-225)."""
    genome, reads, positions = synthetic_reads
    mixed = [r[:1200] for r in reads[:4]] + [r[:3000] for r in reads[4:10]]
    cfg = dict(num_hashes=128, ordered_sketch_size=512, num_min_matches=2,
               min_store_length=2000)
    want = op.overlap_self(mixed, cfg)
    got = TpuOverlapper(cfg).overlap_self(mixed)
    assert got == want


@pytest.mark.parametrize("preset_cfg", [
    dict(num_hashes=256, threshold=0.80, ordered_sketch_size=1000,
         ordered_kmer_size=14),   # --settings 2 (fast)
    dict(num_hashes=768, threshold=0.73, ordered_sketch_size=1536,
         num_min_matches=2),      # --settings 3 (sensitive)
])
def test_preset_configs_device_vs_oracle(synthetic_reads, preset_cfg):
    genome, reads, positions = synthetic_reads
    sub = [r[:1500] for r in reads[:8]]
    want = op.overlap_self(sub, preset_cfg)
    got = TpuOverlapper(preset_cfg).overlap_self(sub)
    assert got == want
    assert len(want) > 0


def test_odd_kmer_sizes(synthetic_reads):
    """Odd k exercises the murmur3 single-char tail paths."""
    genome, reads, positions = synthetic_reads
    cfg = dict(kmer_size=15, ordered_kmer_size=11, num_hashes=64,
               ordered_sketch_size=256, num_min_matches=2)
    sub = [r[:1000] for r in reads[:6]]
    want = op.overlap_self(sub, cfg)
    got = TpuOverlapper(cfg).overlap_self(sub)
    assert got == want
