"""Device postings index vs the exact host vote."""

import numpy as np
import pytest

from mhap_tpu.index.postings import build_postings_device, vote_device
from mhap_tpu.pipeline.overlapper import TpuOverlapper

CFG = dict(num_hashes=64, ordered_sketch_size=256, num_min_matches=2)


@pytest.fixture(scope="module")
def store(synthetic_reads):
    genome, reads, positions = synthetic_reads
    return TpuOverlapper(CFG).sketch_reads([r[:1500] for r in reads[:12]])


def test_vote_device_matches_host(store):
    vals, sids = build_postings_device(store.minhash)
    q_sel = np.nonzero(store.is_fwd)[0]
    out = {k: np.asarray(v) for k, v in vote_device(
        vals, sids, store.minhash[q_sel], span_cap=32, top_k=64,
        min_matches=CFG["num_min_matches"]).items()}
    assert out["overflow"].max() == 0

    postings = TpuOverlapper.build_postings(store)
    q_idx, cand, votes = TpuOverlapper.vote(postings, store.minhash[q_sel])
    keep = votes >= CFG["num_min_matches"]
    want = {}
    for q, c, v in zip(q_idx[keep], cand[keep], votes[keep]):
        want.setdefault(int(q), {})[int(c)] = int(v)
    got = {}
    for qi in range(len(q_sel)):
        for t in range(64):
            if out["votes"][qi, t] > 0:
                got.setdefault(qi, {})[int(out["cand"][qi, t])] = \
                    int(out["votes"][qi, t])
    assert got == want


def test_vote_device_overflow_detection(store):
    """span_cap=1 must truncate heavy buckets and report overflow."""
    vals, sids = build_postings_device(store.minhash)
    q_sel = np.nonzero(store.is_fwd)[0]
    out = {k: np.asarray(v) for k, v in vote_device(
        vals, sids, store.minhash[q_sel], span_cap=1, top_k=64,
        min_matches=1).items()}
    # every query hits its own postings (self-votes), spans of >=2 exist
    # for overlapping reads -> overflow must trigger somewhere
    assert out["overflow"].sum() > 0


def test_pipeline_device_vote_parity(synthetic_reads):
    """Pipeline with device_vote=True emits the same line set."""
    from mhap_tpu.oracle import pipeline as op

    genome, reads, positions = synthetic_reads
    sub = [r[:1500] for r in reads[:10]]
    cfg = dict(num_hashes=64, ordered_sketch_size=256, num_min_matches=2)
    want = op.overlap_self(sub, cfg)
    ov = TpuOverlapper(cfg)
    ov.device_vote = True
    got = ov.overlap_self(sub)
    assert got == want


def test_vote_ladder_escalation_repeats(synthetic_reads):
    """Repeat-heavy reads force big postings spans; the recursive
    escalation ladder (shrinking query chunks, growing span caps) must
    still produce the exact host-vote result set."""
    import numpy as np

    from mhap_tpu.oracle import pipeline as op

    genome, reads, positions = synthetic_reads
    # implant a shared repeat into every read so one minmer bucket spans
    # most of the store
    motif = reads[0][100:400]
    rep_reads = [r[:500] + motif + r[500:1100] for r in reads[:10]]
    cfg = dict(op.DEFAULTS, num_hashes=64, ordered_sketch_size=256,
               num_min_matches=2)
    ov = TpuOverlapper(cfg)
    ov.device_vote = True
    ov.VOTE_LADDER = ((2, 4), (4, 8), (8, 16))  # tiny caps -> escalate
    ov.VOTE_CHUNK = 8
    got = sorted(ov.overlap_self(rep_reads))
    want = op.overlap_self(rep_reads, cfg)
    assert got == want
    assert len(got) > 0
