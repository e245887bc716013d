"""Batched greedy seeding vs the reference-exact naive engine."""

import os

import numpy as np
import pytest

from rowbowt_tpu.engine import naive
from rowbowt_tpu.engine.batch import encode_batch
from rowbowt_tpu.engine.device import DeviceIndex
from rowbowt_tpu.engine.seeds import (
    locate_from_longest_seed,
    markers_greedy_seeding,
    seeds_greedy_w_sample,
)

from conftest import REF_DATA


def _error_reads(idx, text, n, rng, minlen=20, maxlen=60, nerr=2):
    reads = []
    for _ in range(n):
        L = int(rng.integers(minlen, maxlen))
        p = int(rng.integers(0, len(text) - L - 1))
        r = text[p:p + L].copy()
        for _ in range(int(rng.integers(0, nerr + 1))):
            r[int(rng.integers(0, L))] = rng.choice(np.frombuffer(b"ACGT", np.uint8))
        reads.append(bytes(r))
    return reads


@pytest.fixture(scope="module")
def batch(rand_index):
    idx, text = rand_index
    rng = np.random.default_rng(7)
    reads = _error_reads(idx, text, 32, rng)
    return idx, reads


def test_seeds_greedy_w_sample(batch):
    idx, reads = batch
    dx = DeviceIndex.from_index(idx)
    qc, lens = encode_batch(idx, reads)
    S = 8
    slo, shi, sqs, sqe, ssamp, ns = map(
        np.asarray, seeds_greedy_w_sample(dx, qc, lens, min_length=5, max_seeds=S)
    )
    for b, r in enumerate(reads):
        codes = idx.alpha.encode(np.frombuffer(r, np.uint8)).astype(np.int64)
        want = naive.get_seeds_greedy_w_sample(idx, codes, min_length=5)
        assert ns[b] == len(want)
        for s, lfd in enumerate(want[:S]):
            assert (slo[b, s], shi[b, s]) == lfd.rn, (b, s)
            assert (sqs[b, s], sqe[b, s]) == (lfd.qstart, lfd.qend), (b, s)
            assert ssamp[b, s] == lfd.ssamp % (1 << 62), (b, s)


def test_locate_from_longest_seed(batch):
    idx, reads = batch
    dx = DeviceIndex.from_index(idx)
    qc, lens = encode_batch(idx, reads)
    res = seeds_greedy_w_sample(dx, qc, lens, min_length=5, max_seeds=8)
    locs, cnt = map(np.asarray, locate_from_longest_seed(dx, *res, max_hits=6))
    for b, r in enumerate(reads):
        codes = idx.alpha.encode(np.frombuffer(r, np.uint8)).astype(np.int64)
        lfs = naive.get_seeds_greedy_w_sample(idx, codes, min_length=5)
        want = naive.locate_from_longest_seed(idx, 6, lfs)
        assert [int(x) for x in locs[b, : cnt[b]]] == want, b


def _naive_seeds(idx, codes, wsize, max_range, use_ftab):
    out = []
    naive.get_markers_greedy_seeding(
        idx, codes, wsize, max_range,
        lambda rn, q, mk: out.append((tuple(rn), tuple(q), [int(x) for x in mk])),
        use_ftab=use_ftab,
    )
    return out


@pytest.mark.parametrize("use_ftab", [False, True])
def test_markers_greedy_seeding(tiny_index_ftab, use_ftab):
    idx = tiny_index_ftab
    rng = np.random.default_rng(3)
    # panel text reads (ACGT segments only)
    text = None
    from rowbowt_tpu.construct import build_panel  # noqa: F401  (fixture built it)
    # sample reads straight from indexed text rows via the naive engine's text
    # reconstruction is overkill — use random ACGT + known-marker-adjacent reads
    reads = []
    acgt = np.frombuffer(b"ACGT", np.uint8)
    for _ in range(24):
        L = int(rng.integers(15, 40))
        reads.append(bytes(rng.choice(acgt, size=L)))
    # add reads guaranteed to match: decode BWT rows back is complex; instead
    # use locate on random reads is fine — random 15-40mers rarely match, so
    # also pull substrings from the reference FASTA
    with open(os.path.join(REF_DATA, "small.fa")) as f:
        seq = "".join(l.strip() for l in f if not l.startswith(">"))
    for _ in range(24):
        L = int(rng.integers(15, 60))
        p = int(rng.integers(0, len(seq) - L))
        r = bytearray(seq[p:p + L].encode())
        if rng.random() < 0.6:
            r[int(rng.integers(0, L))] = int(rng.choice(acgt))
        reads.append(bytes(r))

    dx = DeviceIndex.from_index(idx)
    qc, lens = encode_batch(idx, reads)
    S, K = 8, 16
    wsize = 10
    slo, shi, sqs, sqe, mvals, mcnt, ns = map(
        np.asarray,
        markers_greedy_seeding(dx, qc, lens, wsize=wsize, max_seeds=S, max_k=K,
                               use_ftab=use_ftab),
    )
    for b, r in enumerate(reads):
        codes = idx.alpha.encode(np.frombuffer(r, np.uint8)).astype(np.int64)
        want = _naive_seeds(idx, codes, wsize, 1 << 62, use_ftab)
        assert ns[b] == len(want), (b, use_ftab)
        for s, (rn, q, mk) in enumerate(want[:S]):
            assert (slo[b, s], shi[b, s]) == rn, (b, s)
            # naive qend mirrors the reference's size_t wrap via Python ints;
            # the kernel stores it in the index dtype (wraps negative)
            assert sqs[b, s] == q[0], (b, s)
            assert sqe[b, s] == np.asarray(q[1]).astype(sqe.dtype), (b, s)
            got_m = [int(x) for x in mvals[b, s, : min(mcnt[b, s], K)]]
            assert got_m == mk[:K], (b, s)
            assert mcnt[b, s] == len(mk), (b, s)


def test_markers_lmem(tiny_index_ftab):
    from rowbowt_tpu.engine.seeds import lmem_expand, markers_lmem_lanes

    idx = tiny_index_ftab
    rng = np.random.default_rng(5)
    acgt = np.frombuffer(b"ACGT", np.uint8)
    with open(os.path.join(REF_DATA, "small.fa")) as f:
        seq = "".join(l.strip() for l in f if not l.startswith(">"))
    reads = []
    for _ in range(8):
        L = int(rng.integers(15, 30))
        p = int(rng.integers(0, len(seq) - L))
        r = bytearray(seq[p:p + L].encode())
        if rng.random() < 0.6:
            r[int(rng.integers(0, L))] = int(rng.choice(acgt))
        reads.append(bytes(r))

    lanes, owner, koff = lmem_expand(reads)
    dx = DeviceIndex.from_index(idx)
    qc, lens = encode_batch(idx, lanes)
    K = 16
    elo, ehi, eqs, mvals, mcnt = map(
        np.asarray, markers_lmem_lanes(dx, qc, lens, wsize=10, max_k=K)
    )
    for b, r in enumerate(reads):
        codes = idx.alpha.encode(np.frombuffer(r, np.uint8)).astype(np.int64)
        want = []
        naive.get_markers_lmems(
            idx, codes, 10, 1 << 62,
            lambda rn, q, mk: want.append((tuple(rn), tuple(q),
                                           [int(x) for x in mk])),
        )
        # keep only nonempty-range fn calls (out_fn contract)
        want = [w for w in want if w[0][1] >= w[0][0]]
        got = []
        for j in range(len(lanes)):
            if owner[j] != b:
                continue
            if ehi[j] >= elo[j]:
                mlane = len(lanes[j])
                got.append(((int(elo[j]), int(ehi[j])),
                            (int(eqs[j]), mlane - 1),
                            [int(v) for v in mvals[j, : min(int(mcnt[j]), K)]],
                            int(mcnt[j])))
        want = [(rn, q, mk[:K], len(mk)) for rn, q, mk in want]
        assert got == want, (b, got[:3], want[:3])


def test_toehold_chkpnts(batch):
    from rowbowt_tpu.engine.locate import find_ranges_w_toehold_chkpnts

    idx, reads = batch
    dx = DeviceIndex.from_index(idx)
    qc, lens = encode_batch(idx, reads)
    wsize = 7
    clo, chi, ck, cqs, cqe, ncp = map(
        np.asarray, find_ranges_w_toehold_chkpnts(dx, qc, lens, wsize=wsize)
    )
    C = clo.shape[1]
    for b, r in enumerate(reads):
        codes = idx.alpha.encode(np.frombuffer(r, np.uint8)).astype(np.int64)
        want = naive.find_range_w_toehold_chkpnts(idx, codes, wsize)
        assert ncp[b] == len(want), b
        for j, lfd in enumerate(want[:C]):
            assert (clo[b, j], chi[b, j]) == lfd.rn, (b, j)
            assert (cqs[b, j], cqe[b, j]) == (lfd.qstart, lfd.qend), (b, j)
            assert ck[b, j] == lfd.ssamp, (b, j)


def test_overlap_seeding_runs(tiny_index_ftab):
    """Overlap seeding (reference-disabled) at least runs and emits seeds on
    clean reads; livelock pathology raises instead of hanging."""
    idx = tiny_index_ftab
    with open(os.path.join(REF_DATA, "small.fa")) as f:
        seq = "".join(l.strip() for l in f if not l.startswith(">"))
    codes = idx.alpha.encode(
        np.frombuffer(seq[1000:1060].encode(), np.uint8)).astype(np.int64)
    out = []
    naive.get_markers_greedy_overlap_seeding(
        idx, codes, 10, 1 << 62, lambda rn, q, mk: out.append((rn, q, list(mk))))
    assert out and out[-1][1][0] == 0


def test_seeds_defer_k_min_length0_deviation_scope(batch):
    """Pins the ONE documented parity deviation of the deferred-toehold path
    (engine/seeds.py defer_k): under min_length=0 a seed record whose range is
    the degenerate full range (0, n-1) reports SA[n-1] (the freshly-reset
    toehold) where the reference reports the previous seed's stale sample
    (rowbowt.hpp:222-256).  Every non-degenerate record must still match the
    oracle exactly — the deviation's scope is exactly the full-range records."""
    idx, reads = batch
    dx = DeviceIndex.from_index(idx)
    qc, lens = encode_batch(idx, reads)
    S = 16
    n = idx.n
    slo, shi, sqs, sqe, ssamp, ns = map(
        np.asarray, seeds_greedy_w_sample(dx, qc, lens, min_length=0, max_seeds=S)
    )
    sa_last = int(idx.kval[n - 1])
    deviations = 0
    for b, r in enumerate(reads):
        codes = idx.alpha.encode(np.frombuffer(r, np.uint8)).astype(np.int64)
        want = naive.get_seeds_greedy_w_sample(idx, codes, min_length=0)
        assert ns[b] == len(want)
        for s, lfd in enumerate(want[:S]):
            assert (slo[b, s], shi[b, s]) == lfd.rn, (b, s)
            assert (sqs[b, s], sqe[b, s]) == (lfd.qstart, lfd.qend), (b, s)
            degenerate = lfd.rn == (0, n - 1)
            if degenerate:
                # deviation: ours is SA[n-1] by the toehold invariant
                assert ssamp[b, s] == sa_last, (b, s)
                if lfd.ssamp % (1 << 62) != sa_last:
                    deviations += 1
            else:
                assert ssamp[b, s] == lfd.ssamp % (1 << 62), (b, s)
    assert deviations >= 0  # scope check is the loop above
