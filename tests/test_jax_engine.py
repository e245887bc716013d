"""Property tests: batched jax engines vs the reference-exact naive engine,
plus the golden fixture through the jax path."""

import numpy as np
import pytest

from rowbowt_tpu.engine import naive
from rowbowt_tpu.engine.batch import encode_batch
from rowbowt_tpu.engine.device import DeviceIndex
from rowbowt_tpu.engine.count import counts_from_ranges, find_ranges
from rowbowt_tpu.engine.locate import find_ranges_w_toehold, locate, resolve_docs
from rowbowt_tpu.engine.markers import find_ranges_w_markers, markers_for_ranges

from conftest import encode_query
from test_golden_tiny import SIMPLE_READS


def _random_queries(text, rng, nq=60):
    """Mix of exact substrings, mutated substrings, and random strings."""
    acgt = np.frombuffer(b"ACGT", dtype=np.uint8)
    out = []
    n = len(text)
    for _ in range(nq):
        kind = rng.integers(0, 3)
        L = int(rng.integers(3, 40))
        if kind < 2:
            p = int(rng.integers(0, n - L))
            q = text[p : p + L].copy()
            if kind == 1:  # inject mismatches
                for _ in range(int(rng.integers(1, 3))):
                    q[rng.integers(0, L)] = rng.choice(acgt)
        else:
            q = rng.choice(acgt, size=L)
        out.append(bytes(q))
    return out


def test_count_matches_naive(rand_index):
    idx, text = rand_index
    rng = np.random.default_rng(0)
    reads = _random_queries(text, rng)
    dx = DeviceIndex.from_index(idx)
    qc, lens = encode_batch(idx, reads)
    lo, hi = find_ranges(dx, qc, lens)
    lo, hi = np.asarray(lo), np.asarray(hi)
    for b, r in enumerate(reads):
        want = naive.find_range(idx, idx.alpha.encode(np.frombuffer(r, np.uint8)).astype(np.int64))
        assert (lo[b], hi[b]) == want, (b, r)


def test_toehold_matches_naive(rand_index):
    idx, text = rand_index
    rng = np.random.default_rng(1)
    reads = _random_queries(text, rng)
    dx = DeviceIndex.from_index(idx)
    qc, lens = encode_batch(idx, reads)
    lo, hi, k = find_ranges_w_toehold(dx, qc, lens)
    locs, cnt = locate(dx, lo, hi, k, max_hits=16)
    lo, hi, k, locs, cnt = map(np.asarray, (lo, hi, k, locs, cnt))
    for b, r in enumerate(reads):
        codes = idx.alpha.encode(np.frombuffer(r, np.uint8)).astype(np.int64)
        wrn, wk = naive.find_range_w_toehold(idx, codes)
        assert (lo[b], hi[b]) == wrn, (b, r)
        if wrn[1] >= wrn[0]:
            assert k[b] == wk
            wlocs = naive.locate_range(idx, wrn[0], wrn[1], wk, 16)
            assert list(locs[b, : cnt[b]]) == wlocs


def test_markers_match_naive(rand_index):
    idx, text = rand_index
    rng = np.random.default_rng(2)
    reads = [r for r in _random_queries(text, rng) if len(r) >= 7]
    dx = DeviceIndex.from_index(idx)
    qc, lens = encode_batch(idx, reads)
    K = 48
    lo, hi, buf, used, ovf = find_ranges_w_markers(dx, qc, lens, wsize=7,
                                                   max_range=1 << 40, max_k=K)
    lo, hi, buf, used, ovf = map(np.asarray, (lo, hi, buf, used, ovf))
    for b, r in enumerate(reads):
        codes = idx.alpha.encode(np.frombuffer(r, np.uint8)).astype(np.int64)
        lf = naive.find_range_w_markers(idx, codes, 7, 1 << 40)
        assert (lo[b], hi[b]) == lf.rn, (b, r)
        if not ovf[b]:
            got = list(buf[b, K - used[b]:])
            assert got == [int(x) for x in lf.markers], (b, r)


def test_golden_through_jax(tiny_index):
    dx = DeviceIndex.from_index(tiny_index)
    qc, lens = encode_batch(tiny_index, SIMPLE_READS)
    lo, hi = find_ranges(dx, qc, lens)
    cnt = counts_from_ranges(lo, hi)
    assert (np.asarray(lo)[0], np.asarray(hi)[0]) == (24279, 24280)
    assert list(np.asarray(cnt)) == [2, 1, 3, 3, 1, 2]

    lo, hi, k = find_ranges_w_toehold(dx, qc, lens)
    locs, nocc = locate(dx, lo, hi, k, max_hits=8)
    locs, nocc = np.asarray(locs), np.asarray(nocc)
    flat = [int(x) for b in range(len(SIMPLE_READS)) for x in locs[b, : nocc[b]]]
    assert flat == [20306, 286, 10296, 11897, 21907, 1887,
                    11897, 21907, 1887, 4644, 14654, 24664]

    # doc resolution
    d, off = resolve_docs(dx, locs[:1, :2])
    assert list(np.asarray(off)[0]) == [286, 286]
    assert tiny_index.doc_names[int(np.asarray(d)[0, 0])] == "ref_sample0_1"

    # markers (windowed golden, wsize=10)
    from rowbowt_tpu.index import marker_allele, marker_pos
    K = 16
    mlo, mhi, buf, used, ovf = find_ranges_w_markers(dx, qc, lens, wsize=10,
                                                     max_range=1 << 40, max_k=K)
    buf, used = np.asarray(buf), np.asarray(used)
    first = [int(buf[b, K - used[b]]) if used[b] else None for b in range(6)]
    assert marker_pos(first[0]) == 289 and marker_allele(first[0]) == 0
    assert marker_pos(first[1]) == 289 and marker_allele(first[1]) == 1
    assert first[2] is None and first[3] is None
    assert marker_pos(first[4]) == 4650 and marker_allele(first[4]) == 0
    assert marker_pos(first[5]) == 4650 and marker_allele(first[5]) == 1


def test_ftab_jax_path(tiny_index_ftab):
    idx = tiny_index_ftab
    dx = DeviceIndex.from_index(idx)
    reads = ["TTCGTCGTAA", "CCGCGGACAT", "GGCAGGCGGA", "GTATCGTGGAA", "TGGAGATATTG",
             "TATCTCCGCGATCTCCAACT"]
    qc, lens = encode_batch(idx, reads)
    lo, hi = find_ranges(dx, qc, lens, use_ftab=True)
    lo2, hi2 = find_ranges(dx, qc, lens, use_ftab=False)
    want = [(28942, 28944), (10673, 10675), (19418, 19423), (21142, 21144),
            (27180, 27182), (24279, 24280)]
    assert [(int(a), int(b)) for a, b in zip(np.asarray(lo), np.asarray(hi))] == want
    assert [(int(a), int(b)) for a, b in zip(np.asarray(lo2), np.asarray(hi2))] == want


def test_locate_ragged(rand_index):
    """Bucketed ragged locate: O(total) output, parity with the oracle's
    per-occurrence phi chain, huge-range lanes don't inflate small lanes."""
    from rowbowt_tpu.engine.locate import find_ranges_w_toehold, locate_ragged

    idx, text = rand_index
    dx = DeviceIndex.from_index(idx)
    # mixed batch: unique 20-mers, a repeated 4-mer, and a 1-mer (huge range)
    reads = [bytes(text[50:70]), bytes(text[400:420]), b"ACGT", b"A",
             b"ZZZZ"]  # last one: empty range
    qc, lens = encode_batch(idx, reads)
    lo, hi, k = find_ranges_w_toehold(dx, qc, lens)
    flat, offs = locate_ragged(dx, lo, hi, k)
    lo_h, hi_h, k_h = map(np.asarray, (lo, hi, k))
    sizes = np.where(hi_h >= lo_h, hi_h - lo_h + 1, 0)
    assert flat.shape[0] == sizes.sum()  # O(total hits), not O(B*max)
    np.testing.assert_array_equal(np.diff(offs), sizes)
    for b in range(len(reads)):
        want = naive.locate_range(idx, int(lo_h[b]), int(hi_h[b]), int(k_h[b]),
                                  int(sizes[b])) if sizes[b] else []
        np.testing.assert_array_equal(flat[offs[b]:offs[b + 1]], want, err_msg=str(b))
    # capped variant
    flat4, offs4 = locate_ragged(dx, lo, hi, k, max_hits=4)
    np.testing.assert_array_equal(np.diff(offs4), np.minimum(sizes, 4))
    for b in range(len(reads)):
        np.testing.assert_array_equal(
            flat4[offs4[b]:offs4[b + 1]], flat[offs[b]:offs[b] + min(int(sizes[b]), 4)])
