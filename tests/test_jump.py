"""Property tests for the lfj run-jump fast path: find_ranges_jump lanes that
are not flagged broken must EXACTLY match find_ranges, and count_with_repair
must match find_ranges on every lane.  The fixture is pangenome-shaped (one
reference + near-identical haplotype copies) so ranges actually sit in single
BWT runs and the fast path is exercised (asserted below), not just bypassed."""

import numpy as np
import pytest

from rowbowt_tpu.alphabet import SEP_BYTE, TERM_BYTE
from rowbowt_tpu.construct.build import build_index
from rowbowt_tpu.engine.batch import encode_batch
from rowbowt_tpu.engine.count import count_with_repair, find_ranges, find_ranges_jump
from rowbowt_tpu.engine.device import DeviceIndex
from rowbowt_tpu.engine.locate import find_ranges_w_toehold, locate
from rowbowt_tpu.engine import naive


@pytest.fixture(scope="module")
def pan_index():
    rng = np.random.default_rng(7)
    acgt = np.frombuffer(b"ACGT", dtype=np.uint8)
    ref = rng.choice(acgt, size=3000)
    w = 10
    parts, pos = [], 0
    for h in range(4):  # ref + 3 haplotypes with sparse SNVs
        seq = ref.copy()
        if h:
            for p in rng.choice(3000, size=8, replace=False):
                seq[p] = acgt[rng.integers(4)]
        parts.append(seq)
        parts.append(np.full(w, SEP_BYTE, dtype=np.uint8))
        pos += 3000 + w
    parts.append(np.array([TERM_BYTE], dtype=np.uint8))
    text = np.concatenate(parts)
    return build_index(text, ftab_k=6), text


def _reads(idx, text, rng, n=48):
    acgt = np.frombuffer(b"ACGT", dtype=np.uint8)
    out = []
    for i in range(n):
        L = int(rng.choice([4, 8, 16, 26, 30, 46, 50, 63, 80]))
        p = int(rng.integers(0, len(text) - L - 1))
        r = text[p:p + L].copy()
        kind = i % 4
        if kind == 1:  # one substitution (usually empties the range mid-read)
            r[int(rng.integers(0, L))] = acgt[int(rng.integers(4))]
        elif kind == 2:  # embedded non-ACGT char
            r[int(rng.integers(0, L))] = ord("N")
        out.append(bytes(r))
    out.append(b"")  # empty read
    out.append(b"ACG")  # shorter than ftab k
    return out


@pytest.mark.parametrize("use_ftab", [True, False])
def test_jump_matches_slow(pan_index, use_ftab):
    idx, text = pan_index
    assert idx.lfj is not None
    dx = DeviceIndex.from_index(idx)
    rng = np.random.default_rng(3)
    reads = _reads(idx, text, rng)
    qc, lens = encode_batch(idx, reads)
    slo, shi = map(np.asarray, find_ranges(dx, qc, lens, use_ftab=use_ftab))
    jlo, jhi, broken, _jbrk = map(
        np.asarray, find_ranges_jump(dx, qc, lens, use_ftab=use_ftab)
    )
    ok = ~broken
    assert ok.sum() > len(reads) // 2  # the fast path must actually engage
    np.testing.assert_array_equal(jlo[ok], slo[ok])
    np.testing.assert_array_equal(jhi[ok], shi[ok])
    rlo, rhi = count_with_repair(dx, qc, lens, use_ftab=use_ftab)
    np.testing.assert_array_equal(rlo, slo)
    np.testing.assert_array_equal(rhi, shi)


def test_jump_matches_naive_and_toehold(pan_index):
    idx, text = pan_index
    dx = DeviceIndex.from_index(idx)
    rng = np.random.default_rng(11)
    reads = _reads(idx, text, rng, n=24)
    qc, lens = encode_batch(idx, reads)
    rlo, rhi = count_with_repair(dx, qc, lens)
    tlo, thi, k = map(np.asarray, find_ranges_w_toehold(dx, qc, lens))
    locs, cnt = map(np.asarray, locate(dx, tlo, thi, k, max_hits=6))
    for b, r in enumerate(reads):
        codes = idx.alpha.encode(np.frombuffer(r, np.uint8)).astype(np.int64)
        assert (rlo[b], rhi[b]) == naive.find_range(idx, codes)
        wrn, wk = naive.find_range_w_toehold(idx, codes)
        assert (tlo[b], thi[b]) == wrn
        if wrn[1] >= wrn[0]:
            assert k[b] == wk
            assert list(locs[b, : cnt[b]]) == naive.locate_range(idx, *wrn, wk, 6)


def test_jump_tiny_index(tiny_index_ftab):
    """Jump vs slow on the reference's own small.fa panel (3 near-identical
    docs, n/R~4 — a harsher run structure than the synthetic pangenome)."""
    idx = tiny_index_ftab
    dx = DeviceIndex.from_index(idx)
    rng = np.random.default_rng(5)
    from rowbowt_tpu.construct import build_panel  # noqa: F401  (fixture built upstream)

    # sample reads straight off the tiny index's own text via naive locate
    reads = []
    for _ in range(32):
        L = int(rng.choice([12, 20, 30, 41, 60]))
        reads.append(bytes(rng.choice(np.frombuffer(b"ACGT", np.uint8), size=L)))
    # also exact k-mers pulled from the ftab so some lanes are nonempty
    ft = idx.ftab
    hits = np.flatnonzero(ft[:, 0] >= 0)[:16]
    for code in hits:
        s = "".join("ACGT"[(int(code) >> (2 * (idx.ftab_k - 1 - t))) & 3]
                    for t in range(idx.ftab_k))
        reads.append(s.encode())
    qc, lens = encode_batch(idx, reads)
    slo, shi = map(np.asarray, find_ranges(dx, qc, lens))
    rlo, rhi = count_with_repair(dx, qc, lens)
    np.testing.assert_array_equal(rlo, slo)
    np.testing.assert_array_equal(rhi, shi)
