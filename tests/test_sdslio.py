"""Readers for the reference's sdsl-serialized binaries (.rbwt/.tsa).

Validation is self-contained: a correctly parsed .rbwt must invert (LF walk)
into a text whose suffix array regenerates the identical BWT, and the .tsa
run-boundary samples must equal (SA[boundary]-1) mod n of that recomputed SA
(the stored convention, toehold_sa.hpp:133-155).  This also covers the
committed fixtures that ship with no raw inputs (tests/greedy_seeding).
"""

import os

import numpy as np
import pytest

from rowbowt_tpu.construct import sdslio

REF_ROOT = os.environ.get("RBT_REFERENCE_ROOT", "/root/reference")
REF = f"{REF_ROOT}/tests/data"
GREEDY = f"{REF_ROOT}/tests/greedy_seeding"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF),
    reason="reference checkout not found (set RBT_REFERENCE_ROOT)",
)


def _invert_bwt(bwt: np.ndarray) -> np.ndarray:
    """Text (terminator last) from its BWT via the LF walk."""
    n = bwt.shape[0]
    order = np.argsort(bwt, kind="stable")
    lf = np.empty(n, dtype=np.int64)
    lf[order] = np.arange(n)
    text = np.empty(n, dtype=np.uint8)
    i = 0
    for k in range(n):
        text[n - 1 - k] = bwt[i]
        i = lf[i]
    tpos = int(np.flatnonzero(text == 1)[0])
    return np.roll(text, -tpos - 1)


@pytest.mark.parametrize("prefix,exp_n,exp_r", [
    (f"{REF}/small.fa", 30031, 7573),
    (f"{GREEDY}/ref.fa", 20047, 14949),
])
def test_rbwt_tsa_roundtrip(prefix, exp_n, exp_r):
    from rowbowt_tpu.construct.sa import suffix_array

    bwt = sdslio.load_rbwt(prefix + ".rbwt")
    n = bwt.shape[0]
    starts = np.flatnonzero(np.concatenate([[True], bwt[1:] != bwt[:-1]]))
    assert (n, starts.shape[0]) == (exp_n, exp_r)

    text = _invert_bwt(bwt)
    sa = suffix_array(text)
    assert np.array_equal(text[(sa - 1) % n], bwt), "text SA != loaded BWT"

    ssa, esa = sdslio.load_tsa(prefix + ".tsa", expect_n=n)
    ends = np.concatenate([starts[1:] - 1, [n - 1]])
    assert np.array_equal(ssa, (sa[starts] - 1) % n)
    assert np.array_equal(esa, (sa[ends] - 1) % n)


def test_greedy_seeding_fixture_locate():
    """tests/greedy_seeding loads end-to-end: greedy seeds + longest-seed
    locate recover the unique text occurrence for the exact read and the
    1-mismatch read (the reference ships this fixture with no raw inputs and
    no automated goldens; the position is verified against the text
    reconstructed from the index itself)."""
    from rowbowt_tpu.engine import naive

    idx = sdslio.load_serialized_index(f"{GREEDY}/ref.fa")
    assert idx.doc_names == ["greedy_seeding"]
    text = _invert_bwt(sdslio.load_rbwt(f"{GREEDY}/ref.fa.rbwt"))

    good = b"GCTTCAATTTATGGAGTATGCACCAATTCTATGATC"   # @1019_good
    mut = b"GCTTCAATTTCTGGAGTATGCACCAATTCTATGATC"    # @1019_10 (pos 10: A->C)
    pos = bytes(text).find(good)
    assert pos >= 0 and bytes(text).find(good, pos + 1) < 0

    def enc(s):
        return idx.alpha.encode(np.frombuffer(s, np.uint8)).astype(np.int64)

    lo, hi = naive.find_range(idx, enc(good))
    assert hi - lo + 1 == 1
    for read in (good, mut):
        seeds = naive.get_seeds_greedy_w_sample(idx, enc(read), 10)
        assert naive.locate_from_longest_seed(idx, 4, seeds) == [pos]


def test_mab_marker_golden():
    """Marker goldens (rb_tests.cpp:123-141) on an index whose markers were
    LOADED from the reference's serialized .mab — not rebuilt from the VCF.
    Validates the reverse-engineered MarkerArray layout end to end
    (rowbowt_io.hpp:60-63; query path rowbowt.hpp:282-290)."""
    from rowbowt_tpu.engine import naive
    from rowbowt_tpu.index import marker_allele, marker_pos

    idx = sdslio.load_serialized_index(f"{REF}/small.fa")
    assert idx.ma_row is not None and idx.ma_wsize == 10
    assert idx.ma_row.shape[0] == 300  # 190 ranges expanded per-row

    def enc(s):
        return idx.alpha.encode(np.frombuffer(s.encode(), np.uint8)).astype(np.int64)

    reads = ["TATCTCCGCGATCTCCAACT", "TATATCCGCGATCTCCAACT",
             "TGGGCTCAAAACCATGGGAT", "TGGGCTCAAAACCATGGGAT",
             "GCCAGCAAGTCATGTCTAAT", "GCCAGCTAGTCATGTCTAAT"]
    lfs = [naive.find_range_w_markers(idx, enc(s), 10, (1 << 62)) for s in reads]
    assert marker_pos(lfs[0].markers[0]) == 289 and marker_allele(lfs[0].markers[0]) == 0
    assert marker_pos(lfs[1].markers[0]) == 289 and marker_allele(lfs[1].markers[0]) == 1
    assert len(lfs[2].markers) == 0 and len(lfs[3].markers) == 0
    assert marker_pos(lfs[4].markers[0]) == 4650 and marker_allele(lfs[4].markers[0]) == 0
    assert marker_pos(lfs[5].markers[0]) == 4650 and marker_allele(lfs[5].markers[0]) == 1


def test_mab_matches_vcf_rebuild(tiny_index):
    """Every marker VALUE in the .mab equals the VCF-rebuilt marker array;
    row ranges agree except the documented stale-fixture shift (the committed
    .mab predates the committed .rbwt's text layout in the low-row region —
    166/190 ranges land on identical rows, all 190 carry identical values)."""
    ma_row, ma_val, wsize = sdslio.load_mab(f"{REF}/small.fa.mab")
    assert wsize == 10
    assert np.array_equal(np.sort(ma_val), np.sort(tiny_index.ma_val))
    same = np.intersect1d(
        np.unique(ma_row), np.unique(tiny_index.ma_row)).shape[0]
    assert same >= 250  # 300 rows, stale shift affects < 50


def test_serialized_matches_batched_engine():
    """The jax batched count engine over a serialized-loaded index agrees
    with the scalar oracle on random in-text reads."""
    from rowbowt_tpu.engine import naive
    from rowbowt_tpu.engine.batch import encode_batch
    from rowbowt_tpu.engine.count import find_ranges
    from rowbowt_tpu.engine.device import DeviceIndex

    idx = sdslio.load_serialized_index(f"{GREEDY}/ref.fa", ftab_k=4)
    text = _invert_bwt(sdslio.load_rbwt(f"{GREEDY}/ref.fa.rbwt"))
    rng = np.random.default_rng(7)
    reads = []
    for _ in range(32):
        s = int(rng.integers(0, idx.n - 30))
        reads.append(bytes(text[s:s + 25]).decode("latin1"))
    qc, lens = encode_batch(idx, reads)
    dx = DeviceIndex.from_index(idx)
    lo, hi = (np.asarray(x) for x in find_ranges(dx, qc, lens))
    for i, r in enumerate(reads):
        enc = idx.alpha.encode(np.frombuffer(r.encode("latin1"), np.uint8))
        exp = naive.find_range(idx, enc.astype(np.int64))
        assert (int(lo[i]), int(hi[i])) == exp, r
