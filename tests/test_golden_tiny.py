"""Golden-value tests against the reference's committed tiny fixture.

Expected values come from /root/reference/tests/rb_tests.cpp (Count/Locate/
Marker/GreedyLocate/FTab testers) and the .rbwt header (n=30031, R=7573).
The index is rebuilt from small.fa + small.fa.vcf.gz by our own construction
pipeline — matching these constants validates text layout, suffix array, BWT,
toehold SA, phi, and marker semantics end to end.
"""

import numpy as np
import pytest

from rowbowt_tpu.engine import naive
from rowbowt_tpu.index import marker_allele, marker_pos

from conftest import encode_query

SIMPLE_READS = [
    "TATCTCCGCGATCTCCAACT",  # r1.ref
    "TATATCCGCGATCTCCAACT",  # r1.sample0.0
    "TGGGCTCAAAACCATGGGAT",  # r2.ref
    "TGGGCTCAAAACCATGGGAT",  # r2.sample0.0
    "GCCAGCAAGTCATGTCTAAT",  # r3.ref
    "GCCAGCTAGTCATGTCTAAT",  # r3.sample0.0
]

ERROR_READS = [
    "TATCGCCGCGATCTCCAACT",
    "TATATCCGCGATATCCAACT",
    "TGGGCTCAAAACCATGGGAT",
    "TGGGCTCAAAACCATGGGAT",
    "GCCGGCAAGTCATGTGTAAT",
    "GCCGGCTAGGCATGTCTAAT",
]


def test_header_constants(tiny_index):
    # header bytes of small.fa.rbwt: n=30031 R=7573
    assert tiny_index.n == 30031
    assert tiny_index.R == 7573


def test_count_golden(tiny_index):
    # first value is the live assertion in rb_tests.cpp:115; the rest are the
    # commented-out expectations at rb_tests.cpp:116-120, which we also match.
    want = [(24279, 24280), (24175, 24175), (27430, 27432),
            (27430, 27432), (17409, 17409), (17416, 17417)]
    for s, w in zip(SIMPLE_READS, want):
        assert naive.find_range(tiny_index, encode_query(tiny_index, s)) == w


def test_locate_golden(tiny_index):
    # rb_tests.cpp LocateTester: 12 golden positions, toehold-first order
    all_locs = []
    for s in SIMPLE_READS:
        rn, k = naive.find_range_w_toehold(tiny_index, encode_query(tiny_index, s))
        all_locs += naive.locate_range(tiny_index, rn[0], rn[1], k, (1 << 63))
    assert all_locs == [20306, 286, 10296, 11897, 21907, 1887,
                        11897, 21907, 1887, 4644, 14654, 24664]


def test_marker_golden(tiny_index):
    lfs = [naive.find_range_w_markers(tiny_index, encode_query(tiny_index, s), 10, (1 << 62))
           for s in SIMPLE_READS]
    assert marker_pos(lfs[0].markers[0]) == 289 and marker_allele(lfs[0].markers[0]) == 0
    assert marker_pos(lfs[1].markers[0]) == 289 and marker_allele(lfs[1].markers[0]) == 1
    assert len(lfs[2].markers) == 0
    assert len(lfs[3].markers) == 0
    assert marker_pos(lfs[4].markers[0]) == 4650 and marker_allele(lfs[4].markers[0]) == 0
    assert marker_pos(lfs[5].markers[0]) == 4650 and marker_allele(lfs[5].markers[0]) == 1


def test_greedy_locate_golden(tiny_index):
    # rb_tests.cpp GreedyLocateTester (error_query.fq, min_length=10)
    all_locs = []
    for s in ERROR_READS:
        lfs = naive.get_seeds_greedy_w_sample(tiny_index, encode_query(tiny_index, s), 10)
        all_locs.append(naive.locate_from_longest_seed(tiny_index, (1 << 63), lfs))
    assert all_locs[0] == [10296, 20306, 286]
    assert all_locs[1] == [10296]
    assert all_locs[2][:3] == [11897, 21907, 1887]
    assert all_locs[3][:3] == [11897, 21907, 1887]
    assert all_locs[4] == []
    # the reference test only asserts elements [0] and [1] here (rb_tests.cpp:94-95)
    assert all_locs[5][:2] == [14654, 4644]


@pytest.mark.slow
def test_ftab_golden(tiny_index_ftab):
    idx = tiny_index_ftab
    for q, want in [
        ("TTCGTCGTAA", (28942, 28944)),
        ("CCGCGGACAT", (10673, 10675)),
        ("GGCAGGCGGA", (19418, 19423)),
        ("TATCGTGGAA", (24272, 24274)),
        ("GTATCGTGGAA", (21142, 21144)),
        ("GGAGATATTG", (19097, 19099)),
        ("TGGAGATATTG", (27180, 27182)),
    ]:
        assert naive.find_range(idx, encode_query(idx, q)) == want


def test_doclist(tiny_index):
    name, off = naive.resolve_offset(tiny_index, 286)
    assert name == "ref" and off == 286
    name, off = naive.resolve_offset(tiny_index, 10296)
    assert off == 286


def test_get_seeds_greedy_plain(tiny_index):
    """Plain greedy seeds (no toehold): tail seed pushed unconditionally."""
    from rowbowt_tpu.engine import naive

    idx = tiny_index
    codes = np.full(7, 2, dtype=np.int64)  # short poly-A-ish junk read
    out = naive.get_seeds_greedy(idx, codes, min_length=100)
    assert out and out[-1].qstart == 0  # unconditional tail (rowbowt.hpp:212)
    out2 = naive.get_seeds_greedy_w_sample(idx, codes, min_length=100)
    assert out2 == []  # the _w_sample variant gates the tail


def test_dual_backend_fbb_analog(tiny_panel):
    """The reference runs its golden suite over BOTH backends
    (testing::Types<rle_string_sd, fbb_string>, rb_tests.cpp:292-304), with
    locate SFINAE-stubbed for fbb (no select).  Mirror: build the rank-only
    -x index (no toehold SA) and require Count + Marker golden parity; assert
    locate is genuinely unavailable; record the memory saving.
    """
    import jax.numpy as jnp

    from rowbowt_tpu.construct.build import build_index_from_panel
    from rowbowt_tpu.engine.count import find_ranges
    from rowbowt_tpu.engine.device import DeviceIndex
    from rowbowt_tpu.engine.markers import markers_for_ranges

    full = build_index_from_panel(tiny_panel)
    fbb = build_index_from_panel(tiny_panel, with_sa_samples=False)
    assert fbb.samples_last is None and fbb.kval is None and fbb.phi1 is None

    def nbytes(ix):
        return sum(getattr(ix, f).nbytes for f in (
            "run_start", "run_head", "occ", "F", "cruns_flat", "cruns_off",
            "samples_last", "pred_pos", "pred_to_run", "ltk", "ma_row",
            "ma_val", "ma_start1", "fblock", "kval", "phi1")
            if getattr(ix, f) is not None)

    assert nbytes(fbb) < 0.6 * nbytes(full)  # rank-only is the smaller index

    dx = DeviceIndex.from_index(fbb)
    assert "samples_last" not in dx.arrays  # locate support truly absent
    qc = np.stack([np.pad(encode_query(fbb, s), (0, 0)) for s in SIMPLE_READS])
    lens = np.full(len(SIMPLE_READS), len(SIMPLE_READS[0]), np.int32)
    lo, hi = find_ranges(dx, jnp.asarray(qc.astype(np.int32)), jnp.asarray(lens))
    want = [(24279, 24280), (24175, 24175), (27430, 27432),
            (27430, 27432), (17409, 17409), (17416, 17417)]
    assert [(int(a), int(b)) for a, b in zip(np.asarray(lo), np.asarray(hi))] == want

    # Marker golden (rb_tests.cpp:123-141): pos 289 allele 0 / allele 1, then
    # pos 4650 — queried over the final ranges, like rb_align -m
    mv, mc = markers_for_ranges(dx, lo, hi, max_k=8)
    mv, mc = np.asarray(mv), np.asarray(mc)
    got = [sorted({(int(p), int(a)) for p, a in
                   zip(marker_pos(mv[i, :mc[i]]), marker_allele(mv[i, :mc[i]]))})
           for i in range(len(SIMPLE_READS))]
    assert got[0] == [(289, 0)]
    assert got[1] == [(289, 1)]
    assert got[2] == got[3] == []
    assert got[4] == [(4650, 0)]
    assert got[5] == [(4650, 1)]
