"""Raw pfbwt-f format round-trip: panel-built index -> .bwt/.ssa/.esa/.docs ->
rebuilt index must match on every table the query engines read."""

import numpy as np

from rowbowt_tpu.construct.rawio import build_index_from_raw, write_raw
from rowbowt_tpu.engine import naive


def test_raw_roundtrip(tiny_index, tmp_path):
    idx = tiny_index
    prefix = str(tmp_path / "small")
    write_raw(idx, prefix)
    idx2 = build_index_from_raw(prefix)

    assert idx2.n == idx.n and idx2.R == idx.R
    np.testing.assert_array_equal(idx2.alpha.bytes_, idx.alpha.bytes_)
    for name in ("run_start", "run_head", "occ", "F", "samples_last",
                 "pred_pos", "pred_to_run", "ltk", "fblock"):
        np.testing.assert_array_equal(getattr(idx2, name), getattr(idx, name),
                                      err_msg=name)
    # raw builds (no full SA -> no kval) keep the occ1+tk1 per-step toehold
    # fast path; panel builds dropped occ1 in favor of fblock
    from rowbowt_tpu.construct.build import build_occ1

    run_len0 = np.diff(np.append(idx.run_start, idx.n))
    codes0 = np.repeat(idx.run_head.astype(np.int64), run_len0)
    assert idx.occ1 is None
    np.testing.assert_array_equal(idx2.occ1, build_occ1(codes0, idx.alpha.size))
    assert idx2.doc_names == idx.doc_names
    np.testing.assert_array_equal(idx2.doc_starts, idx.doc_starts)
    # full-SA builds carry kval (SA[i]; toehold == SA[hi]); raw builds fall
    # back to tk1 (run-boundary samples only).  tk1[c, i] must equal
    # (SA[j]+n-1)%n for the last j<=i with BWT[j]==c wherever BWT[i] != c —
    # the only positions tk1's kernel consults.
    run_len = np.diff(np.append(idx.run_start, idx.n))
    codes = np.repeat(idx.run_head.astype(np.int64), run_len)
    assert idx.kval is not None and idx2.tk1 is not None
    vals = (idx.kval.astype(np.int64) + idx.n - 1) % idx.n
    pos = np.arange(idx.n, dtype=np.int64)
    for c in range(idx.alpha.size):
        ff = np.maximum.accumulate(np.where(codes == c, pos, -1))
        expect = vals[np.maximum(ff, 0)] * (ff >= 0)
        used = codes != c
        np.testing.assert_array_equal(idx2.tk1[c][used], expect[used])


def test_raw_rebuild_queries(tiny_index, tmp_path):
    idx = tiny_index
    prefix = str(tmp_path / "small")
    write_raw(idx, prefix)
    idx2 = build_index_from_raw(prefix)
    q = "TATCTCCGCGATCTCCAACT"
    codes = idx2.alpha.encode(np.frombuffer(q.encode(), np.uint8)).astype(np.int64)
    assert naive.find_range(idx2, codes) == (24279, 24280)
    rn, k = naive.find_range_w_toehold(idx2, codes)
    assert naive.locate_range(idx2, *rn, k, 8) == [20306, 286]


def test_ftab_text_roundtrip(tiny_index_ftab, tmp_path):
    """Reference text-ftab interop ("kmer s e" lines, ftab.hpp:30-34)."""
    from rowbowt_tpu.construct.rawio import read_ftab_text, write_ftab_text

    idx = tiny_index_ftab
    path = str(tmp_path / "small.ftab")
    write_ftab_text(idx.ftab, idx.ftab_k, path)
    with open(path) as f:
        lines = f.read().splitlines()
    # std::map order: lexicographically ascending kmers, space-separated ints
    kmers = [l.split()[0] for l in lines]
    assert kmers == sorted(kmers)
    assert all(len(km) == idx.ftab_k and set(km) <= set("ACGT") for km in kmers)
    assert len(lines) == int((idx.ftab[:, 0] >= 0).sum())
    ftab2, k2 = read_ftab_text(path)
    assert k2 == idx.ftab_k
    np.testing.assert_array_equal(ftab2, idx.ftab)


def test_raw_build_consumes_text_ftab(tiny_index_ftab, tmp_path):
    """A reference-written <prefix>.ftab is loaded instead of rebuilt."""
    from rowbowt_tpu.construct.rawio import write_ftab_text

    idx = tiny_index_ftab
    prefix = str(tmp_path / "small")
    write_raw(idx, prefix)
    write_ftab_text(idx.ftab, idx.ftab_k, prefix + ".ftab")
    idx2 = build_index_from_raw(prefix, ftab_k=idx.ftab_k)
    assert idx2.ftab_k == idx.ftab_k
    np.testing.assert_array_equal(idx2.ftab, idx.ftab)
