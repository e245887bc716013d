"""Readers for the reference's sdsl-serialized binaries (.rbwt/.tsa).

Validation is self-contained: a correctly parsed .rbwt must invert (LF walk)
into a text whose suffix array regenerates the identical BWT, and the .tsa
run-boundary samples must equal (SA[boundary]-1) mod n of that recomputed SA
(the stored convention, toehold_sa.hpp:133-155).  This also covers the
committed fixtures that ship with no raw inputs (tests/greedy_seeding).
"""

import numpy as np
import pytest

from rowbowt_tpu.construct import sdslio

REF = "/root/reference/tests/data"
GREEDY = "/root/reference/tests/greedy_seeding"


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
