"""Chunked (insertion-merge) construction vs brute-force generalized-order
oracle, and count/locate parity between merge-built and whole-text-built
indexes for in-alphabet (ACGT) queries."""

import numpy as np
import pytest

from rowbowt_tpu.alphabet import SEP_BYTE, TERM_BYTE, Alphabet
from rowbowt_tpu.construct.merge import merge_construct, split_text_docs


def gen_bwt_oracle(parts):
    """Generalized-order BWT by explicit sort: suffixes stop at their doc's
    end (python bytes comparison = shorter-prefix-first), ties by doc id.
    BWT chars / SA values are GLOBAL (text = concatenation of parts)."""
    text = np.concatenate(parts)
    n = text.shape[0]
    starts = np.concatenate(([0], np.cumsum([len(p) for p in parts])[:-1]))
    entries = []
    for d, p in enumerate(parts):
        b = bytes(p)
        for j in range(len(p)):
            entries.append((b[j:], d, int(starts[d]) + j))
    entries.sort(key=lambda e: (e[0], e[1]))
    sa = np.array([e[2] for e in entries], dtype=np.int64)
    return text[(sa - 1) % n], sa


def _rand_parts(rng, k=4, lo=20, hi=60, w=3):
    parts = []
    for d in range(k):
        L = int(rng.integers(lo, hi))
        seq = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=L)
        tail = np.full(w, SEP_BYTE, dtype=np.uint8)
        if d == k - 1:
            tail = np.append(tail, np.uint8(TERM_BYTE))
        parts.append(np.concatenate([seq, tail]))
    return parts


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_merge_matches_oracle(seed):
    rng = np.random.default_rng(seed)
    parts = _rand_parts(rng, k=3 + seed % 3)
    want_bwt, want_sa = gen_bwt_oracle(parts)
    bwt, sa, alpha = merge_construct(parts)
    np.testing.assert_array_equal(alpha.decode(bwt), want_bwt)
    np.testing.assert_array_equal(sa, want_sa)


def test_merge_python_walk_matches_native():
    """The no-native fallback walk must equal the native one."""
    from rowbowt_tpu.construct import merge as M

    rng = np.random.default_rng(9)
    parts = _rand_parts(rng, k=3)
    lib = M._load_native()
    if lib is None:
        pytest.skip("no native lib")
    bwt, sa, alpha = merge_construct(parts)
    # rebuild doc 0+1, then walk doc 2 with both implementations
    b01, _, _ = merge_construct(parts[:2], alpha=alpha)
    tab = alpha.encode_table()
    A = alpha.size
    counts = np.bincount(tab[np.concatenate(parts[:2]).astype(np.int64)],
                         minlength=A).astype(np.int64)
    Fcum = np.zeros(A + 1, dtype=np.int64)
    np.cumsum(counts, out=Fcum[1:])
    E = np.zeros(A, dtype=np.int64)
    for p in parts[:2]:
        E[int(tab[int(p[-1])])] += 1
    # phantom rows: doc-initial suffixes of docs 0..1 in b01
    starts = [0, len(parts[0])]
    _, sa01 = gen_bwt_oracle(parts[:2])
    ph_rows = np.sort(np.concatenate(
        [np.nonzero(sa01 == s)[0] for s in starts])).astype(np.int64)
    prev_last = {0: parts[1][-1], len(parts[0]): parts[0][-1]}
    ph_chars = np.array([tab[int(prev_last[int(sa01[r])])] for r in ph_rows],
                        dtype=np.uint8)
    dcodes = tab[parts[2].astype(np.int64)].astype(np.uint8)
    pn = M._walk_native(lib, b01, A, Fcum, E, ph_rows, ph_chars, dcodes)
    pp = M._walk_python(b01, A, Fcum, E, ph_rows, ph_chars, dcodes)
    np.testing.assert_array_equal(pn, pp)


def test_merge_index_count_locate_parity(rand_index):
    """A merge-built index answers ACGT count queries identically to the
    whole-text-built index, and locate returns the same position SET."""
    from rowbowt_tpu.construct.build import build_index
    from rowbowt_tpu.engine import naive

    idx, text = rand_index
    parts = split_text_docs(text, idx.doc_starts)
    bwt, sa, alpha = merge_construct(parts)
    midx = build_index(text, sa=sa)
    assert midx.n == idx.n
    np.testing.assert_array_equal(midx.F, idx.F)
    rng = np.random.default_rng(17)
    for _ in range(40):
        L = int(rng.integers(2, 24))
        p = int(rng.integers(0, len(text) - L))
        q = text[p:p + L]
        if SEP_BYTE in q or TERM_BYTE in q:
            continue
        codes_m = midx.alpha.encode(q).astype(np.int64)
        codes_w = idx.alpha.encode(q).astype(np.int64)
        lo_m, hi_m = naive.find_range(midx, codes_m)
        lo_w, hi_w = naive.find_range(idx, codes_w)
        assert hi_m - lo_m == hi_w - lo_w, q  # identical counts
        if hi_w >= lo_w:
            (lm, hm), km = naive.find_range_w_toehold(midx, codes_m)
            (lw, hw), kw = naive.find_range_w_toehold(idx, codes_w)
            got = sorted(naive.locate_range(midx, lm, hm, km, hm - lm + 1))
            want = sorted(naive.locate_range(idx, lw, hw, kw, hw - lw + 1))
            assert got == want, q  # same occurrence SET


def test_merge_u32_sa_parity():
    """sa_dtype=np.uint32 (the pangenome-scale layout) == the int64 SA."""
    rng = np.random.default_rng(17)
    parts = _rand_parts(rng, k=5)
    bwt64, sa64, _ = merge_construct(parts, sa_dtype=np.int64)
    bwt32, sa32, _ = merge_construct(parts, sa_dtype=np.uint32)
    assert sa32.dtype == np.uint32
    np.testing.assert_array_equal(bwt32, bwt64)
    np.testing.assert_array_equal(sa32.astype(np.int64), sa64)
