"""All three rank backends (run-space searchsorted, block-dense, occ1) must
agree with the naive engine on the same text."""

import numpy as np
import pytest

from rowbowt_tpu.construct.build import build_index
from rowbowt_tpu.engine import naive
from rowbowt_tpu.engine.batch import encode_batch
from rowbowt_tpu.engine.count import find_ranges
from rowbowt_tpu.engine.device import DeviceIndex
from rowbowt_tpu.engine.locate import find_ranges_w_toehold, locate


@pytest.fixture(scope="module")
def text():
    rng = np.random.default_rng(11)
    t = rng.choice(np.frombuffer(b"ACGT", np.uint8), size=700)
    return np.concatenate([t, np.array([1], dtype=np.uint8)])


@pytest.fixture(scope="module")
def reads(text):
    rng = np.random.default_rng(12)
    out = []
    for _ in range(24):
        L = int(rng.integers(3, 25))
        p = int(rng.integers(0, len(text) - L - 1))
        r = text[p:p + L].copy()
        if rng.random() < 0.4:
            r[rng.integers(0, L)] = rng.choice(np.frombuffer(b"ACGT", np.uint8))
        out.append(bytes(r))
    return out


@pytest.mark.parametrize("dense", [False, True])
def test_backend_agreement(text, reads, dense):
    idx = build_index(text, dense=dense)
    if dense:
        assert idx.occ1 is not None and idx.kval is not None
    dx = DeviceIndex.from_index(idx)
    qc, lens = encode_batch(idx, reads)
    lo, hi = find_ranges(dx, qc, lens)
    tlo, thi, k = find_ranges_w_toehold(dx, qc, lens)
    locs, cnt = locate(dx, tlo, thi, k, max_hits=8)
    lo, hi, tlo, thi, k, locs, cnt = map(np.asarray, (lo, hi, tlo, thi, k, locs, cnt))
    for b, r in enumerate(reads):
        codes = idx.alpha.encode(np.frombuffer(r, np.uint8)).astype(np.int64)
        assert (lo[b], hi[b]) == naive.find_range(idx, codes)
        wrn, wk = naive.find_range_w_toehold(idx, codes)
        assert (tlo[b], thi[b]) == wrn
        if wrn[1] >= wrn[0]:
            assert k[b] == wk
            assert list(locs[b, : cnt[b]]) == naive.locate_range(idx, *wrn, wk, 8)
