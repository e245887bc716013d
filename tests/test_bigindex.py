"""BigIndex (two-level fblock, int64 lanes): the n >= 2^31 count engine,
property-tested at toy scale against the replicated fblock engine and naive.
The at-scale proof (a real > 2^31 artifact) is built by
scripts/build_big_index.py and exercised by bench.py's "big" config."""

import numpy as np

from rowbowt_tpu.bigindex import BigIndex
from rowbowt_tpu.engine import naive
from rowbowt_tpu.engine.batch import encode_batch
from rowbowt_tpu.engine.count import find_ranges


def _codes_of(idx):
    run_len = np.diff(np.append(idx.run_start, idx.n))
    return np.repeat(idx.run_head.astype(np.uint8), run_len)


def test_bigindex_count_matches_naive(rand_index):
    idx, text = rand_index
    big = BigIndex.from_codes(_codes_of(idx), idx.alpha, n_sup=4)
    assert big.base.dtype == np.int64
    dx = big.device_index()
    assert dx.idx_dtype == np.int64
    rng = np.random.default_rng(11)
    reads = []
    for _ in range(24):
        L = int(rng.integers(3, 30))
        p = int(rng.integers(0, len(text) - L))
        reads.append(bytes(text[p:p + L]))
    qc, lens = encode_batch(idx, reads)
    lo, hi = find_ranges(dx, qc, lens)
    lo, hi = np.asarray(lo), np.asarray(hi)
    assert lo.dtype == np.int64
    # default is the 64B-row repack; the 96B layout must agree lane-exact
    assert "fb2_64" in dx.arrays
    dx96 = big.device_index(fb64=False)
    lo96, hi96 = map(np.asarray, find_ranges(dx96, qc, lens))
    assert (lo96 == lo).all() and (hi96 == hi).all()
    for b, r in enumerate(reads):
        codes = idx.alpha.encode(np.frombuffer(r, np.uint8)).astype(np.int64)
        assert (lo[b], hi[b]) == naive.find_range(idx, codes), (b, r)


def test_bigindex_cpu_baseline_matches(rand_index):
    """The native fb2 CPU count (bench baseline) == naive."""
    import pytest

    from rowbowt_tpu import cpu_backend

    if not cpu_backend.available():
        pytest.skip("no native lib")
    idx, text = rand_index
    big = BigIndex.from_codes(_codes_of(idx), idx.alpha, n_sup=4)
    rng = np.random.default_rng(15)
    reads = []
    for _ in range(24):
        L = int(rng.integers(3, 30))
        p = int(rng.integers(0, len(text) - L))
        reads.append(bytes(text[p:p + L]))
    qc, lens = encode_batch(idx, reads)
    lo, hi = cpu_backend.count_ranges_fb2(big, np.asarray(qc), np.asarray(lens))
    for b, r in enumerate(reads):
        codes = idx.alpha.encode(np.frombuffer(r, np.uint8)).astype(np.int64)
        assert (lo[b], hi[b]) == naive.find_range(idx, codes), (b, r)


def test_bigindex_save_load_roundtrip(tmp_path, rand_index):
    idx, text = rand_index
    big = BigIndex.from_codes(_codes_of(idx), idx.alpha, n_sup=3)
    big.save(str(tmp_path / "big"))
    back = BigIndex.load(str(tmp_path / "big"))
    assert (back.n, back.A, back.per_blk) == (big.n, big.A, big.per_blk)
    np.testing.assert_array_equal(np.asarray(back.fb2), big.fb2)
    np.testing.assert_array_equal(back.base, big.base)
    np.testing.assert_array_equal(back.F, big.F)


def test_bigindex_sharded_view_matches(rand_index):
    """One artifact, two engines: the sharded view must count identically."""
    import jax

    from rowbowt_tpu.parallel.mesh import make_mesh
    from rowbowt_tpu.parallel.sharded_dense import find_ranges_sharded_dense

    idx, text = rand_index
    big = BigIndex.from_codes(_codes_of(idx), idx.alpha, n_sup=4)
    sdx = big.sharded_index()
    mesh = make_mesh(n_dp=2, n_idx=4)
    tables = sdx.device_put(mesh)
    rng = np.random.default_rng(13)
    reads = []
    for _ in range(16):
        L = int(rng.integers(3, 25))
        p = int(rng.integers(0, len(text) - L))
        reads.append(bytes(text[p:p + L]))
    qc, lens = encode_batch(idx, reads)
    slo, shi = find_ranges_sharded_dense(mesh, sdx, tables, qc, lens)
    dlo, dhi = find_ranges(big.device_index(), qc, lens)
    np.testing.assert_array_equal(np.asarray(slo), np.asarray(dlo))
    np.testing.assert_array_equal(np.asarray(shi), np.asarray(dhi))
