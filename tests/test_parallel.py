"""Multi-device tests on the virtual 8-CPU mesh: data-parallel reads with a
replicated index, and the R-sharded index with per-step psum."""

import jax
import numpy as np

from rowbowt_tpu.engine.batch import encode_batch
from rowbowt_tpu.engine.count import find_ranges
from rowbowt_tpu.engine.device import DeviceIndex
from rowbowt_tpu.engine import naive
from rowbowt_tpu.parallel.mesh import make_mesh, pad_batch_to, replicate_index, shard_queries
from rowbowt_tpu.parallel.sharded import ShardedIndex, find_ranges_sharded

from test_golden_tiny import SIMPLE_READS


def test_eight_devices_present():
    assert len(jax.devices()) == 8


def test_dp_replicated(tiny_index):
    mesh = make_mesh(n_dp=8)
    dx = replicate_index(mesh, DeviceIndex.from_index(tiny_index))
    qc, lens = encode_batch(tiny_index, SIMPLE_READS)
    qc, lens, B = pad_batch_to(qc, lens, 8)
    qc, lens = shard_queries(mesh, qc, lens)
    lo, hi = find_ranges(dx, qc, lens)
    lo, hi = np.asarray(lo)[:B], np.asarray(hi)[:B]
    want = [(24279, 24280), (24175, 24175), (27430, 27432),
            (27430, 27432), (17409, 17409), (17416, 17417)]
    assert [(int(a), int(b)) for a, b in zip(lo, hi)] == want


def test_sharded_index_golden(tiny_index):
    mesh = make_mesh(n_dp=2, n_idx=4)
    sidx = ShardedIndex.build(tiny_index, n_idx=4)
    tables = sidx.device_put(mesh)
    qc, lens = encode_batch(tiny_index, SIMPLE_READS)
    qc, lens, B = pad_batch_to(qc, lens, 2)
    lo, hi = find_ranges_sharded(mesh, sidx, tables, qc, lens)
    lo, hi = np.asarray(lo)[:B], np.asarray(hi)[:B]
    want = [(24279, 24280), (24175, 24175), (27430, 27432),
            (27430, 27432), (17409, 17409), (17416, 17417)]
    assert [(int(a), int(b)) for a, b in zip(lo, hi)] == want


def test_sharded_matches_naive(rand_index):
    idx, text = rand_index
    rng = np.random.default_rng(5)
    reads = []
    for _ in range(16):
        L = int(rng.integers(4, 30))
        p = int(rng.integers(0, len(text) - L))
        reads.append(bytes(text[p:p + L]))
    mesh = make_mesh(n_dp=4, n_idx=2)
    sidx = ShardedIndex.build(idx, n_idx=2)
    tables = sidx.device_put(mesh)
    qc, lens = encode_batch(idx, reads)
    lo, hi = find_ranges_sharded(mesh, sidx, tables, qc, lens)
    lo, hi = np.asarray(lo), np.asarray(hi)
    for b, r in enumerate(reads):
        codes = idx.alpha.encode(np.frombuffer(r, np.uint8)).astype(np.int64)
        assert (lo[b], hi[b]) == naive.find_range(idx, codes), (b, r)


def test_sharded_toehold_locate(rand_index):
    from rowbowt_tpu.parallel.sharded import (
        find_ranges_w_toehold_sharded, locate_sharded,
    )

    idx, text = rand_index
    rng = np.random.default_rng(9)
    reads = []
    for _ in range(16):
        L = int(rng.integers(5, 30))
        p = int(rng.integers(0, len(text) - L))
        reads.append(bytes(text[p:p + L]))
    mesh = make_mesh(n_dp=2, n_idx=4)
    sidx = ShardedIndex.build(idx, n_idx=4)
    tables = sidx.device_put(mesh)
    qc, lens = encode_batch(idx, reads)
    lo, hi, k = find_ranges_w_toehold_sharded(mesh, sidx, tables, qc, lens)
    locs, cnt = locate_sharded(mesh, sidx, tables, lo, hi, k, max_hits=6)
    lo, hi, k, locs, cnt = map(np.asarray, (lo, hi, k, locs, cnt))
    for b, r in enumerate(reads):
        codes = idx.alpha.encode(np.frombuffer(r, np.uint8)).astype(np.int64)
        wrn, wk = naive.find_range_w_toehold(idx, codes)
        assert (lo[b], hi[b]) == wrn, b
        if wrn[1] >= wrn[0]:
            assert k[b] == wk, b
            assert [int(x) for x in locs[b, : cnt[b]]] == \
                naive.locate_range(idx, *wrn, wk, 6), b


def test_multihost_single_process_path(tiny_index):
    """multihost harness degenerates correctly to 1 process on the CPU mesh."""
    from rowbowt_tpu.parallel import multihost as mh

    mh.init(num_processes=1)
    mesh = mh.global_mesh(n_idx=1)
    assert mesh.shape["dp"] == 8
    dx = replicate_index(mesh, DeviceIndex.from_index(tiny_index))
    qc, lens = encode_batch(tiny_index, SIMPLE_READS)
    qc, lens, B = pad_batch_to(qc, lens, 8)
    gqc = mh.host_batch_to_global(mesh, qc)
    glen = mh.host_batch_to_global(mesh, lens)
    lo, hi = find_ranges(dx, gqc, glen)
    lo0 = mh.gather_to_host0(lo)[:B]
    hi0 = mh.gather_to_host0(hi)[:B]
    want = [(24279, 24280), (24175, 24175), (27430, 27432),
            (27430, 27432), (17409, 17409), (17416, 17417)]
    assert [(int(a), int(b)) for a, b in zip(lo0, hi0)] == want
    assert mh.is_host0()


def test_sharded_dense_count_toehold_locate(rand_index):
    """Position-sharded fblock layout (the 1000G design, sharded_dense.py)
    must match naive on count + toehold + phi locate."""
    from rowbowt_tpu.parallel.sharded_dense import (
        ShardedDenseIndex,
        find_ranges_sharded_dense,
        find_ranges_w_toehold_sharded_dense,
        locate_sharded_dense,
    )

    idx, text = rand_index
    rng = np.random.default_rng(21)
    reads = []
    for _ in range(16):
        L = int(rng.integers(4, 30))
        p = int(rng.integers(0, len(text) - L))
        reads.append(bytes(text[p:p + L]))
    mesh = make_mesh(n_dp=2, n_idx=4)
    sdx = ShardedDenseIndex.build(idx, n_idx=4)
    tables = sdx.device_put(mesh)
    assert tables["fb3"].shape[2] == 16  # 64B rows are the placed default
    qc, lens = encode_batch(idx, reads)
    lo, hi = find_ranges_sharded_dense(mesh, sdx, tables, qc, lens)
    # the legacy 96B placement must count identically
    t96 = sdx.device_put(mesh, fb64=False)
    lo96, hi96 = map(np.asarray, find_ranges_sharded_dense(mesh, sdx, t96, qc, lens))
    assert (lo96 == np.asarray(lo)).all() and (hi96 == np.asarray(hi)).all()
    tlo, thi, k = find_ranges_w_toehold_sharded_dense(mesh, sdx, tables, qc, lens)
    locs, cnt = locate_sharded_dense(mesh, sdx, tables, tlo, thi, k, max_hits=6)
    lo, hi, tlo, thi, k, locs, cnt = map(
        np.asarray, (lo, hi, tlo, thi, k, locs, cnt))
    for b, r in enumerate(reads):
        codes = idx.alpha.encode(np.frombuffer(r, np.uint8)).astype(np.int64)
        assert (lo[b], hi[b]) == naive.find_range(idx, codes), (b, r)
        wrn, wk = naive.find_range_w_toehold(idx, codes)
        assert (tlo[b], thi[b]) == wrn, b
        if wrn[1] >= wrn[0]:
            assert k[b] == wk, b
            assert [int(x) for x in locs[b, : cnt[b]]] == \
                naive.locate_range(idx, *wrn, wk, 6), b


def test_sharded_dense_markers(rand_index):
    """Sharded window-marker queries == the replicated engine, buffer-exact."""
    from rowbowt_tpu.engine.markers import find_ranges_w_markers
    from rowbowt_tpu.parallel.sharded_dense import (
        ShardedDenseIndex,
        find_ranges_w_markers_sharded_dense,
    )

    idx, text = rand_index
    rng = np.random.default_rng(33)
    reads = []
    for _ in range(16):
        L = int(rng.integers(idx.ma_wsize, 40))
        p = int(rng.integers(0, len(text) - L))
        reads.append(bytes(text[p:p + L]))
    qc, lens = encode_batch(idx, reads)
    dx = DeviceIndex.from_index(idx)
    rlo, rhi, rbuf, rused, rovf = find_ranges_w_markers(
        dx, qc, lens, wsize=idx.ma_wsize, max_k=12)

    mesh = make_mesh(n_dp=2, n_idx=4)
    sdx = ShardedDenseIndex.build(idx, n_idx=4)
    tables = sdx.device_put(mesh)
    lo, hi, buf, used, ovf = find_ranges_w_markers_sharded_dense(
        mesh, sdx, tables, qc, lens, wsize=idx.ma_wsize, max_k=12)
    np.testing.assert_array_equal(np.asarray(lo), np.asarray(rlo))
    np.testing.assert_array_equal(np.asarray(hi), np.asarray(rhi))
    np.testing.assert_array_equal(np.asarray(used), np.asarray(rused))
    np.testing.assert_array_equal(np.asarray(buf), np.asarray(rbuf))
    np.testing.assert_array_equal(np.asarray(ovf), np.asarray(rovf))


def test_sharded_dense_greedy_seeding(rand_index):
    """The production greedy-seeding engine on the sharded layout must be
    buffer-exact vs the replicated engine (rowbowt.hpp:406-482 workload)."""
    from rowbowt_tpu.engine.seeds import markers_greedy_seeding
    from rowbowt_tpu.parallel.sharded_dense import (
        ShardedDenseIndex,
        markers_greedy_seeding_sharded_dense,
    )

    idx, text = rand_index
    rng = np.random.default_rng(77)
    acgt = np.frombuffer(b"ACGT", dtype=np.uint8)
    reads = []
    for t in range(16):
        L = int(rng.integers(idx.ma_wsize + 2, 60))
        p = int(rng.integers(0, len(text) - L))
        r = np.array(text[p:p + L])
        if t % 3 == 0:  # mutate to force seed restarts
            r[rng.integers(0, L)] = rng.choice(acgt)
        reads.append(bytes(r))
    qc, lens = encode_batch(idx, reads)
    dx = DeviceIndex.from_index(idx)
    mesh = make_mesh(n_dp=2, n_idx=4)
    sdx = ShardedDenseIndex.build(idx, n_idx=4)
    tables = sdx.device_put(mesh)
    for values in (True, False):
        ref = markers_greedy_seeding(
            dx, qc, lens, wsize=idx.ma_wsize, max_range=1000,
            max_seeds=4, max_k=8, use_ftab=False, values=values)
        got = markers_greedy_seeding_sharded_dense(
            mesh, sdx, tables, qc, lens, wsize=idx.ma_wsize, max_range=1000,
            max_seeds=4, max_k=8, values=values)
        for name, a, b in zip(
                ("slo", "shi", "sqs", "sqe", "mvals", "mcnt", "ns"), ref, got):
            np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b), err_msg=f"{name} values={values}")


def test_sharded_rank_int64_base(rand_index):
    """Global sharded ranks must ride the int64 LANE dtype when the per-shard
    base offsets exceed 2^31 (the 1000G regime; toehold_sa.hpp:133-155 u64
    contract) — regression for _mk_rank narrowing the base to int32."""
    from functools import partial

    from jax.sharding import PartitionSpec as P

    from rowbowt_tpu.parallel.sharded_dense import (
        ShardedDenseIndex, _mk_rank, _specs,
    )

    idx, _ = rand_index
    sdx = ShardedDenseIndex.build(idx, n_idx=4)
    BIG = np.int64(3) << 31  # fake shard offsets past 2^31
    sdx.base = sdx.base + BIG
    mesh = make_mesh(n_dp=2, n_idx=4)
    tables = {k: v for k, v in sdx.device_put(mesh).items()
              if k in ("fb3", "base", "F")}
    rng = np.random.default_rng(7)
    i = rng.integers(0, idx.n, size=16).astype(np.int64)
    c = rng.integers(0, idx.A, size=16).astype(np.int64)

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(_specs(tables), P("dp"), P("dp")), out_specs=P("dp"))
    def run(tb, i, c):
        return _mk_rank(sdx, tb)(i, c)

    got = np.asarray(jax.jit(run)(tables, jax.numpy.asarray(i),
                                  jax.numpy.asarray(c)))
    assert got.dtype == np.int64
    run_len = np.diff(np.append(idx.run_start, idx.n))
    codes = np.repeat(idx.run_head.astype(np.int64), run_len)
    for j in range(16):
        want = int((codes[: i[j]] == c[j]).sum()) + int(BIG)
        assert got[j] == want, (j, int(i[j]), int(c[j]))


def test_fb3_from_codes_matches_global(rand_index):
    """The n>=2^31 build path (per-shard fblock from codes, no global table)
    must equal the from-global-fblock shards."""
    from rowbowt_tpu.parallel.sharded_dense import ShardedDenseIndex

    idx, _ = rand_index
    run_len = np.diff(np.append(idx.run_start, idx.n))
    codes = np.repeat(idx.run_head.astype(np.int64), run_len)
    sdx = ShardedDenseIndex.build(idx, n_idx=4)
    fb3, base, per_blk = ShardedDenseIndex.fb3_from_codes(codes, idx.A, 4)
    assert per_blk == sdx.per_blk
    assert base.dtype == np.int64
    np.testing.assert_array_equal(base, sdx.base)
    np.testing.assert_array_equal(fb3, sdx.fb3)
