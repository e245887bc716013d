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
