"""Probe: occ1 (2 elem gathers/step) vs fblock (2 row gathers + SWAR) vs the
old split dense path, end-to-end on the real 8M bench index, plus a raw
row-gather chain at chr21 scale (160M symbols) where occ1 cannot exist.

Run on the TPU: python tools/fblock_probe.py [part1|part2|all]
"""

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
CACHE = os.path.join(REPO, ".cache", "bench_idx")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".cache", "jaxcache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def _sync(out):
    """host readback of one element: the only true sync on the axon tunnel
    (block_until_ready can return before remote execution finishes)"""
    leaf = jax.tree_util.tree_leaves(out)[0]
    return np.asarray(leaf).ravel()[0]


def timeit(fn, *a, reps=3):
    _sync(fn(*a))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        _sync(fn(*a))
        best = min(best, time.perf_counter() - t0)
    return best


def codes_from_bwt4(bwt4: np.ndarray, n: int) -> np.ndarray:
    w = bwt4.reshape(-1)
    shifts = (np.arange(8, dtype=np.uint32) * 4)[None, :]
    nib = ((w[:, None] >> shifts) & np.uint32(15)).astype(np.int64)
    return nib.reshape(-1)[:n]


def part1():
    from rowbowt_tpu.construct.build import build_fblock
    from rowbowt_tpu.engine.count import find_ranges
    from rowbowt_tpu.engine.device import DeviceIndex
    from rowbowt_tpu.index import RbtIndex

    idx = RbtIndex.load(CACHE)
    print("index loaded", file=sys.stderr)
    if idx.fblock is None:
        codes = codes_from_bwt4(idx.bwt4, idx.n)
        idx.fblock = build_fblock(codes, idx.A)
        print("fblock built", file=sys.stderr)
    text = np.load(os.path.join(CACHE, "text.npy"))
    acgt = np.frombuffer(b"ACGT", dtype=np.uint8)
    rng = np.random.default_rng(7)
    tab = idx.alpha.encode_table()

    full = DeviceIndex.from_index(idx)
    jax.block_until_ready(full.arrays["occ1_flat"])
    print("index on device", file=sys.stderr)
    for B in (32768, 131072):
        starts = rng.integers(0, len(text) - 101, size=B)
        reads = np.stack([text[s:s + 100] for s in starts])
        bad = ~np.isin(reads, acgt).all(axis=1)
        reads[bad] = reads[np.flatnonzero(~bad)[0]]
        qc = jnp.asarray(tab[reads.astype(np.int64)].astype(np.int32))
        ln = jnp.full(B, 100, dtype=jnp.int32)
        variants = {
            "occ1": {k: v for k, v in full.arrays.items() if k != "fblock"},
            "fblock": {k: v for k, v in full.arrays.items() if k != "occ1_flat"},
            "dense": {k: v for k, v in full.arrays.items()
                      if k not in ("occ1_flat", "fblock")},
        }
        ref = None
        for name, arrs in variants.items():
            print(f"variant {name} B={B}: start", file=sys.stderr)
            dx = DeviceIndex(arrs, full.n, full.R, full.A, full.ma_wsize,
                             full.ftab_k, full.acgt_codes)
            fn = jax.jit(lambda d, q, l: find_ranges(d, q, l, use_ftab=False))
            t = timeit(fn, dx, qc, ln)
            lo, hi = fn(dx, qc, ln)
            if ref is None:
                ref = (np.asarray(lo), np.asarray(hi))
            else:
                assert (np.asarray(lo) == ref[0]).all(), f"{name} mismatch"
            print(f"B={B:>7,} {name:>7}: {t*1e3:8.2f} ms  "
                  f"{B/t:>12,.0f} reads/s  {B*100/t/1e6:8.1f} M LF-steps/s")


def part2():
    """Raw dependent-chain gather rates at 8M-scale and 160M-scale tables."""
    rng = np.random.default_rng(0)
    K = 50
    for nb, label in ((62_500, "8M-sym"), (1_250_000, "160M-sym"), (7_000_000, "900M-sym")):
        fb = jnp.asarray(rng.integers(0, 1 << 30, size=(nb, 24), dtype=np.int32))
        elem = jnp.asarray(rng.integers(0, 1 << 30, size=nb * 24, dtype=np.int32))

        @jax.jit
        def chain_row(i0, fb=fb, nb=nb):
            def body(t, i):
                r1 = fb[i]
                r2 = fb[(i * 7 + 13) % nb]
                v = jnp.sum(r1[:, :8] ^ r2[:, :8], axis=1).astype(jnp.uint32)
                return (v * jnp.uint32(2654435761) + t.astype(jnp.uint32)) % nb
            return jnp.sum(jax.lax.fori_loop(0, K, body, i0))

        @jax.jit
        def chain_elem(i0, elem=elem, nb=nb):
            m = nb * 24
            def body(t, i):
                v1 = elem[i]
                v2 = elem[(i * 7 + 13) % m]
                v = (v1 ^ v2).astype(jnp.uint32)
                return (v * jnp.uint32(2654435761) + t.astype(jnp.uint32)) % m
            return jnp.sum(jax.lax.fori_loop(0, K, body, i0.astype(jnp.uint32) % m))

        for B in (32768, 131072, 524288):
            i0 = jnp.asarray(rng.integers(0, nb, size=B, dtype=np.int32)).astype(jnp.uint32) % nb
            tr = timeit(chain_row, i0)
            te = timeit(chain_elem, i0)
            print(f"{label:>9} B={B:>7,}: row96B {tr/K*1e3:7.3f} ms/step "
                  f"({2*B*K/tr/1e6:7.1f} M row-gathers/s) | elem4B {te/K*1e3:7.3f} ms/step "
                  f"({2*B*K/te/1e6:7.1f} M elem-gathers/s)")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    print("device:", jax.devices()[0], file=sys.stderr)
    if which in ("part1", "all"):
        part1()
    if which in ("part2", "all"):
        part2()
