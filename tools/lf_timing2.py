"""Timing with forced scalar readback + salt (defeats any remote caching)."""
import os, sys, time
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
CACHE = os.path.join(REPO, ".cache", "bench_idx")

import jax
import jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".cache", "jaxcache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from rowbowt_tpu.index import RbtIndex
from rowbowt_tpu.engine.device import DeviceIndex
from rowbowt_tpu.ops import rank as R
from rowbowt_tpu.engine.count import find_ranges, find_ranges_jump

idx = RbtIndex.load(CACHE)
text = np.load(os.path.join(CACHE, "text.npy"))
rng = np.random.default_rng(99)
N, L = 32768, 100
acgt = np.frombuffer(b"ACGT", dtype=np.uint8)
starts = rng.integers(0, len(text) - L - 1, size=N)
reads = np.stack([text[s:s+L] for s in starts])
bad = ~np.isin(reads, acgt).all(axis=1)
for i in np.flatnonzero(bad):
    while True:
        s = int(rng.integers(0, len(text) - L - 1))
        r = text[s:s+L]
        if np.isin(r, acgt).all():
            reads[i] = r; break
mut = rng.random(N) < 0.2
reads[np.arange(N)[mut], rng.integers(0, L, size=N)[mut]] = rng.choice(acgt, size=N)[mut]
tab = idx.alpha.encode_table()
qc = tab[reads.astype(np.int64)].astype(np.int32)
ln = np.full(N, L, dtype=np.int32)
dx = DeviceIndex.from_index(idx)
qcd = jnp.asarray(qc); lnd = jnp.asarray(ln)
B = N


def timeit(name, fn):
    _ = int(fn(0))
    best = float("inf")
    for rep in range(3):
        t0 = time.perf_counter()
        _ = int(fn(rep + 1))
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best*1e3:.1f} ms -> {B/best/1e3:.0f}k reads/s")


@jax.jit
def a_sum(qc, ln, salt):
    lo, hi = find_ranges(dx, qc, ln + salt - salt)
    return jnp.sum(lo) + jnp.sum(hi)

timeit("A: plain find_ranges     ", lambda s: a_sum(qcd, lnd, s))

def j_run(salt):
    out = find_ranges_jump(dx, qcd, lnd + salt - salt)
    return np.asarray(out[0]).sum()

timeit("J: jump kernel (MIN_SLOW=10)", j_run)

occ1 = dx.arrays["occ1_flat"]; n1 = dx.n + 1; Fv = dx.arrays["F"]; A_ = dx.A

@jax.jit
def b_sum(qc, ln, salt):
    ln = ln + salt - salt
    lo = jnp.zeros(B, jnp.int32); hi = jnp.full(B, dx.n - 1, jnp.int32)
    startj = jnp.zeros(B, jnp.int32)
    k = dx.ftab_k
    kcv = R.kmer_codes(dx, qc[:, L - k:])
    flo, fhi, hit = R.ftab_lookup(dx, kcv)
    hit = hit & (ln >= k)
    lo = jnp.where(hit, flo, lo); hi = jnp.where(hit, fhi, hi)
    startj = jnp.where(hit, k, 0)
    done = jnp.zeros(B, bool)
    def body(j, st):
        lo, hi, done = st
        c = qc[:, L - 1 - j]
        cs = jnp.maximum(c, 0)
        both = jnp.concatenate([cs * n1 + jnp.clip(lo, 0, dx.n),
                                cs * n1 + jnp.clip(hi + 1, 0, dx.n)])
        g = occ1[both]
        c_before = g[:B]; c_in = g[B:] - g[:B]
        sel = (jnp.arange(A_, dtype=jnp.int32)[None, :] == cs[:, None])
        nlo = jnp.sum(jnp.where(sel, Fv[None, :A_], 0), axis=1).astype(jnp.int32) + c_before
        nhi = nlo + c_in - 1
        empty = (c_in <= 0) | (c < 0)
        nlo = jnp.where(empty, 1, nlo); nhi = jnp.where(empty, 0, nhi)
        active = (~done) & (j >= startj) & (j < ln)
        lo = jnp.where(active, nlo, lo); hi = jnp.where(active, nhi, hi)
        done = done | (active & (nlo > nhi))
        return lo, hi, done
    lo, hi, _ = jax.lax.fori_loop(0, L, body, (lo, hi, done))
    return jnp.sum(lo) + jnp.sum(hi)

timeit("B: combined [2B] gather  ", lambda s: b_sum(qcd, lnd, s))
os._exit(0)
