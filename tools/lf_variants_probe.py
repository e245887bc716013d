"""Probe LF-loop variants on the real bench workload (20% mutated reads)."""
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


def timeit(name, fn, *args):
    out = fn(*args); jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args); jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best*1e3:.1f} ms -> {B/best/1e3:.0f}k reads/s")
    return out


from rowbowt_tpu.engine.count import find_ranges
o_ref = timeit("A: current find_ranges   ", lambda q, l: find_ranges(dx, q, l), qcd, lnd)

occ1 = dx.arrays["occ1_flat"]
n1 = dx.n + 1
Fv = dx.arrays["F"]
A_ = dx.A

@jax.jit
def find_ranges_comb(qc, ln):
    """One [2B] combined gather per step for (rank@lo, rank@hi+1)."""
    lo = jnp.zeros(B, jnp.int32); hi = jnp.full(B, dx.n - 1, jnp.int32)
    startj = jnp.zeros(B, jnp.int32)
    if dx.has_ftab:
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
    return lo, hi

o_c = timeit("B: combined [2B] gather  ", find_ranges_comb, qcd, lnd)
assert (np.asarray(o_ref[0]) == np.asarray(o_c[0])).all()
assert (np.asarray(o_ref[1]) == np.asarray(o_c[1])).all()
print("combined matches")

# jump with MIN_SLOW tweak: patch module constant path — emulate by calling
# _jump_impl with lo0/hi0 after running 10 extra slow steps manually.
from rowbowt_tpu.engine import count as C

@jax.jit
def slow10_then_jump(qc, ln):
    # 20 narrowing chars: ftab(10) + 10 slow steps, then jump the rest
    lo = jnp.zeros(B, jnp.int32); hi = jnp.full(B, dx.n - 1, jnp.int32)
    k = dx.ftab_k
    kcv = R.kmer_codes(dx, qc[:, L - k:])
    flo, fhi, hit = R.ftab_lookup(dx, kcv)
    hit = hit & (ln >= k)
    lo = jnp.where(hit, flo, lo); hi = jnp.where(hit, fhi, hi)
    pre_broken = ~hit
    done = jnp.zeros(B, bool)
    for j in range(10, 20):
        c = qc[:, L - 1 - j]
        nlo, nhi = R.lf_step_occ1(dx, lo, hi, c)
        act = (~done) & (~pre_broken) & (j < ln)
        lo = jnp.where(act, nlo, lo); hi = jnp.where(act, nhi, hi)
        done = done | (act & (nlo > nhi))
    return lo, hi, done, pre_broken

o = timeit("C: ftab+10 slow narrowing", slow10_then_jump, qcd, lnd)
lo20, hi20, done20, preb = (np.asarray(x) for x in o)

# now jump from char 20 using the resume entry (use_ftab=False) with shifted reads
shift = 20
cols = np.arange(L)[None, :] - shift
q2 = np.take_along_axis(qc, np.clip(cols, 0, L - 1), axis=1)
q2[np.broadcast_to(cols < 0, q2.shape)] = -1
rl = (ln - shift).astype(np.int32)
rl[done20] = 0
q2d = jnp.asarray(q2); rld = jnp.asarray(rl)
lo0 = jnp.asarray(np.where(done20, np.asarray(o_ref[0]), lo20))
hi0 = jnp.asarray(np.where(done20, np.asarray(o_ref[1]), hi20))
out = timeit("D: jump phase from c20   ",
             lambda q, l, a, b: C._find_ranges_jump_resume(dx, q, l, a, b),
             q2d, rld, lo0, hi0)
brk = np.asarray(out[2]) | preb
print(f"break rate after 20-char narrowing: {brk.sum()}/{B} = {100*brk.mean():.1f}%")
os._exit(0)
