"""Probe: where does jump+repair time go vs the plain LF loop?"""
import os, sys, time
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
CACHE = os.path.join(REPO, ".cache", "bench_idx")

import jax
jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".cache", "jaxcache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from rowbowt_tpu.index import RbtIndex
from rowbowt_tpu.engine.device import DeviceIndex
from rowbowt_tpu.engine.count import (
    find_ranges, find_ranges_jump, repair_ranges, _find_ranges_jump_resume, _bucket)

idx = RbtIndex.load(CACHE)
text = np.load(os.path.join(CACHE, "text.npy"))
rng = np.random.default_rng(99)
N, L, B = 32768, 100, 32768
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
mpos = rng.integers(0, L, size=N)
reads[np.arange(N)[mut], mpos[mut]] = rng.choice(acgt, size=N)[mut]
tab = idx.alpha.encode_table()
qc = tab[reads.astype(np.int64)].astype(np.int32)
ln = np.full(N, L, dtype=np.int32)

dx = DeviceIndex.from_index(idx)
qcd = jax.numpy.asarray(qc)
lnd = jax.numpy.asarray(ln)

# warm
out = find_ranges_jump(dx, qcd, lnd); jax.block_until_ready(out)
t0 = time.perf_counter()
lo, hi, brk, jb = find_ranges_jump(dx, qcd, lnd)
jax.block_until_ready((lo, hi, brk, jb))
tj = time.perf_counter() - t0
brkn = np.asarray(brk)
print(f"jump kernel: {tj*1e3:.1f} ms, broken={brkn.sum()}/{N} ({100*brkn.mean():.1f}%)")

lo, hi, brk, jb = map(np.asarray, (lo, hi, brk, jb))
t0 = time.perf_counter()
rounds = 0
qn, lnn = qc, ln.astype(np.int64)
jabs = jb.astype(np.int64).copy()
broken = brk.copy(); llo, lhi = lo.copy(), hi.copy()
while broken.any():
    sel = np.flatnonzero(broken)
    rounds += 1
    cap = _bucket(sel.size)
    shift = jabs[sel]
    cols = np.arange(L)[None, :] - shift[:, None]
    q = np.full((cap, L), -1, dtype=qn.dtype)
    q[: sel.size] = np.take_along_axis(qn[sel], np.clip(cols, 0, L - 1), axis=1)
    q[: sel.size][cols < 0] = -1
    rl = np.zeros(cap, dtype=np.int32); rl[: sel.size] = (lnn[sel] - shift).astype(np.int32)
    lo0 = np.zeros(cap, dtype=llo.dtype); hi0 = np.full(cap, dx.n - 1, dtype=lhi.dtype)
    lo0[: sel.size] = llo[sel]; hi0[: sel.size] = lhi[sel]
    tr0 = time.perf_counter()
    rlo, rhi, rbrk, rjb = map(np.asarray, _find_ranges_jump_resume(dx, q, rl, lo0, hi0))
    print(f"  round {rounds}: sel={sel.size} cap={cap} kernel+xfer={1e3*(time.perf_counter()-tr0):.1f} ms")
    llo[sel] = rlo[: sel.size]; lhi[sel] = rhi[: sel.size]
    jabs[sel] += rjb[: sel.size]
    nb = rbrk[: sel.size]
    broken = broken.copy(); broken[sel] = nb
    if rounds > 14: break
print(f"repair total: {1e3*(time.perf_counter()-t0):.1f} ms, rounds={rounds}")

# plain slow for reference
out = find_ranges(dx, qcd, lnd); jax.block_until_ready(out)
t0 = time.perf_counter()
out = find_ranges(dx, qcd, lnd); jax.block_until_ready(out)
print(f"slow LF loop: {1e3*(time.perf_counter()-t0):.1f} ms")
os._exit(0)
