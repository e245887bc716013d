"""Probe: Pallas fused LF (fblock in VMEM) vs the XLA gather loop, real 8M
bench index, TPU.  Results recorded in DESIGN.md ("Pallas fused LF")."""
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
from rowbowt_tpu.engine.count import find_ranges
from rowbowt_tpu.ops.pallas_lf import find_ranges_pallas


def _sync(out):
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


idx = RbtIndex.load(CACHE)
print(f"index n={idx.n:,} fblock={idx.fblock.shape} "
      f"({idx.fblock.nbytes/2**20:.1f} MB)", file=sys.stderr)
dx = DeviceIndex.from_index(idx).lean()
text = np.load(os.path.join(CACHE, "text.npy"))
acgt = np.frombuffer(b"ACGT", dtype=np.uint8)
rng = np.random.default_rng(7)
tab = idx.alpha.encode_table()
B, L = 131072, 100
starts = rng.integers(0, len(text) - L - 1, size=B)
reads = np.stack([text[s:s + L] for s in starts])
bad = ~np.isin(reads, acgt).all(axis=1)
reads[bad] = reads[np.flatnonzero(~bad)[0]]
qc = jnp.asarray(tab[reads.astype(np.int64)].astype(np.int32))
ln = jnp.asarray(np.full(B, L, np.int32))

fx = jax.jit(lambda d, q, l: find_ranges(d, q, l, use_ftab=False))
t_xla = timeit(fx, dx, qc, ln)
lo0, hi0 = fx(dx, qc, ln)
print(f"XLA  fblock loop: {t_xla*1e3:8.2f} ms  {B/t_xla:>12,.0f} reads/s")

for tile in (512, 1024, 2048, 4096):
    try:
        fp = jax.jit(lambda q, l, t=tile: find_ranges_pallas(dx, q, l, tile=t))
        t_pl = timeit(fp, qc, ln)
        lo1, hi1 = fp(qc, ln)
        ok = (np.asarray(lo0) == np.asarray(lo1)).all() and \
             (np.asarray(hi0) == np.asarray(hi1)).all()
        print(f"Pallas tile={tile:5}: {t_pl*1e3:8.2f} ms  {B/t_pl:>12,.0f} reads/s"
              f"  parity={'OK' if ok else 'MISMATCH'}")
    except Exception as e:
        print(f"Pallas tile={tile:5}: FAILED {type(e).__name__}: {str(e)[:300]}")
