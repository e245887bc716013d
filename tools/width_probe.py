"""Probe: reads/s vs batch width for the plain LF loop and the jump kernel."""
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
from rowbowt_tpu.engine.count import find_ranges, find_ranges_jump

idx = RbtIndex.load(CACHE)
text = np.load(os.path.join(CACHE, "text.npy"))
rng = np.random.default_rng(99)
NMAX, L = 524288, 100
acgt = np.frombuffer(b"ACGT", dtype=np.uint8)
starts = rng.integers(0, len(text) - L - 1, size=NMAX)
off = rng.integers(0, L, size=NMAX)
reads = text[starts[:, None] + np.arange(L)[None, :]]
mut = rng.random(NMAX) < 0.2
reads[np.arange(NMAX)[mut], off[mut]] = rng.choice(acgt, size=NMAX)[mut]
tab = idx.alpha.encode_table()
qc_all = tab[reads.astype(np.int64)].astype(np.int32)  # seps encode as valid codes; fine for timing
dx = DeviceIndex.from_index(idx)

for B in (32768, 131072, 524288):
    qcd = jnp.asarray(qc_all[:B]); lnd = jnp.full(B, L, dtype=jnp.int32)
    def pl(s):
        out = find_ranges(dx, qcd, lnd + s - s)
        return np.asarray(out[0]).sum()
    _ = pl(0)
    best = min(
        (lambda t0=time.perf_counter(): (pl(r + 1), time.perf_counter() - t0)[1])()
        for r in range(2)
    )
    print(f"plain B={B:>7}: {best*1e3:7.1f} ms -> {B/best/1e3:6.0f}k reads/s")
    def jp(s):
        out = find_ranges_jump(dx, qcd, lnd + s - s)
        return np.asarray(out[0]).sum()
    _ = jp(0)
    best = min(
        (lambda t0=time.perf_counter(): (jp(r + 1), time.perf_counter() - t0)[1])()
        for r in range(2)
    )
    print(f"jump  B={B:>7}: {best*1e3:7.1f} ms -> {B/best/1e3:6.0f}k reads/s")
os._exit(0)
