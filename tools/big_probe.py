"""VERDICT r3 item 5: is the big (n=2.4G) LF loop at gather speed-of-light?

(a) achieved count rate on the real 2.4 GB fb2_64 table at several scan
    interleave shapes (the chr lesson: independent per-batch LF chains
    pipeline through the gather engine — DESIGN.md "Engine cost anatomy" #4);
(b) raw dependent-chain 2-row-gather rate on the SAME table — the
    speed-of-light bound (an LF step cannot beat two dependent row gathers);
(c) the same chain on the 96B-row fb2 (fewer, bigger rows) as the layout
    cross-check.

Run on the real chip:  python tools/big_probe.py
"""

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from rowbowt_tpu.bigindex import BigIndex  # noqa: E402
from rowbowt_tpu.engine.count import find_ranges  # noqa: E402

CACHE = os.path.join(REPO, ".cache", "bench_idx_big")


def timeit(fn, *a, reps=3):
    _ = jax.block_until_ready(fn(*a))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        _ = jax.block_until_ready(fn(*a))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    big = BigIndex.load(CACHE)
    print(f"big index: n={big.n:,}", file=sys.stderr)
    dx = big.device_index(with_locate=False, with_markers=False)
    key = "fb2_64" if "fb2_64" in dx.arrays else "fb2"
    fbdev = dx.arrays[key]
    nb = fbdev.shape[0]
    print(f"device table {key}: {nb:,} rows x {fbdev.shape[1]*4}B = "
          f"{fbdev.nbytes/2**30:.2f} GB on {jax.devices()[0]}", file=sys.stderr)

    qcodes = np.load(os.path.join(CACHE, "qcodes.npy"))
    lens = np.load(os.path.join(CACHE, "qlens.npy"))
    N, L = qcodes.shape

    # (a) achieved count rate at several interleave shapes
    fn = jax.jit(lambda d, q, l: jax.lax.scan(
        lambda _, xs: (None, find_ranges(d, xs[0], xs[1], use_ftab=False)),
        None, (q, l))[1][0].sum(), static_argnums=())
    for nbatch in (1, 2, 4, 8):
        B = N // nbatch
        q3 = jnp.asarray(qcodes[: nbatch * B].reshape(nbatch, B, L).astype(np.int32))
        l3 = jnp.asarray(lens[: nbatch * B].reshape(nbatch, B).astype(np.int32))
        t = timeit(fn, dx, q3, l3)
        print(f"(a) count scan {nbatch}x{B//1024}k lanes: "
              f"{nbatch*B/t:>10,.0f} reads/s  {2*nbatch*B*L/t/1e6:7.1f} M ranks/s")

    # (b) raw dependent 2-row-gather chain on the same table
    K = 50
    rng = np.random.default_rng(7)

    def mk_chain(tab, rows):
        ck = tab.shape[1] - (8 if key == "fb2_64" else 16)

        @jax.jit
        def chain(i0):
            def body(t, i):
                r1 = tab[i]
                r2 = tab[(i * 7 + 13) % rows]
                v = jnp.sum(r1[:, :8] ^ r2[:, :8], axis=1).astype(jnp.uint32)
                return ((v * jnp.uint32(2654435761) + t.astype(jnp.uint32))
                        % rows).astype(jnp.int32)
            return jnp.sum(jax.lax.fori_loop(0, K, body, i0))

        return chain

    for B in (65_536, 131_072):
        i0 = jnp.asarray(rng.integers(0, nb, size=B, dtype=np.int32))
        tb = timeit(mk_chain(fbdev, nb), i0)
        print(f"(b) raw 2-row chain B={B//1024}k: "
              f"{2*B*K/tb/1e6:7.1f} M row-gathers/s -> LF ceiling "
              f"{B*K/tb:>10,.0f} read-steps/s")

    # interleaved raw chains (does the scan trick move the raw ceiling?)
    @jax.jit
    def chain4(i4):
        ch = mk_chain(fbdev, nb)

        def step(_, i0):
            return None, ch.__wrapped__(i0) if hasattr(ch, "__wrapped__") else ch(i0)
        _, s = jax.lax.scan(step, None, i4)
        return jnp.sum(s)

    for nbatch in (2, 4):
        B = 131_072 // nbatch
        i4 = jnp.asarray(rng.integers(0, nb, size=(nbatch, B), dtype=np.int32))
        tb = timeit(chain4, i4)
        print(f"(b2) raw chains {nbatch}x{B//1024}k: "
              f"{2*nbatch*B*K/tb/1e6:7.1f} M row-gathers/s")


if __name__ == "__main__":
    main()
