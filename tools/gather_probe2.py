"""Probe 2: gather cost vs batch size, element width, paired slices, and
independent-vs-chained gathers (all on a 64MB table)."""

import sys
import time

import numpy as np


def timeit(fn, *a, n=10):
    import jax
    jax.block_until_ready(fn(*a))
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*a))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    import jax
    import jax.numpy as jnp

    STEPS = 50
    T = 16 * (1 << 20)  # 16M int32 = 64MB
    rng = np.random.default_rng(0)
    tab = jnp.asarray(rng.integers(0, T, size=T, dtype=np.int32))
    tab64 = tab.astype(jnp.int64)  # 128MB int64

    def chained(tabx):
        @jax.jit
        def f(idx):
            def body(j, i):
                return tabx[i].astype(jnp.int32) % T
            return jax.lax.fori_loop(0, STEPS, body, idx)
        return f

    for B in [8192, 32768, 131072]:
        idx0 = jnp.asarray(rng.integers(0, T, size=B, dtype=np.int32))
        t = timeit(chained(tab), idx0) / STEPS
        print(f"B={B:6d} i32 : {t*1e6:8.1f} us/step  {t/B*1e9:6.2f} ns/elem", flush=True)

    B = 32768
    idx0 = jnp.asarray(rng.integers(0, T, size=B, dtype=np.int32))

    t = timeit(chained(tab64), idx0) / STEPS
    print(f"B={B:6d} i64 : {t*1e6:8.1f} us/step  {t/B*1e9:6.2f} ns/elem", flush=True)

    # paired slice gather: rows of a [T/2, 2] table (16B contiguous per row)
    tab2 = tab.reshape(T // 2, 2)

    @jax.jit
    def paired(idx):
        def body(j, i):
            rows = tab2[i]  # [B, 2]
            return (rows[:, 0] ^ rows[:, 1]) % (T // 2)
        return jax.lax.fori_loop(0, STEPS, body, idx)

    idxp = jnp.asarray(rng.integers(0, T // 2, size=B, dtype=np.int32))
    t = timeit(paired, idxp) / STEPS
    print(f"B={B:6d} 2xi32 rows: {t*1e6:8.1f} us/step  {t/(2*B)*1e9:6.2f} ns/elem",
          flush=True)

    # two independent gathers per step vs one
    @jax.jit
    def indep2(idx):
        def body(j, i):
            a = tab[i]
            b = tab[(i + 7) % T]
            return (a ^ b) % T
        return jax.lax.fori_loop(0, STEPS, body, idx)

    t = timeit(indep2, idx0) / STEPS
    print(f"B={B:6d} 2 indep  : {t*1e6:8.1f} us/step  {t/(2*B)*1e9:6.2f} ns/elem",
          flush=True)

    # sorted indices: does locality help?
    @jax.jit
    def sorted_g(idx):
        def body(j, i):
            return tab[jnp.sort(i)] % T
        return jax.lax.fori_loop(0, STEPS, body, idx)

    t = timeit(sorted_g, idx0) / STEPS
    print(f"B={B:6d} sort+gath: {t*1e6:8.1f} us/step  {t/B*1e9:6.2f} ns/elem", flush=True)


if __name__ == "__main__":
    main()
