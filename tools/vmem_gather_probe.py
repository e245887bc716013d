"""Probe which pallas-TPU dynamic-gather forms compile, and their rate.

Variants:
  rows2d : tab [T//128, 128], per-element global idx -> tab[idx>>7, :] rows? no —
           take(tab, r, axis=0) gathering rows by a [B] index vector
  tala1  : take_along_axis(tab [8, T//8], idx [8, B//?], axis=1)
  tala0  : take_along_axis(tab [T//128, 128], idx [B//128? ...], axis=0)
"""

import sys
import time

import numpy as np


def bench(name, run, args, expect=None, steps=1):
    import jax
    try:
        r = jax.block_until_ready(run(*args))
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:300]}", flush=True)
        return
    ok = "?" if expect is None else np.array_equal(np.asarray(r), expect)
    best = float("inf")
    for _ in range(10):
        t0 = time.perf_counter()
        jax.block_until_ready(run(*args))
        best = min(best, time.perf_counter() - t0)
    per = best / steps
    nelem = np.asarray(r).size
    print(f"{name}: ok={ok} {per*1e6:.1f} us/step, {per/nelem*1e9:.2f} ns/elem",
          flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B = 32768
    T = 1 << 20  # 4MB int32
    STEPS = 100
    rng = np.random.default_rng(0)
    tab_np = rng.integers(0, T, size=T, dtype=np.int32)
    idx_np = rng.integers(0, T, size=B, dtype=np.int32)

    # --- variant A: gather rows of a [T, 1]-ish 2D table by [B] vector (take axis=0)
    tabA = jnp.asarray(tab_np.reshape(T // 128, 128))

    def kernelA(tab_ref, idx_ref, out_ref):
        idx = idx_ref[:]  # [B] global
        r = idx >> 7
        csel = idx & 127
        rows = jnp.take(tab_ref[:], r, axis=0)  # [B, 128]
        out_ref[:] = jnp.take_along_axis(rows, csel[:, None], axis=1)[:, 0]

    @jax.jit
    def runA(tab, idx):
        return pl.pallas_call(
            kernelA,
            out_shape=jax.ShapeDtypeStruct((B,), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(tab, idx)

    expectA = tab_np[idx_np]
    bench("A rows+tala", runA, (tabA, jnp.asarray(idx_np)), expectA)

    # --- variant B: pure take_along_axis on axis 0: tab [T//128, 128],
    # idx2d [B//128? no: [K, 128]] — per-lane gather down columns.
    tabB = jnp.asarray(tab_np.reshape(T // 128, 128))
    # build indices so that lane l of output row k reads tab[idx[k,l], l]
    idxB_np = rng.integers(0, T // 128, size=(B // 128, 128)).astype(np.int32)

    def kernelB(tab_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take_along_axis(tab_ref[:], idx_ref[:], axis=0)

    @jax.jit
    def runB(tab, idx):
        return pl.pallas_call(
            kernelB,
            out_shape=jax.ShapeDtypeStruct((B // 128, 128), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(tab, idx)

    expectB = tab_np.reshape(T // 128, 128)[idxB_np, np.arange(128)[None, :]]
    bench("B tala axis0", runB, (tabB, jnp.asarray(idxB_np)), expectB)

    # --- variant C: chained loop with variant A's gather (LF-like), timed per step
    def kernelC(tab_ref, idx_ref, out_ref):
        def body(j, i):
            r = i >> 7
            csel = i & 127
            rows = jnp.take(tab_ref[:], r, axis=0)
            return jnp.take_along_axis(rows, csel[:, None], axis=1)[:, 0]
        out_ref[:] = jax.lax.fori_loop(0, STEPS, body, idx_ref[:])

    @jax.jit
    def runC(tab, idx):
        return pl.pallas_call(
            kernelC,
            out_shape=jax.ShapeDtypeStruct((B,), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(tab, idx)

    expectC = idx_np.copy()
    for _ in range(STEPS):
        expectC = tab_np[expectC]
    bench("C chained A", runC, (tabA, jnp.asarray(idx_np)), expectC, steps=STEPS)


if __name__ == "__main__":
    main()
