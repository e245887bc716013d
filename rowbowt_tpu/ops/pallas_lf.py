"""Pallas fused LF kernel: the whole batched backward-search loop in one
kernel with the fused-block rank table RESIDENT IN VMEM.

NEGATIVE RESULT (kept as the executable record of the experiment SURVEY.md §7
step 6 calls for; numbers in DESIGN.md "Pallas fused LF").  The kernel is
correct — parity-tested in interpret mode (tests/test_backends.py) — but
CANNOT COMPILE on current Mosaic: the only dynamic gather TPU Pallas lowers is
the shape-preserving take_along_axis form (`tpu.dynamic_gather`, operand /
indices / output all the same shape — jax 0.9.0
_src/pallas/mosaic/lowering.py::_gather_lowering_rule), so "gather B rows
from an nb-row VMEM table" has no vectorized lowering and JAX's decomposition
recurses unboundedly.  The serial alternatives (per-lane fori_loop with
dynamic-slice loads, or per-lane DMA) cost >= 26 M sequential scalar
iterations per 131k-lane batch — worse by construction than the 155 ms the
XLA gather engine takes for the whole loop (844k reads/s, tools/
pallas_probe.py).  XLA's native gather unit IS the TPU's vectorized random
access path; the fusion that matters (checkpoint + packed words in one HBM
row) lives in the fblock LAYOUT (ops.rank.lf_step_fblock), not in a kernel.

Match: rle_string::rank, /root/reference/include/rle_string.hpp:131-161.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rowbowt_tpu.construct.build import DENSE_BLOCK, FB_CKPT, FB_ROW

def _swar_count(words_u32, off, c):
    """Matching-nibble popcount below `off` (same math as ops.rank)."""
    nib_low = jnp.uint32(0x11111111)  # built in-trace: kernels can't capture arrays
    pat = (c.astype(jnp.uint32) * nib_low)[:, None]
    x = words_u32 ^ pat
    t = x | (x >> 1) | (x >> 2) | (x >> 3)
    match = (~t) & nib_low
    nw = words_u32.shape[1]
    kn = jnp.clip(off[:, None] - 8 * jax.lax.broadcasted_iota(
        off.dtype, (1, nw), 1), 0, 8)
    mask = jnp.where(kn >= 8, jnp.uint32(0xFFFFFFFF),
                     (jnp.uint32(1) << (4 * kn.astype(jnp.uint32))) - 1)
    return jnp.sum(jax.lax.population_count(match & mask), axis=1)


def _lf_kernel(fb_ref, F_ref, q_ref, len_ref, lo_ref, hi_ref, *, n, L):
    fb = fb_ref[:]  # [nb, 24] resident in VMEM
    F = F_ref[:]  # [1, 8]
    TB = q_ref.shape[0]

    def rank(i, c):
        isafe = jnp.minimum(i, n - 1)
        blk = isafe >> 7
        off = isafe & (DENSE_BLOCK - 1)
        row = jnp.take(fb, blk, axis=0, mode="clip")  # [TB, 24] VMEM gather
        sel8 = jax.lax.broadcasted_iota(jnp.int32, (TB, FB_CKPT), 1) == c[:, None]
        occ = jnp.sum(jnp.where(sel8, row[:, :FB_CKPT], 0), axis=1)
        words = jax.lax.bitcast_convert_type(row[:, FB_CKPT:], jnp.uint32)
        v = occ + _swar_count(words, off, c).astype(occ.dtype)
        return jnp.where(i >= n, 0, v)  # i==n handled by caller via totals

    def f_of(c):
        sel = jax.lax.broadcasted_iota(jnp.int32, (TB, FB_CKPT), 1) == c[:, None]
        return jnp.sum(jnp.where(sel, F[0, :FB_CKPT][None, :], 0), axis=1)

    lens = len_ref[:]
    lo0 = jnp.zeros((TB,), jnp.int32)
    hi0 = jnp.full((TB,), n - 1, jnp.int32)
    done0 = jnp.zeros((TB,), jnp.bool_)

    def body(j, st):
        lo, hi, done = st
        c = q_ref[:, L - 1 - j]
        active = (~done) & (j < lens)
        csafe = jnp.maximum(c, 0)
        cb = rank(lo, csafe)
        # hi+1 may be n: rank(n, c) = total count = F[c+1]-F[c]; fold via where
        hi1 = hi + 1
        ci_raw = rank(jnp.minimum(hi1, n - 1), csafe)
        total = f_of(csafe + 1) - f_of(csafe)
        ci = jnp.where(hi1 >= n, total, ci_raw) - cb
        nlo = f_of(csafe) + cb
        nhi = nlo + ci - 1
        empty = (ci <= 0) | (c < 0)
        nlo = jnp.where(empty, 1, nlo).astype(jnp.int32)
        nhi = jnp.where(empty, 0, nhi).astype(jnp.int32)
        lo = jnp.where(active, nlo, lo)
        hi = jnp.where(active, nhi, hi)
        done = done | (active & empty)
        return lo, hi, done

    lo, hi, _ = jax.lax.fori_loop(0, L, body, (lo0, hi0, done0))
    lo_ref[:] = lo
    hi_ref[:] = hi


@functools.partial(jax.jit, static_argnames=("tile",))
def find_ranges_pallas(dx, qcodes, lengths, tile: int = 1024):
    """Pallas-fused count path over a VMEM-resident fblock.  qcodes [B, L]
    int32 right-aligned (-1 pad), B divisible by tile.  Returns (lo, hi)."""
    fb = dx.arrays["fblock"]
    nb = fb.shape[0]
    assert nb * FB_ROW * 4 <= 12 * (1 << 20), "fblock too large for VMEM"
    B, L = qcodes.shape
    assert B % tile == 0
    # F8 holds A+1 fence values in FB_CKPT lanes and the kernel one-hots over
    # f_of(c+1) for c in [0, A): both need A < FB_CKPT, not just A <= FB_CKPT
    assert dx.A < FB_CKPT, f"pallas LF needs A<{FB_CKPT}, got {dx.A}"
    F8 = jnp.zeros((1, FB_CKPT), jnp.int32).at[0, : dx.A + 1].set(
        dx.arrays["F"][: dx.A + 1].astype(jnp.int32))

    kern = functools.partial(_lf_kernel, n=dx.n, L=L)
    lo, hi = pl.pallas_call(
        kern,
        grid=(B // tile,),
        in_specs=[
            pl.BlockSpec((nb, FB_ROW), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, FB_CKPT), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, L), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile,), lambda i: (i,), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile,), lambda i: (i,), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B,), jnp.int32),
            jax.ShapeDtypeStruct((B,), jnp.int32),
        ],
    )(fb, F8, qcodes.astype(jnp.int32), lengths.astype(jnp.int32))
    return lo, hi
