"""Sharded-index backward search: run tables partitioned along R over the
'idx' mesh axis — for panel indexes whose tables exceed one chip's HBM
(SURVEY.md §2.3: 1000G-scale sharding; the one genuinely distributed kernel).

Layout: shard s owns a contiguous slice of runs and therefore the contiguous
BWT position interval [bounds[s], bounds[s+1]).  A rank(i, c) query runs the
same local searchsorted on every shard; only the owner's contribution survives
the psum over 'idx'.  One LF step = 2 ranks = 2 psums riding ICI.

Queries stay sharded over 'dp' (replicated over 'idx'), so total collective
volume per step is O(batch/dp) ints — tiny next to the HBM gathers.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from rowbowt_tpu.index import RbtIndex


@dataclasses.dataclass
class ShardedIndex:
    """Host-side container of the R-sharded tables + replicated scalars."""

    run_start: np.ndarray  # int[R_pad]  (padded with n so pads own nothing)
    run_head: np.ndarray  # int32[R_pad]
    occ: np.ndarray  # int[A, R_pad]
    F: np.ndarray  # int[A+1]
    bounds: np.ndarray  # int[n_idx+1]: first owned BWT position per shard
    n: int
    A: int
    n_idx: int

    @staticmethod
    def build(idx: RbtIndex, n_idx: int) -> "ShardedIndex":
        dt = idx.idx_dtype
        R = idx.R
        R_pad = ((R + n_idx - 1) // n_idx) * n_idx
        rs = np.full(R_pad, idx.n, dtype=dt)
        rs[:R] = idx.run_start
        head = np.zeros(R_pad, dtype=np.int32)
        head[:R] = idx.run_head
        occ = np.zeros((idx.A, R_pad), dtype=dt)
        occ[:, :R] = idx.occ
        per = R_pad // n_idx
        bounds = np.empty(n_idx + 1, dtype=dt)
        for s in range(n_idx):
            r0 = s * per
            bounds[s] = rs[r0] if r0 < R else idx.n
        bounds[n_idx] = idx.n
        return ShardedIndex(
            run_start=rs, run_head=head, occ=occ,
            F=idx.F.astype(dt), bounds=bounds,
            n=idx.n, A=idx.A, n_idx=n_idx,
        )

    def device_put(self, mesh: Mesh):
        sh_r = NamedSharding(mesh, P(None, "idx"))  # occ [A, R]
        sh_v = NamedSharding(mesh, P("idx"))
        rep = NamedSharding(mesh, P())
        return (
            jax.device_put(self.run_start, sh_v),
            jax.device_put(self.run_head, sh_v),
            jax.device_put(self.occ, sh_r),
            jax.device_put(self.F, rep),
            jax.device_put(self.bounds, rep),
        )


def find_ranges_sharded(mesh: Mesh, sidx: ShardedIndex, tables, qcodes, lengths):
    """Batched count over the R-sharded index.  qcodes [B, L] right-aligned,
    sharded over 'dp'; returns (lo [B], hi [B]) with (1,0) empty encoding."""
    n, A = sidx.n, sidx.A
    run_start, run_head, occ, F, bounds = tables
    B, L = qcodes.shape

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P("idx"), P("idx"), P(None, "idx"), P(), P(),
                  P("dp", None), P("dp")),
        out_specs=(P("dp"), P("dp")),
    )
    def run(rs_loc, head_loc, occ_loc, F_, bounds_, qc, lens):
        my = jax.lax.axis_index("idx")
        lo_own, hi_own = bounds_[my], bounds_[my + 1]
        dt = rs_loc.dtype
        Rloc = rs_loc.shape[0]
        occ_flat = occ_loc.reshape(-1)

        def rank_(i, c):
            csafe = jnp.maximum(c, 0)
            owner = (i >= lo_own) & (i < hi_own)
            r = jnp.searchsorted(rs_loc, jnp.minimum(i, n - 1), side="right").astype(dt) - 1
            rsafe = jnp.clip(r, 0, Rloc - 1)
            v = occ_flat[csafe * Rloc + rsafe]
            v = v + jnp.where(head_loc[rsafe] == c, i - rs_loc[rsafe], 0)
            v = jnp.where(owner, v, 0)
            v = jax.lax.psum(v, "idx")
            total = F_[csafe + 1] - F_[csafe]
            v = jnp.where(i >= n, total, v)
            return jnp.where(c < 0, 0, v)

        # derive the init carry from qc so it carries the 'dp'-varying axis type
        zero_lane = (qc[:, 0] * 0).astype(dt)
        lo = zero_lane
        hi = zero_lane + (n - 1)
        done = zero_lane != 0
        lens_ = lens.astype(dt)

        def body(j, st):
            lo, hi, done = st
            c = qc[:, L - 1 - j].astype(dt)
            active = (~done) & (j < lens_)
            cb = rank_(lo, c)
            ci = rank_(hi + 1, c) - cb
            csafe = jnp.maximum(c, 0)
            nlo = F_[csafe] + cb
            nhi = nlo + ci - 1
            empty = (ci <= 0) | (c < 0)
            one = jnp.ones((), dtype=dt)
            zero = jnp.zeros((), dtype=dt)
            nlo = jnp.where(empty, one, nlo)
            nhi = jnp.where(empty, zero, nhi)
            lo = jnp.where(active, nlo, lo)
            hi = jnp.where(active, nhi, hi)
            done = done | (active & empty)
            return lo, hi, done

        lo, hi, _ = jax.lax.fori_loop(0, L, body, (lo, hi, done))
        return lo, hi

    return jax.jit(run)(run_start, run_head, occ, F, bounds, qcodes, lengths)
