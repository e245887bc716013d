"""Batched toehold locate.

find_ranges_w_toehold == RowBowt::find_range_w_toehold (rowbowt.hpp:167-184):
the toehold sample rides through the LF loop (lf_step_w_loc).  locate() is the
phi walk (ToeholdSA::locate_range, toehold_sa.hpp:37-49) vectorized across
lanes with a masked fori_loop to a static max_hits — the variable fan-out of
the reference becomes a fixed [B, max_hits] table plus a count vector.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from rowbowt_tpu.engine.device import DeviceIndex
from rowbowt_tpu.ops import rank as R


@jax.jit
def find_ranges_w_toehold(dx: DeviceIndex, qcodes, lengths):
    """Returns (lo, hi, ssamp) per lane; empty -> (1, 0, 0) like the reference."""
    B, L = qcodes.shape
    dt = dx.idx_dtype
    lengths = lengths.astype(dt)
    lo = jnp.zeros(B, dtype=dt)
    hi = jnp.full(B, dx.n - 1, dtype=dt)
    # get_last_run_sample (toehold_sa.hpp:97-99)
    k0 = (dx.arrays["samples_last"][dx.R - 1] + 1) % dx.n
    k = jnp.full(B, k0, dtype=dt)
    done = jnp.zeros(B, dtype=bool)
    step = R.lf_step_w_loc_occ1 if "tk1_flat" in dx.arrays else R.lf_step_w_loc

    def body(j, st):
        lo, hi, k, done = st
        c = qcodes[:, L - 1 - j].astype(dt)
        active = (~done) & (j < lengths)
        nlo, nhi, nk = step(dx, lo, hi, c, k)
        lo = jnp.where(active, nlo, lo)
        hi = jnp.where(active, nhi, hi)
        k = jnp.where(active, nk, k)
        done = done | (active & (nlo > nhi))
        return lo, hi, k, done

    lo, hi, k, done = jax.lax.fori_loop(0, L, body, (lo, hi, k, done))
    # a failed search clears everything (rowbowt.hpp:177-180)
    zero = jnp.zeros((), dtype=dt)
    k = jnp.where(hi < lo, zero, k)
    return lo, hi, k


@partial(jax.jit, static_argnames=("max_hits",))
def locate(dx: DeviceIndex, lo, hi, k, max_hits: int):
    """Phi walk: locs [B, max_hits] (pad -1), count [B] = min(range size, max_hits).

    Output order matches the reference exactly: toehold first, then the phi chain.
    """
    B = lo.shape[0]
    dt = lo.dtype
    n_occ = jnp.clip(hi - lo + 1, 0, max_hits)
    locs = jnp.full((B, max_hits), -1, dtype=dt)
    locs = locs.at[:, 0].set(jnp.where(n_occ > 0, k, -1))

    def body(j, st):
        locs, cur = st
        cur = R.phi_step(dx, cur)
        locs = locs.at[:, j].set(jnp.where(j < n_occ, cur, -1))
        return locs, cur

    if max_hits > 1:
        locs, _ = jax.lax.fori_loop(1, max_hits, body, (locs, k))
    return locs, n_occ


@jax.jit
def resolve_docs(dx: DeviceIndex, locs):
    """Batched DocList resolve: (doc_id, offset) for a [B, K] position table."""
    d = R.doc_of(dx, locs)
    off = locs - dx.arrays["doc_starts"][jnp.maximum(d, 0)]
    return d, off
