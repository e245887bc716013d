"""Batched marker-window queries.

find_ranges_w_markers == RowBowt::find_range_w_markers (rowbowt.hpp:292-339)
in lockstep: the per-read window bookkeeping (window_ei, the max_range gate and
the final (m-1)%wsize re-query quirk) becomes mask arithmetic inside the LF
loop.  Markers fill a fixed [B, K] buffer from the RIGHT so that reading the
filled tail left-to-right reproduces the reference's front-insertion order
(newest window first, CSR row order within a window).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from rowbowt_tpu.engine.device import DeviceIndex
from rowbowt_tpu.ops import rank as R
from rowbowt_tpu.ops import update as U


@partial(jax.jit, static_argnames=("wsize", "max_range", "max_k"))
def find_ranges_w_markers(dx: DeviceIndex, qcodes, lengths, wsize: int,
                          max_range: int = 1 << 62, max_k: int = 32):
    """Returns (lo, hi, markers [B, max_k] int64 left-packed to the RIGHT,
    used [B], overflow [B]).

    Read the markers of lane b as markers[b, max_k-used[b]:] — that sequence
    equals the reference's lf.markers vector order.  Lanes shorter than wsize
    return empty (reference warns and bails, rowbowt.hpp:299-302).

    The LF loop records only each window's RANGE (pure VPU slot writes — no
    gathers beyond the LF itself); the (marker offset, count) probes run as
    ONE bulk [W*B] markers_bounds after the loop, and marker VALUES expand
    in one gather after that.  Deferring the probes out of the dependent
    chain is what makes the O(M)-CSR (big) marker path affordable: its
    bucketed lower bound costs ~9 dependent gathers per probe, which used
    to ride EVERY LF step (masked lanes still gather).
    """
    B, L = qcodes.shape
    W = L // wsize + 2  # max windows incl. the final re-query
    dt = dx.idx_dtype
    lengths = lengths.astype(dt)
    # the reference passes (uint64)-1 for "unbounded" — clamp into our dtype
    max_range = min(int(max_range), int(jnp.iinfo(dt).max))
    max_range = jnp.asarray(max_range, dtype=dt)
    m = lengths
    lo = jnp.zeros(B, dtype=dt)
    hi = jnp.full(B, dx.n - 1, dtype=dt)
    too_short = m < wsize
    done = too_short
    window_ei = m
    # transposed [W, B] RANGE records: not lane-padded inside the loop carry;
    # unwritten slots hold the empty (1, 0) range -> count 0 at bulk probe
    wlo = jnp.ones((W, B), dtype=dt)
    whi = jnp.zeros((W, B), dtype=dt)
    nw = jnp.zeros(B, dtype=dt)
    lf = R.lf_step_auto(dx)

    def record(lo, hi, gate, wlo, whi, nw):
        small = (hi - lo + 1) <= max_range
        do = gate & small
        slot = jnp.minimum(nw, W - 1).astype(jnp.int32)
        wlo = U.tslot_set(wlo, slot, do, lo)
        whi = U.tslot_set(whi, slot, do, hi)
        nw = nw + do.astype(dt)
        return wlo, whi, nw

    def body(j, st):
        lo, hi, done, window_ei, wlo, whi, nw = st
        c = qcodes[:, L - 1 - j].astype(dt)
        active = (~done) & (j < m)
        nlo, nhi = lf(dx, lo, hi, c)
        empty = nlo > nhi
        # a failed full-read search clears collected markers (rowbowt.hpp:311-313)
        fail = active & empty
        nw = jnp.where(fail, 0, nw)
        lo = jnp.where(active, nlo, lo)
        hi = jnp.where(active, nhi, hi)
        done = done | fail
        # window trigger (rowbowt.hpp:314-324)
        ok = active & ~empty
        trigger = ok & (window_ei - (m - j) >= wsize)
        wlo, whi, nw = record(lo, hi, trigger, wlo, whi, nw)
        window_ei = jnp.where(trigger, m - j, window_ei)
        return lo, hi, done, window_ei, wlo, whi, nw

    lo, hi, done, window_ei, wlo, whi, nw = jax.lax.fori_loop(
        0, L, body, (lo, hi, done, window_ei, wlo, whi, nw)
    )
    # final re-query quirk (rowbowt.hpp:328-335)
    final = (~done) & (~too_short) & (hi >= lo) & ((m - 1) % wsize != 0)
    wlo, whi, nw = record(lo, hi, final, wlo, whi, nw)

    # deferred bulk probe: ONE [W*B] markers_bounds outside the dependent
    # chain (stale slots beyond nw are probed harmlessly and masked by
    # window_entry_ids' nw bound, exactly as their stale counts were before)
    s_flat, cnt_flat = R.markers_bounds(dx, wlo.reshape(-1), whi.reshape(-1))
    ws = s_flat.reshape(W, B).astype(dt)
    wc = cnt_flat.reshape(W, B).astype(dt)

    # expansion: per-slot entry ids computed arithmetically, then ONE value
    # gather (the W-pass right-append replay did W [B, K] gathers)
    ma_val = dx.arrays["ma_val"]
    M = ma_val.shape[0]
    entry, valid, used, total = U.window_entry_ids(ws.T, wc.T, nw, max_k)
    buf = jnp.where(valid, ma_val[jnp.clip(entry, 0, M - 1)], -1)

    # failed searches report the empty range
    one = jnp.ones((), dtype=dt)
    zero = jnp.zeros((), dtype=dt)
    lo = jnp.where(done | too_short, one, lo)
    hi = jnp.where(done | too_short, zero, hi)
    return lo, hi, buf, used, total > used


@partial(jax.jit, static_argnames=("max_k",))
def markers_for_ranges(dx: DeviceIndex, lo, hi, max_k: int = 64):
    """Single-probe markers for final ranges — the rb_align -m path
    (rb_align.cpp:138: one markers_at(range) call, CSR row order)."""
    vals, cnt = R.markers_at_range(dx, lo, hi, max_k)
    return vals, cnt
