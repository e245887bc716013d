"""Batched backward search (count path).

The TPU-native equivalent of RowBowt::find_range (rowbowt.hpp:121-131): B reads
advance one LF step per fori_loop iteration in lockstep, with done-masks; a
whole FASTQ batch is one jit'd program.  Optional ftab fast start mirrors
search_ftab (rowbowt.hpp:745-758).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from rowbowt_tpu.engine.device import DeviceIndex
from rowbowt_tpu.ops import rank as R


@partial(jax.jit, static_argnames=("use_ftab",))
def find_ranges(dx: DeviceIndex, qcodes, lengths, use_ftab: bool = True):
    """qcodes [B, L] right-aligned int32 (pad = -1), lengths [B].

    Returns (lo [B], hi [B]) with the reference's (1, 0) empty encoding.
    """
    B, L = qcodes.shape
    dt = dx.idx_dtype
    lengths = lengths.astype(dt)
    lo = jnp.zeros(B, dtype=dt)
    hi = jnp.full(B, dx.n - 1, dtype=dt)
    startj = jnp.zeros(B, dtype=dt)

    if use_ftab and dx.has_ftab and L >= dx.ftab_k > 0:
        k = dx.ftab_k
        kc = R.kmer_codes(dx, qcodes[:, L - k:])
        flo, fhi, hit = R.ftab_lookup(dx, kc)
        hit = hit & (lengths >= k)
        lo = jnp.where(hit, flo, lo)
        hi = jnp.where(hit, fhi, hi)
        startj = jnp.where(hit, k, 0).astype(dt)

    done = jnp.zeros(B, dtype=bool)
    if "occ1_flat" in dx.arrays:
        step = R.lf_step_occ1
    elif dx.has_dense:
        step = R.lf_step_dense
    else:
        step = R.lf_step

    def body(j, st):
        lo, hi, done = st
        c = qcodes[:, L - 1 - j].astype(dt)
        active = (~done) & (j >= startj) & (j < lengths)
        nlo, nhi = step(dx, lo, hi, c)
        lo = jnp.where(active, nlo, lo)
        hi = jnp.where(active, nhi, hi)
        done = done | (active & (nlo > nhi))
        return lo, hi, done

    lo, hi, _ = jax.lax.fori_loop(0, L, body, (lo, hi, done))
    return lo, hi


def counts_from_ranges(lo, hi):
    """count = hi-lo+1, 0 when empty — matches rb_align's unsigned-wrap print
    semantics (rb_align.cpp:122) where the (1,0) empty range yields 0."""
    return jnp.where(hi >= lo, hi - lo + 1, 0)


# ---------------- run-jump fast path (lfj table) ----------------
#
# Cost model measured on TPU v5e (tools/gather_probe*.py): a random gather
# costs ~0.5 ms fixed latency + ~14 ns/element, independent of table size and
# element width, and a [B, 2] contiguous-row gather costs the same as [B].
# The 2-rank LF loop is therefore latency-bound at ~2 gathered elements per
# lane-step.  The lfj table advances 10 exact steps per ONE [B, 2] gather for
# every lane whose range stays inside single BWT runs (the steady state of
# pangenome search: all H haplotype copies of a context are BWT-adjacent and
# share their preceding char); lanes that leave that regime are replayed
# exactly by find_ranges via count_with_repair.

LFJ_J = 10  # must match construct.build.LFJ_J
_LFJ_LO_MASK = (1 << 32) - 1
_LFJ_INVALID_BIT = 60  # read-pack bit set when a window has a non-index char


def _read_packs(qcodes, J: int):
    """wp[:, j] = the J chars at steps j..j+J-1 (right-to-left read order),
    4 bits each; bit 60 set when any of them is not an index char."""
    B, L = qcodes.shape
    q_step = qcodes[:, ::-1].astype(jnp.int64)  # column j = char at step j
    W = L - J + 1
    wp = jnp.zeros((B, W), dtype=jnp.int64)
    inv = jnp.zeros((B, W), dtype=bool)
    for t in range(J):
        c = q_step[:, t:t + W]
        inv = inv | (c < 0)
        wp = wp | (jnp.where(c < 0, 0, c) << (4 * t))
    return wp | (inv.astype(jnp.int64) << _LFJ_INVALID_BIT)


def _jump_impl(dx: DeviceIndex, qcodes, lengths, use_ftab: bool, lo0, hi0):
    """Backward search via the lfj jump table.

    Returns (lo, hi, broken, jbrk).  Lanes with broken=False hold EXACTLY
    find_ranges' result.  Broken lanes (range left the single-run regime or is
    wider than the 255 slack cap; with ftab: k-mer miss or read shorter than
    k) hold their exact intermediate state after jbrk processed chars — the
    repair driver resumes them from that state with the unprocessed prefix.
    """
    B, L = qcodes.shape
    J = LFJ_J
    dt = dx.idx_dtype
    m = lengths.astype(dt)
    if lo0 is None:
        lo = jnp.zeros(B, dtype=dt)
        hi = jnp.full(B, dx.n - 1, dtype=dt)
    else:
        lo = lo0.astype(dt)
        hi = hi0.astype(dt)
    done = jnp.zeros(B, dtype=bool)
    broken = jnp.zeros(B, dtype=bool)
    jbrk = jnp.zeros(B, dtype=dt)

    ftk = dx.ftab_k if (use_ftab and dx.has_ftab and L >= dx.ftab_k > 0) else 0
    if ftk:
        kc = R.kmer_codes(dx, qcodes[:, L - ftk:])
        flo, fhi, hit = R.ftab_lookup(dx, kc)
        hit = hit & (m >= ftk)
        broken = broken | (~hit & (m > 0))
        lo = jnp.where(hit, flo.astype(dt), lo)
        hi = jnp.where(hit, fhi.astype(dt), hi)
    j0 = ftk

    # per-lane slow prefix: start == len (mod J) so jumps consume whole J-char
    # windows, and start >= MIN_SLOW so the range has narrowed enough for the
    # single-run regime before the first jump (without the slow prefix a full
    # range always fails the dist check and the lane would break for nothing).
    MIN_SLOW = 10
    E = -(-max(MIN_SLOW - j0, 0) // J)  # extra whole-J delays (0 when ftab covers it)
    rem = jnp.where(m > j0, (m - j0) % J, 0).astype(dt)
    extra = jnp.minimum(
        (jnp.maximum(MIN_SLOW - j0 - rem, 0) + J - 1) // J, E
    ).astype(dt)
    start = jnp.minimum(j0 + rem + extra * J, m)

    def phase_a(st):
        lo, hi, done = st
        for u in range((J - 1) + E * J):
            j = j0 + u
            if j >= L:
                break
            c = qcodes[:, L - 1 - j].astype(dt)
            active = (~done) & (~broken) & (j < start)
            nlo, nhi = R.lf_step_occ1(dx, lo, hi, c)
            lo = jnp.where(active, nlo, lo)
            hi = jnp.where(active, nhi, hi)
            done = done | (active & (nlo > nhi))
        return lo, hi, done

    lo, hi, done = jax.lax.cond(
        jnp.any((start > j0) & ~broken), phase_a, lambda st: st, (lo, hi, done)
    )

    sz = hi - lo + 1  # constant across jumps (whole range survives or empties)
    szm1 = jnp.minimum(sz.astype(jnp.int64) - 1, 256)
    # lane jumps occupy global lattice slots [extra, extra + nj): slot t reads
    # the pack at column j0 + rem + t*J for every lane (J-way select by rem)
    njtot = jnp.where(m > j0, (m - j0 - rem) // J, 0).astype(dt)

    T = max((L - j0) // J, 0)
    if T:
        done_a = done  # emptied before the jump phase: (lo, hi) already (1, 0)
        wp = _read_packs(qcodes, J)
        Wcols = wp.shape[1]
        lfj = dx.arrays["lfj"]
        lo64 = lo.astype(jnp.int64)
        done_e = jnp.zeros(B, dtype=bool)  # emptied during jumps
        for t in range(T):
            inb = (~done) & (~broken) & (t >= extra) & (t < njtot)
            e = lfj[jnp.clip(lo64, 0, dx.n - 1)]
            e0, e1 = e[:, 0], e[:, 1]
            nlo = e0 & _LFJ_LO_MASK
            mind = (e0 >> 32) & 0xFF
            ech = ((e0 >> 40) & 0xFFFFFF) | ((e1 & 0xFFFF) << 24)
            rp = wp[:, min(j0 + t * J, Wcols - 1)]
            for off in range(1, J):
                col = min(j0 + off + t * J, Wcols - 1)
                rp = jnp.where(rem == off, wp[:, col], rp)
            dist_ok = mind >= szm1
            match = rp == ech
            adv = inb & dist_ok & match
            emp = inb & dist_ok & ~match
            newb = inb & ~dist_ok
            jbrk = jnp.where(newb, (start + (t - extra) * J).astype(dt), jbrk)
            broken = broken | newb
            lo64 = jnp.where(adv, nlo, lo64)
            done = done | emp
            done_e = done_e | emp
        # broken lanes included: lo64 is their exact state at the break
        moved = (njtot > extra) & ~done_a & ~done_e
        lo = jnp.where(moved, lo64.astype(dt), lo)
        hi = jnp.where(moved, (lo64 + sz.astype(jnp.int64) - 1).astype(dt), hi)
        lo = jnp.where(done_e, jnp.ones((), dt), lo)
        hi = jnp.where(done_e, jnp.zeros((), dt), hi)
    return lo, hi, broken, jbrk


@partial(jax.jit, static_argnames=("use_ftab",))
def find_ranges_jump(dx: DeviceIndex, qcodes, lengths, use_ftab: bool = True):
    return _jump_impl(dx, qcodes, lengths, use_ftab, None, None)


@jax.jit
def _find_ranges_jump_resume(dx: DeviceIndex, qcodes, lengths, lo0, hi0):
    return _jump_impl(dx, qcodes, lengths, False, lo0, hi0)


def repair_ranges(dx: DeviceIndex, qn, ln, lo, hi, broken, jbrk):
    """Resume-based repair: each round repacks every broken lane's unprocessed
    prefix (right-aligned) and re-runs the jump engine FROM the exact break
    state.  The resume's forced >=MIN_SLOW slow prefix steps past whatever
    broke the single-run regime (usually a polymorphic variant site splitting
    the haplotype copies), so every round advances each lane >=10 chars —
    termination in <= L/10 rounds, no slow full replay.  Arrays are numpy;
    lo/hi are updated in place and returned."""
    L = qn.shape[1]
    jabs = jbrk.astype(np.int64).copy()
    rounds = 0
    while True:
        sel = np.flatnonzero(broken)
        if sel.size == 0:
            break
        rounds += 1
        if rounds > L // 10 + 2:  # unreachable by construction; exact fallback
            cap = _bucket(sel.size)
            pad = np.zeros(cap, dtype=np.int64)
            pad[: sel.size] = sel
            rlo, rhi = find_ranges(dx, qn[pad], ln[pad].astype(np.int32))
            lo[sel] = np.asarray(rlo)[: sel.size]
            hi[sel] = np.asarray(rhi)[: sel.size]
            break
        cap = _bucket(sel.size)
        shift = jabs[sel]
        cols = np.arange(L)[None, :] - shift[:, None]
        q = np.full((cap, L), -1, dtype=qn.dtype)
        q[: sel.size] = np.take_along_axis(qn[sel], np.clip(cols, 0, L - 1), axis=1)
        q[: sel.size][cols < 0] = -1
        rl = np.zeros(cap, dtype=np.int32)
        rl[: sel.size] = (ln[sel] - shift).astype(np.int32)
        lo0 = np.zeros(cap, dtype=lo.dtype)
        hi0 = np.full(cap, dx.n - 1, dtype=hi.dtype)
        lo0[: sel.size] = lo[sel]
        hi0[: sel.size] = hi[sel]
        rlo, rhi, rbrk, rjb = map(
            np.asarray, _find_ranges_jump_resume(dx, q, rl, lo0, hi0)
        )
        lo[sel] = rlo[: sel.size]
        hi[sel] = rhi[: sel.size]
        jabs[sel] += rjb[: sel.size]
        nb = rbrk[: sel.size]
        broken = broken.copy()
        broken[sel] = nb
    return lo, hi


def _bucket(k: int) -> int:
    return 1 << max(int(np.ceil(np.log2(max(k, 1)))), 8)


def count_with_repair(dx: DeviceIndex, qcodes, lengths, use_ftab: bool = True):
    """Host-side driver: jump fast path + resume repair.  Returns numpy (lo, hi)
    exactly equal to find_ranges on every lane."""
    if "lfj" not in dx.arrays or "occ1_flat" not in dx.arrays:
        lo, hi = find_ranges(dx, qcodes, lengths, use_ftab=use_ftab)
        return np.asarray(lo), np.asarray(hi)
    lo, hi, broken, jbrk = map(
        np.asarray, find_ranges_jump(dx, qcodes, lengths, use_ftab=use_ftab)
    )
    qn = np.asarray(qcodes)
    ln = np.asarray(lengths).astype(np.int64)
    return repair_ranges(dx, qn, ln, lo.copy(), hi.copy(), broken.copy(), jbrk)
