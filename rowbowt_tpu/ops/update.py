"""Slot updates without scatter ops.

TPU lowers `arr.at[rows, slot].set(val)` to a real scatter, which serializes
per element.  Every in-loop record in the engines writes one dynamic SLOT per
lane into a small fixed width (W window records, S seed slots), so a one-hot
select over the width is pure VPU work — O(B*W) elementwise vs a serialized
scatter — and fuses into the surrounding loop body.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def slot_set(arr, slot, mask, val):
    """arr[b, slot[b]] = val[b] where mask[b], as a one-hot select.

    arr [B, W]; slot [B] int; mask [B] bool; val [B] (or scalar)."""
    onehot = jax.lax.broadcasted_iota(jnp.int32, arr.shape, 1) == (
        slot[:, None].astype(jnp.int32))
    v = jnp.broadcast_to(jnp.asarray(val, dtype=arr.dtype)[..., None]
                         if jnp.ndim(val) else jnp.asarray(val, arr.dtype),
                         arr.shape)
    return jnp.where(onehot & mask[:, None], v, arr)


def slot_get(arr, slot):
    """arr[b, slot[b]] as a one-hot dot (gather-free).  arr [B, W]."""
    onehot = jax.lax.broadcasted_iota(jnp.int32, arr.shape, 1) == (
        slot[:, None].astype(jnp.int32))
    return jnp.sum(jnp.where(onehot, arr, 0), axis=1)


def slot_set_rows(arr, slot, mask, rowval):
    """arr[b, slot[b], :] = rowval[b, :] where mask[b].

    arr [B, S, K]; slot [B]; mask [B] or [B, K]; rowval [B, K]."""
    B, S, K = arr.shape
    onehot = jax.lax.broadcasted_iota(jnp.int32, (B, S), 1) == (
        slot[:, None].astype(jnp.int32))
    m = mask if mask.ndim == 2 else jnp.broadcast_to(mask[:, None], (B, K))
    full = onehot[:, :, None] & m[:, None, :]
    return jnp.where(full, rowval.astype(arr.dtype)[:, None, :], arr)
