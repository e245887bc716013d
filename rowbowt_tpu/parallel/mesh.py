"""Device mesh + sharding layout for the query engines.

Two axes (DESIGN.md, SURVEY.md §2.3):
  'dp'  — reads are data-parallel across chips (the reference's pthread pool
          over reads, rb_markers.cpp:318-535, becomes batch sharding).
  'idx' — for indexes too big for one chip, the run tables shard along R
          (see parallel/sharded.py); size 1 replicates the index.

With the index replicated and the batch sharded over 'dp', jit partitions every
engine automatically — no collectives needed until the final host gather, which
preserves read order (the reference's rb_align ordering guarantee).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_dp: int | None = None, n_idx: int = 1, devices=None) -> Mesh:
    devs = list(devices if devices is not None else jax.devices())
    if n_dp is None:
        n_dp = len(devs) // n_idx
    devs = devs[: n_dp * n_idx]
    arr = np.array(devs).reshape(n_dp, n_idx)
    return Mesh(arr, ("dp", "idx"))


def shard_queries(mesh: Mesh, qcodes, lengths):
    """Place a [B, L] batch sharded over 'dp' (B must divide by mesh dp size)."""
    s_q = NamedSharding(mesh, P("dp", None))
    s_l = NamedSharding(mesh, P("dp"))
    return jax.device_put(qcodes, s_q), jax.device_put(lengths, s_l)


def replicate_index(mesh: Mesh, dx):
    """Replicate every index table across the mesh."""
    rep = NamedSharding(mesh, P())
    arrays = {k: jax.device_put(v, rep) for k, v in dx.arrays.items()}
    import dataclasses

    return dataclasses.replace(dx, arrays=arrays)


def pad_batch_to(qcodes: np.ndarray, lengths: np.ndarray, multiple: int):
    """Pad the batch dim so it divides the dp axis (padded lanes have length 0)."""
    B = qcodes.shape[0]
    rem = (-B) % multiple
    if rem == 0:
        return qcodes, lengths, B
    qpad = np.full((rem, qcodes.shape[1]), -1, dtype=qcodes.dtype)
    lpad = np.zeros(rem, dtype=lengths.dtype)
    return (
        np.concatenate([qcodes, qpad]),
        np.concatenate([lengths, lpad]),
        B,
    )
