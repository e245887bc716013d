"""BigIndex: the n >= 2^31 count-path index artifact.

The reference contract is u64 row indices throughout (toehold_sa.hpp:133-155);
TPU gathers want int32 row ids.  The two-level layout splits the difference:

  fb2   int32[nb_pad, 24] — fused-block rows (8 checkpoint lanes + 16 packed
        4-bit BWT words per 128 symbols, construct.build.build_fblock) whose
        checkpoints are SUPERBLOCK-local, so int32 never overflows;
  base  int64[n_sup, 8]   — global per-char count before each superblock.

rank(i, c) = base[superblock(i), c] + local checkpoint + in-block popcount
(ops.rank.rank_fblock2).  Only the LANES (lo/hi/i) are int64; every gather
index stays int32 up to n = 2^38.  The same arrays reshape directly into the
position-sharded multi-chip layout (parallel.sharded_dense.ShardedDenseIndex)
when n_sup == n_idx, so one artifact serves both the single-chip and the
sharded engines.

Not stored: run tables, toehold SA, markers — this is the count-first artifact
(BASELINE config 5's prerequisite); the sharded layout adds those from the
full construction when present.
"""

from __future__ import annotations

import dataclasses
import json
import os

import numpy as np

from rowbowt_tpu.alphabet import Alphabet

_SUP_SYMS_MAX = 1 << 30  # superblock symbol span: int32 checkpoints with 2x margin


@dataclasses.dataclass
class BigIndex:
    fb2: np.ndarray  # int32[nb_pad, 24]
    base: np.ndarray  # int64[n_sup, 8]
    F: np.ndarray  # int64[A+1]
    n: int
    A: int
    per_blk: int  # fb rows per superblock
    alpha: Alphabet
    prefix: str | None = None  # load dir; enables the fb2_64 repack cache

    @property
    def n_sup(self) -> int:
        return self.base.shape[0]

    @staticmethod
    def from_codes(codes: np.ndarray, alpha: Alphabet, n_sup: int | None = None,
                   ) -> "BigIndex":
        """Build straight from BWT codes (uint8, values < A <= 8): no global
        int32 table is ever materialized — per-superblock fblocks have local
        checkpoints; `base` carries the int64 offsets."""
        from rowbowt_tpu.construct.build import DENSE_BLOCK
        from rowbowt_tpu.parallel.sharded_dense import ShardedDenseIndex

        n = int(codes.shape[0])
        A = alpha.size
        if n_sup is None:
            n_sup = max(2, -(-n // _SUP_SYMS_MAX))
        fb3, base, per_blk = ShardedDenseIndex.fb3_from_codes(codes, A, n_sup)
        counts = np.zeros(A + 1, dtype=np.int64)
        counts[1:] = np.bincount(codes, minlength=A)[:A]
        F = np.cumsum(counts)
        return BigIndex(fb2=fb3.reshape(-1, fb3.shape[-1]), base=base, F=F,
                        n=n, A=A, per_blk=per_blk, alpha=alpha)

    # ---------------- serialization (.npy so mmap load works) ----------------

    def save(self, prefix: str) -> None:
        os.makedirs(prefix, exist_ok=True)
        np.save(os.path.join(prefix, "fb2.npy"), self.fb2)
        np.save(os.path.join(prefix, "base.npy"), self.base)
        np.save(os.path.join(prefix, "F.npy"), self.F)
        with open(os.path.join(prefix, "meta.json"), "w") as f:
            json.dump({"format": "rowbowt-tpu-bigindex", "version": 1,
                       "n": self.n, "A": self.A, "per_blk": self.per_blk,
                       "alpha_bytes": self.alpha.bytes_.tolist()}, f)

    @staticmethod
    def load(prefix: str, mmap: bool = True) -> "BigIndex":
        with open(os.path.join(prefix, "meta.json")) as f:
            meta = json.load(f)
        mm = "r" if mmap else None
        return BigIndex(
            fb2=np.load(os.path.join(prefix, "fb2.npy"), mmap_mode=mm),
            base=np.load(os.path.join(prefix, "base.npy")),
            F=np.load(os.path.join(prefix, "F.npy")),
            n=int(meta["n"]), A=int(meta["A"]), per_blk=int(meta["per_blk"]),
            alpha=Alphabet(np.array(meta["alpha_bytes"], dtype=np.uint8)),
            prefix=prefix,
        )

    # ---------------- engine views ----------------

    def device_index(self, device=None, fb64: bool = True):
        """Single-chip DeviceIndex: count via ops.rank.lf_step_fblock2.

        fb64=True (default) repacks to 64-symbol/64B rows at load: a big
        index is by definition far out of cache, where the smaller row gather
        wins 1.29x (tools/fblock_probe.py part3).  Checkpoints stay
        superblock-local so the repack arithmetic is unchanged."""
        import jax
        import jax.numpy as jnp

        from rowbowt_tpu.engine.device import DeviceIndex

        if fb64:
            from rowbowt_tpu.construct.build import fblock_to_fb64
            key = "fb2_64"
            cache = (os.path.join(self.prefix, "fb2_64.npy")
                     if self.prefix else None)
            if cache and os.path.exists(cache):
                fb = np.load(cache, mmap_mode="r")
            else:
                fb = fblock_to_fb64(np.asarray(self.fb2), self.n)
                if cache:
                    np.save(cache, fb)
        else:
            key, fb = "fb2", np.ascontiguousarray(self.fb2)
        arrs = {
            key: jnp.asarray(fb),
            "fb2_base": jnp.asarray(self.base),
            "F": jnp.asarray(self.F.astype(np.int64)),
        }
        if device is not None:
            arrs = {k: jax.device_put(v, device) for k, v in arrs.items()}
        acgt = self.alpha.encode(np.frombuffer(b"ACGT", dtype=np.uint8))
        return DeviceIndex(arrays=arrs, n=self.n, R=0, A=self.A, ma_wsize=0,
                           ftab_k=0, acgt_codes=tuple(int(c) for c in acgt))

    def sharded_index(self):
        """The position-sharded view (n_idx == n_sup shards) for mesh runs."""
        from rowbowt_tpu.parallel.sharded_dense import ShardedDenseIndex

        return ShardedDenseIndex(
            fb3=np.ascontiguousarray(
                self.fb2.reshape(self.n_sup, self.per_blk, -1)),
            base=self.base, F=self.F.astype(np.int64), n=self.n, A=self.A,
            n_idx=self.n_sup, per_blk=self.per_blk, k0=0,
        )
