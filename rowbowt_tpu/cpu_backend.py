"""ctypes binding to the native single-thread CPU query engine
(native/cpu_engine.cpp) — the vs_baseline reference for bench.py and a host
fallback when no accelerator is present."""

from __future__ import annotations

import ctypes

import numpy as np

from rowbowt_tpu.construct.sa import _load_native
from rowbowt_tpu.index import RbtIndex


def available() -> bool:
    lib = _load_native()
    return lib is not None and hasattr(lib, "rbt_cpu_count")


def count_ranges_fb2(big, qcodes: np.ndarray, lengths: np.ndarray):
    """Single-thread C++ count over a BigIndex's two-level fused-block tables
    — equivalent work to the device engine (ops/rank.py rank_fblock2), the
    honest CPU baseline for the n >= 2^31 config."""
    lib = _load_native()
    f = lib.rbt_cpu_count_fb2
    f.restype = None
    fb2 = np.ascontiguousarray(big.fb2, dtype=np.int32)
    base = np.ascontiguousarray(big.base, dtype=np.int64)
    F = np.ascontiguousarray(big.F, dtype=np.int64)
    q = np.ascontiguousarray(qcodes, dtype=np.int16)
    lens = np.ascontiguousarray(lengths, dtype=np.int32)
    nq, stride = q.shape
    lo = np.empty(nq, dtype=np.int64)
    hi = np.empty(nq, dtype=np.int64)
    i64p = ctypes.POINTER(ctypes.c_int64)
    f(
        fb2.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_int64(fb2.shape[0]), ctypes.c_int64(big.per_blk),
        base.ctypes.data_as(i64p), ctypes.c_int64(base.shape[0]),
        F.ctypes.data_as(i64p), ctypes.c_int64(big.A), ctypes.c_int64(big.n),
        q.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
        lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_int64(nq), ctypes.c_int64(stride),
        lo.ctypes.data_as(i64p), hi.ctypes.data_as(i64p),
    )
    return lo, hi


def count_ranges(idx: RbtIndex, qcodes: np.ndarray, lengths: np.ndarray):
    """Single-thread C++ count over an [nq, L] right-aligned code batch."""
    lib = _load_native()
    f = lib.rbt_cpu_count
    f.restype = None
    rs = np.ascontiguousarray(idx.run_start, dtype=np.int64)
    occ = np.ascontiguousarray(idx.occ.reshape(-1), dtype=np.int64)
    F = np.ascontiguousarray(idx.F, dtype=np.int64)
    head = np.ascontiguousarray(idx.run_head, dtype=np.uint8)
    q = np.ascontiguousarray(qcodes, dtype=np.int16)
    lens = np.ascontiguousarray(lengths, dtype=np.int32)
    nq, stride = q.shape
    lo = np.empty(nq, dtype=np.int64)
    hi = np.empty(nq, dtype=np.int64)
    c_i64p = ctypes.POINTER(ctypes.c_int64)
    f(
        rs.ctypes.data_as(c_i64p), ctypes.c_int64(idx.R),
        occ.ctypes.data_as(c_i64p), F.ctypes.data_as(c_i64p),
        ctypes.c_int64(idx.A),
        head.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int64(idx.n),
        q.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
        lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_int64(nq), ctypes.c_int64(stride),
        lo.ctypes.data_as(c_i64p), hi.ctypes.data_as(c_i64p),
    )
    return lo, hi
