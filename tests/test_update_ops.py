"""Property tests for ops/update.py: the slot helpers and the arithmetic
window expansion must equal a literal replay of the reference append
semantics (the old engine.markers._append_right) on random inputs."""

import numpy as np

from rowbowt_tpu.ops import update as U


def _append_right_ref(buf, used, vals, cnt):
    """The original right-append replay (engine.markers pre-round-2)."""
    B, K = buf.shape
    for b in range(B):
        c = int(min(cnt[b], K))
        start = K - int(used[b]) - c
        for q in range(K):
            src = q - start
            if 0 <= src < c and q < K - int(used[b]):
                buf[b, q] = vals[b, src]
        used[b] = min(int(used[b]) + c, K)
    return buf, used


def test_window_entry_ids_matches_replay():
    rng = np.random.default_rng(0)
    B, W, K = 64, 7, 8
    for trial in range(20):
        nrec = rng.integers(0, W + 1, size=B)
        ws = rng.integers(0, 1000, size=(B, W))
        wc = rng.integers(0, 5, size=(B, W))
        entry, valid, used, total = map(
            np.asarray, U.window_entry_ids(
                np.asarray(ws, np.int32), np.asarray(wc, np.int32),
                np.asarray(nrec, np.int32), K))

        # literal replay
        buf = np.full((B, K), -1, dtype=np.int64)
        u = np.zeros(B, dtype=np.int64)
        t = np.zeros(B, dtype=np.int64)
        for w in range(W):
            live = w < nrec
            cnt = np.where(live, wc[:, w], 0)
            vals = ws[:, w][:, None] + np.arange(K)[None, :]
            vals = np.where(np.arange(K)[None, :] < cnt[:, None], vals, -1)
            buf, u = _append_right_ref(buf, u, vals, np.minimum(cnt, K))
            t = t + cnt
        got = np.where(valid, entry, -1)
        np.testing.assert_array_equal(got, buf, err_msg=f"trial {trial}")
        np.testing.assert_array_equal(used, u)
        np.testing.assert_array_equal(total, t)


def test_slot_helpers_roundtrip():
    rng = np.random.default_rng(1)
    B, W = 32, 5
    arr = rng.integers(0, 100, size=(W, B)).astype(np.int32)
    slot = rng.integers(0, W, size=B).astype(np.int32)
    mask = rng.random(B) < 0.7
    val = rng.integers(0, 100, size=B).astype(np.int32)
    out = np.asarray(U.tslot_set(arr, slot, mask, val))
    want = arr.copy()
    want[slot[mask], np.flatnonzero(mask)] = val[mask]
    np.testing.assert_array_equal(out, want)
    got = np.asarray(U.tslot_get(out, slot))
    np.testing.assert_array_equal(got, out[slot, np.arange(B)])
