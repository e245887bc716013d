"""Standard benchmark: batched count (backward search) reads/s on one chip.

Builds (once, cached) a synthetic pangenome index — 1 Mbp reference + 7
haplotypes with random SNVs (~8 M chars) — then times the batched count engine
on 100bp reads and the single-thread native CPU baseline on the same work
(equivalent of the reference rb_align count loop, rb_align.cpp:162-193).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
CACHE = os.path.join(REPO, ".cache", "bench_idx")

REF_LEN = 1_000_000
N_HAPS = 7
N_VARS = 3_000
N_READS = 100_000
READ_LEN = 100
BATCH = 32768


def _ensure_native():
    lib = os.path.join(REPO, "native", "librbt_native.so")
    if not os.path.exists(lib):
        subprocess.run(["make", "-C", os.path.join(REPO, "native")], check=False,
                       capture_output=True)
    return os.path.exists(lib)


def _build_or_load_index():
    from rowbowt_tpu.index import RbtIndex

    if os.path.exists(os.path.join(CACHE, "rbt_meta.json")):
        import json as _json
        with open(os.path.join(CACHE, "rbt_meta.json")) as f:
            ver = _json.load(f).get("version", 0)
        if ver >= 3:
            idx = RbtIndex.load(CACHE)
            if idx.kval is not None and idx.ftab is not None:
                return idx
        print("bench: stale index cache; rebuilding", file=sys.stderr)
    from rowbowt_tpu.alphabet import SEP_BYTE, TERM_BYTE
    from rowbowt_tpu.construct.build import build_index
    from rowbowt_tpu.construct.panel import Marker

    rng = np.random.default_rng(1234)
    acgt = np.frombuffer(b"ACGT", dtype=np.uint8)
    ref = rng.choice(acgt, size=REF_LEN)
    var_pos = np.sort(rng.choice(REF_LEN, size=N_VARS, replace=False))
    var_alt = rng.choice(acgt, size=N_VARS)
    w = 10
    parts, doc_starts, markers = [], [], []
    pos = 0
    sep = np.full(w, SEP_BYTE, dtype=np.uint8)

    def add_doc(seq, sites):
        nonlocal pos
        doc_starts.append(pos)
        for p, allele in sites:
            markers.append(Marker(text_pos=pos + int(p), seq=0, pos=int(p), allele=allele))
        parts.append(seq)
        parts.append(sep)
        pos += len(seq) + w

    add_doc(ref, [(p, 0) for p in var_pos])
    for h in range(N_HAPS):
        hap = ref.copy()
        carry = rng.random(N_VARS) < 0.5
        hap[var_pos[carry]] = var_alt[carry]
        add_doc(hap, [(p, 1 if c else 0) for p, c in zip(var_pos, carry)])
    parts.append(np.array([TERM_BYTE], dtype=np.uint8))
    text = np.concatenate(parts)
    print(f"building synthetic index: n={len(text):,} ...", file=sys.stderr)
    t0 = time.perf_counter()
    idx = build_index(text, markers=markers,
                      doc_starts=np.array(doc_starts, dtype=np.int64),
                      doc_names=["ref"] + [f"hap{h}" for h in range(N_HAPS)],
                      ma_wsize=w, ftab_k=10)
    print(f"built in {time.perf_counter()-t0:.1f}s (R={idx.R:,})", file=sys.stderr)
    os.makedirs(CACHE, exist_ok=True)
    idx.save(CACHE)
    # cache the text too (for read sampling)
    np.save(os.path.join(CACHE, "text.npy"), text)
    return RbtIndex.load(CACHE)


def _sample_reads(idx, rng):
    text = np.load(os.path.join(CACHE, "text.npy"))
    acgt = np.frombuffer(b"ACGT", dtype=np.uint8)
    starts = rng.integers(0, len(text) - READ_LEN - 1, size=N_READS)
    reads = np.empty((N_READS, READ_LEN), dtype=np.uint8)
    for i, s in enumerate(starts):
        reads[i] = text[s:s + READ_LEN]
    # resample any read overlapping a separator pad; then 20% get one mutation
    bad = ~np.isin(reads, acgt).all(axis=1)
    for i in np.flatnonzero(bad):
        while True:
            s = int(rng.integers(0, len(text) - READ_LEN - 1))
            r = text[s:s + READ_LEN]
            if np.isin(r, acgt).all():
                reads[i] = r
                break
    mut = rng.random(N_READS) < 0.2
    mpos = rng.integers(0, READ_LEN, size=N_READS)
    mchar = rng.choice(acgt, size=N_READS)
    reads[np.arange(N_READS)[mut], mpos[mut]] = mchar[mut]
    return reads


def main():
    have_native = _ensure_native()
    import jax

    # persistent compile cache: the TPU tunnel's remote compile is the flakiest
    # stage — cache hits skip it entirely on re-runs
    jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".cache", "jaxcache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    print("bench: jax ready", file=sys.stderr)

    from rowbowt_tpu.engine.count import find_ranges
    from rowbowt_tpu.engine.device import DeviceIndex

    idx = _build_or_load_index()
    print(f"bench: index n={idx.n:,} R={idx.R:,}", file=sys.stderr)
    rng = np.random.default_rng(99)
    reads = _sample_reads(idx, rng)
    print("bench: reads sampled", file=sys.stderr)
    tab = idx.alpha.encode_table()
    qcodes = tab[reads.astype(np.int64)].astype(np.int16)  # [N, L], no padding needed
    lengths = np.full(N_READS, READ_LEN, dtype=np.int32)

    dx = DeviceIndex.from_index(idx)
    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr)

    # one dispatch for the whole read set: scan over batches inside jit, so the
    # TPU tunnel's per-call latency is paid once, not per batch
    nb = N_READS // BATCH
    qc3 = jax.numpy.asarray(
        qcodes[: nb * BATCH].astype(np.int32).reshape(nb, BATCH, READ_LEN))
    len2 = jax.numpy.asarray(lengths[: nb * BATCH].reshape(nb, BATCH))

    @jax.jit
    def count_all(dx, qc3, len2, salt):
        def step(_, xs):
            qc, ln = xs
            return None, find_ranges(dx, qc, ln)
        # salt defeats any caching between timing reps; checksum forces full
        # execution before the (tiny) host readback
        _, (lo, hi) = jax.lax.scan(step, None, (qc3, len2 + salt - salt))
        return lo, hi, jax.numpy.sum(lo) + jax.numpy.sum(hi)

    n_done = nb * BATCH
    out = count_all(dx, qc3, len2, 0)  # warmup / compile
    _ = int(out[2])
    slo = np.asarray(out[0]).reshape(-1)
    shi = np.asarray(out[1]).reshape(-1)
    print("bench: warmup done", file=sys.stderr)
    best = float("inf")
    for rep in range(3):
        t0 = time.perf_counter()
        out = count_all(dx, qc3, len2, rep + 1)
        _ = int(out[2])
        best = min(best, time.perf_counter() - t0)
    tpu_rps = n_done / best
    print(f"accel LF loop: {n_done:,} reads in {best:.3f}s -> "
          f"{tpu_rps:,.0f} reads/s", file=sys.stderr)
    outs0 = slo[:BATCH], shi[:BATCH]

    # CPU baseline (single thread, native)
    vs = None
    if have_native:
        from rowbowt_tpu.cpu_backend import count_ranges

        ncpu = 4096
        cdt = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            clo, chi = count_ranges(idx, qcodes[:ncpu], lengths[:ncpu])
            cdt = min(cdt, time.perf_counter() - t0)
        cpu_rps = ncpu / cdt
        print(f"cpu-1t: {ncpu:,} reads in {cdt:.3f}s -> {cpu_rps:,.0f} reads/s",
              file=sys.stderr)
        # correctness cross-check on the common prefix
        assert (outs0[0][:ncpu] == clo[:BATCH]).all(), "accel != cpu baseline"
        vs = tpu_rps / cpu_rps

    headline = {
        "metric": "count_reads_per_s_chip",
        "value": round(tpu_rps, 1),
        "unit": "reads/s",
        "vs_baseline": round(vs, 3) if vs is not None else None,
    }
    # secondary metrics (stderr): locate and windowed-marker throughput on one
    # batch each — BASELINE.md configs 2 and 3.  Their compiles are fresh
    # programs and the tunnel's remote compile sometimes hangs inside a C call
    # (uninterruptible by signals), so a watchdog thread hard-exits with the
    # headline JSON if they take too long.
    import threading

    def _bail():
        print("bench: secondary metrics watchdog fired", file=sys.stderr)
        print(json.dumps(headline))
        sys.stdout.flush()
        sys.stderr.flush()
        os._exit(0)

    watchdog = threading.Timer(90, _bail)
    watchdog.daemon = True
    watchdog.start()
    try:
        from rowbowt_tpu.engine.locate import find_ranges_w_toehold, locate
        from rowbowt_tpu.engine.markers import find_ranges_w_markers

        qb, lb = qc3[0], len2[0]

        @jax.jit
        def loc_all(dx, qc, ln, salt):
            lo, hi, k = find_ranges_w_toehold(dx, qc, ln + salt - salt)
            locs, cnt = locate(dx, lo, hi, k, max_hits=4)
            return locs, jax.numpy.sum(cnt) + jax.numpy.sum(locs)

        _ = int(loc_all(dx, qb, lb, 0)[1])
        tl = float("inf")
        for rep in range(3):
            t0 = time.perf_counter()
            _ = int(loc_all(dx, qb, lb, rep + 1)[1])
            tl = min(tl, time.perf_counter() - t0)
        print(f"locate: {BATCH:,} reads in {tl:.3f}s -> {BATCH/tl:,.0f} reads/s",
              file=sys.stderr)

        @jax.jit
        def mk_all(dx, qc, ln, salt):
            lo, hi, buf, used, ovf = find_ranges_w_markers(
                dx, qc, ln + salt - salt, wsize=10, max_range=1000, max_k=16)
            return jax.numpy.sum(used) + jax.numpy.sum(lo)

        _ = int(mk_all(dx, qb, lb, 0))
        tm = float("inf")
        for rep in range(3):
            t0 = time.perf_counter()
            _ = int(mk_all(dx, qb, lb, rep + 1))
            tm = min(tm, time.perf_counter() - t0)
        print(f"markers: {BATCH:,} reads in {tm:.3f}s -> {BATCH/tm:,.0f} reads/s",
              file=sys.stderr)
        extra = {"locate_reads_per_s": round(BATCH / tl, 1),
                 "markers_reads_per_s": round(BATCH / tm, 1)}
    except Exception as e:  # secondary metrics must never sink the headline
        print(f"bench: secondary metrics failed: {e!r}", file=sys.stderr)
        extra = {}
    watchdog.cancel()

    print(json.dumps({**headline, **extra}))
    sys.stdout.flush()
    sys.stderr.flush()
    # the TPU tunnel's runtime teardown can hang at interpreter exit; results
    # are already flushed, so exit hard
    os._exit(0)


def _parent():
    """The TPU tunnel hangs on claim/compile in a sizeable fraction of fresh
    processes; a new process usually succeeds.  Retry the measurement in a
    subprocess with a hard timeout until a JSON line appears."""
    env = dict(os.environ, RBT_BENCH_WORKER="1")
    for attempt in range(6):
        try:
            p = subprocess.run(
                [sys.executable, "-u", os.path.abspath(__file__)],
                env=env, timeout=420, capture_output=True, text=True,
            )
        except subprocess.TimeoutExpired as e:
            print(f"bench attempt {attempt}: timeout; retrying", file=sys.stderr)
            if e.stderr:
                sys.stderr.write(e.stderr.decode() if isinstance(e.stderr, bytes) else e.stderr)
            continue
        sys.stderr.write(p.stderr)
        line = next((l for l in p.stdout.splitlines() if l.startswith("{")), None)
        if line:
            print(line)
            return 0
        print(f"bench attempt {attempt}: no result (exit {p.returncode}); retrying",
              file=sys.stderr)
    print("bench: all attempts failed", file=sys.stderr)
    return 1


if __name__ == "__main__":
    if os.environ.get("RBT_BENCH_WORKER") == "1":
        main()
    else:
        sys.exit(_parent())
