"""Build the n > 2^31 synthetic-pangenome count index (bench 'big' config).

300 Mbp reference + 7 haplotypes -> n = 2,400,000,081 symbols (> 2^31 =
2,147,483,648): the regime the reference serves with u64 indices throughout
(/root/reference/include/toehold_sa.hpp:133-155) and pfbwt-f construction.
Construction here is the chunked insertion merge (construct/merge.py) —
whole-text SA-IS cannot run in int32 at this n — followed by the two-level
fused-block packing (bigindex.py).  Also samples query reads, encodes them,
and records CPU-engine expected ranges for device parity.

Run once (approx. 15-25 min, ~8 GB RSS):  python scripts/build_big_index.py
Output: .cache/bench_idx_big/ consumed by bench.py's 'big' worker.
"""

import json
import os
import resource
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from rowbowt_tpu.alphabet import SEP_BYTE, TERM_BYTE  # noqa: E402
from rowbowt_tpu.bigindex import BigIndex  # noqa: E402
from rowbowt_tpu.construct.merge import merge_construct  # noqa: E402

REF_LEN = 300_000_000
N_HAPS = 7
N_VARS = 900_000  # one variant site per ~333 bp, like the chr config
SEED = 77_711
W = 10
N_READS = 131_072
READ_LEN = 100
N_PARITY = 512
OUT = os.path.join(REPO, ".cache", "bench_idx_big")


def gen_parts(rng):
    acgt = np.frombuffer(b"ACGT", dtype=np.uint8)
    ref = rng.choice(acgt, size=REF_LEN)
    var_pos = np.sort(rng.choice(REF_LEN, size=N_VARS, replace=False))
    var_alt = rng.choice(acgt, size=N_VARS)
    sep = np.full(W, SEP_BYTE, dtype=np.uint8)
    parts = [np.concatenate([ref, sep])]
    for h in range(N_HAPS):
        hap = ref.copy()
        carry = rng.random(N_VARS) < 0.5
        hap[var_pos[carry]] = var_alt[carry]
        tail = sep if h < N_HAPS - 1 else np.concatenate(
            [sep, np.array([TERM_BYTE], dtype=np.uint8)])
        parts.append(np.concatenate([hap, tail]))
    return parts


def main():
    rng = np.random.default_rng(SEED)
    t_all = time.perf_counter()
    print("generating panel documents ...", file=sys.stderr)
    parts = gen_parts(rng)
    n = sum(int(p.shape[0]) for p in parts)
    assert n > (1 << 31), n
    print(f"n = {n:,} (> 2^31), {len(parts)} documents", file=sys.stderr)

    t0 = time.perf_counter()
    codes, _, alpha = merge_construct(parts, with_sa=False, verbose=True)
    t_merge = time.perf_counter() - t0
    print(f"merge_construct: {t_merge:.1f}s", file=sys.stderr)

    # sample reads BEFORE freeing the documents (20% get one mutation)
    acgt = np.frombuffer(b"ACGT", dtype=np.uint8)
    reads = np.empty((N_READS, READ_LEN), dtype=np.uint8)
    which = rng.integers(0, len(parts), size=N_READS)
    for i in range(N_READS):
        d = parts[int(which[i])]
        s = int(rng.integers(0, d.shape[0] - W - READ_LEN - 1))
        reads[i] = d[s:s + READ_LEN]
    bad = ~np.isin(reads, acgt).all(axis=1)
    for i in np.flatnonzero(bad):
        while True:
            d = parts[int(rng.integers(0, len(parts)))]
            s = int(rng.integers(0, d.shape[0] - W - READ_LEN - 1))
            r = d[s:s + READ_LEN]
            if np.isin(r, acgt).all():
                reads[i] = r
                break
    mut = rng.random(N_READS) < 0.2
    mpos = rng.integers(0, READ_LEN, size=N_READS)
    mchar = rng.choice(acgt, size=N_READS)
    reads[np.arange(N_READS)[mut], mpos[mut]] = mchar[mut]
    del parts

    t0 = time.perf_counter()
    big = BigIndex.from_codes(codes, alpha, n_sup=8)
    t_pack = time.perf_counter() - t0
    print(f"fb2 pack: {t_pack:.1f}s ({big.fb2.nbytes / 2**30:.2f} GB)",
          file=sys.stderr)
    del codes
    big.save(OUT)

    tab = alpha.encode_table()
    qcodes = tab[reads.astype(np.int64)].astype(np.int16)
    qlens = np.full(N_READS, READ_LEN, dtype=np.int32)
    np.save(os.path.join(OUT, "qcodes.npy"), qcodes)
    np.save(os.path.join(OUT, "qlens.npy"), qlens)

    from rowbowt_tpu.cpu_backend import count_ranges_fb2

    t0 = time.perf_counter()
    exp_lo, exp_hi = count_ranges_fb2(big, qcodes[:N_PARITY], qlens[:N_PARITY])
    t_cpu = time.perf_counter() - t0
    print(f"cpu parity record: {N_PARITY} reads in {t_cpu:.1f}s "
          f"({N_PARITY / t_cpu:,.0f} reads/s 1t)", file=sys.stderr)
    nonempty = int((exp_hi >= exp_lo).sum())
    print(f"  nonempty ranges: {nonempty}/{N_PARITY}", file=sys.stderr)
    assert nonempty > N_PARITY // 2, "sampled reads should mostly hit"
    np.save(os.path.join(OUT, "expect_lo.npy"), exp_lo)
    np.save(os.path.join(OUT, "expect_hi.npy"), exp_hi)

    wall = time.perf_counter() - t_all
    rss = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / (1 << 20)
    # children (prefetched SA-IS workers) peak separately
    rss_c = resource.getrusage(resource.RUSAGE_CHILDREN).ru_maxrss / (1 << 20)
    with open(os.path.join(OUT, "build_stats.json"), "w") as f:
        json.dump({"wall_s": round(wall, 1), "merge_s": round(t_merge, 1),
                   "pack_s": round(t_pack, 1),
                   "peak_rss_gb": round(rss, 2),
                   "peak_rss_child_gb": round(rss_c, 2),
                   "cpu_reads_per_s_1t": round(N_PARITY / t_cpu, 1),
                   "n": n}, f)
    print(f"DONE: {wall:.1f}s total, peak RSS {rss:.2f} GB "
          f"(+{rss_c:.2f} GB SA worker)", file=sys.stderr)


if __name__ == "__main__":
    main()
