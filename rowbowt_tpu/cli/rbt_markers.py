"""rbt_markers — marker genotyping (rb_markers equivalent, src/rb_markers.cpp).

Per read: N-normalize, query BOTH strands with greedy seeding (or --lmem),
emit one line per seed in MarkerSeed::print_buf format (rb_markers.cpp:250-261):

    <name> <range_size> <+|-> <query_start> <query_len> <seq/pos/allele ...| .>

Filter semantics mirror the reference exactly: the standard path sorts+uniques
markers per seed gated by --min-range; --heuristic additionally applies
--clear-conflicting / --clear-identical per seed, the early strand stop, and
the --best-strand-only / --min-seed-length seed filters (rb_markers.cpp:
440-463, 504-506).  Differences from the reference, both deterministic
improvements: output is in input-read order (the pthread pool interleaves
arbitrarily), and --heuristic starts with the forward strand instead of a
random one.
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

from rowbowt_tpu.alphabet import normalize_read
from rowbowt_tpu.cli.common import (
    Timer, device_index, eprint, iter_query_batches, load_index,
)
from rowbowt_tpu.engine.filters import (
    assemble_seeds, heuristic_stop, keep_seeds_best_strand, keep_seeds_by_len,
)


def main(argv=None):
    p = argparse.ArgumentParser(prog="rbt_markers", description=__doc__)
    p.add_argument("inpre")
    p.add_argument("fastq")
    p.add_argument("-w", "--wsize", type=int, default=10)
    p.add_argument("-r", "--max-range", type=int, default=1000)
    p.add_argument("-m", "--min-range", type=int, default=0)
    p.add_argument("-t", "--threads", type=int, default=1,
                   help="accepted for parity; batching replaces the pool")
    p.add_argument("-u", "--max-tasks", type=int, default=1024,
                   help="accepted for parity")
    p.add_argument("-l", "--read-len", type=int, default=101)
    p.add_argument("-y", "--min-seed-length", type=int, default=0)
    p.add_argument("-f", "--ftab", action="store_true")
    p.add_argument("--lmem", action="store_true")
    p.add_argument("--overlap", action="store_true")
    p.add_argument("--heuristic", action="store_true")
    p.add_argument("--best-strand-only", action="store_true", dest="best_strand")
    p.add_argument("--clear-conflicting", action="store_true")
    p.add_argument("--clear-identical", action="store_true")
    p.add_argument("-b", "--batch-size", type=int, default=2048)
    p.add_argument("--max-seeds", type=int, default=8)
    p.add_argument("--max-markers", type=int, default=32)
    args = p.parse_args(argv)

    if args.overlap:
        eprint("overlapped seeds currently broken")  # rb_markers.cpp:121-124
        return 1
    if args.lmem:
        eprint("ERROR: --lmem batched engine not wired yet; use the library's "
               "naive.get_markers_lmems or omit --lmem")
        return 1

    t = Timer()
    eprint("loading rowbowt + markers" + (" and ftab" if args.ftab else ""))
    idx = load_index(args.inpre, sa=False, ma=True, dl=False, ft=args.ftab)
    dx = device_index(idx)
    eprint(f"loading rowbowt + markers took: {t.lap()} seconds")

    from rowbowt_tpu.engine.seeds import markers_greedy_seeding

    t = Timer()
    out = sys.stdout
    S, K = args.max_seeds, args.max_markers
    for recs, qc, lens in iter_query_batches(
        idx, args.fastq, args.batch_size, normalize=normalize_read, with_rc=True
    ):
        slo, shi, sqs, sqe, mvals, mcnt, ns = map(
            np.asarray,
            markers_greedy_seeding(
                dx, qc, lens, wsize=args.wsize, max_range=args.max_range,
                max_seeds=S, max_k=K, use_ftab=args.ftab,
            ),
        )
        for ri, (name, seq, _) in enumerate(recs):
            read_len = args.read_len if args.heuristic else len(seq)
            lanes = ((2 * ri, "+"), (2 * ri + 1, "-"))
            seeds = []
            stopped = False
            for lane, strand in lanes:
                if stopped:
                    break
                ss = assemble_seeds(
                    name, strand, len(seq),
                    slo[lane], shi[lane], sqs[lane], sqe[lane],
                    mvals[lane], mcnt[lane], ns[lane],
                    min_range=args.min_range, max_k=K,
                )
                for ms in ss:
                    if args.heuristic:
                        if ms.query_len < args.min_seed_length:
                            continue  # heuristic out_fn drop (rb_markers.cpp:447)
                        if args.clear_conflicting:
                            ms.clear_if_conflicting(read_len)
                        if args.clear_identical:
                            ms.filter_identical_pos()
                    seeds.append(ms)
                    if args.heuristic and args.best_strand and heuristic_stop(
                            ms, read_len, args.min_seed_length):
                        stopped = True
                        break
            if args.heuristic:
                if args.best_strand:
                    seeds = keep_seeds_best_strand(seeds)
                if args.min_seed_length:
                    seeds = keep_seeds_by_len(seeds, args.min_seed_length)
            for ms in seeds:
                out.write(ms.print_buf() + "\n")
    eprint(f"counting markers took: {t.lap()} seconds")
    return 0


if __name__ == "__main__":
    sys.exit(main())
