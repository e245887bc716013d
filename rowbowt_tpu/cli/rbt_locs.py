"""rbt_locs — locate-then-positional-markers (rb_locs / rb_markers_tsa
equivalent, src/rb_markers_tsa.cpp:76-128).

Greedy-seed locate via the toehold SA, then look up markers by TEXT position
span [l, l+readlen-1] in the positional marker index (<inpre>.midx, built by
rbt_midx — the rle_window_arr replacement).  Output per read
(rb_markers_tsa.cpp:76-88):

    <name>[ <seq>/<pos>/<allele>]...
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

from rowbowt_tpu.cli.common import (
    device_index, eprint, iter_query_batches, load_index,
)
from rowbowt_tpu.index import marker_allele, marker_pos, marker_seq
from rowbowt_tpu.midx import PosMarkers


def main(argv=None):
    p = argparse.ArgumentParser(prog="rbt_locs", description=__doc__)
    p.add_argument("inpre")
    p.add_argument("fastq")
    p.add_argument("-w", "--wsize", type=int, default=19,
                   help="greedy seed min length")
    p.add_argument("-m", "--max-hits", type=int, default=4)
    p.add_argument("-o", "--output-prefix", dest="outpre", default=None)
    p.add_argument("-b", "--batch-size", type=int, default=4096)
    args = p.parse_args(argv)

    idx = load_index(args.inpre, sa=True, dl=True)
    midx_path = args.inpre.rstrip("/") + ".midx.npz"
    try:
        midx = PosMarkers.load(midx_path)
    except FileNotFoundError:
        eprint(f"error: positional marker index not found: {midx_path} "
               "(build it with rbt_midx or rbt_build -m)")
        return 1
    if idx.samples_last is None:
        eprint("error: index has no toehold SA (build with -s); "
               "rbt_locs needs locate support")
        return 1
    dx = device_index(idx)

    from rowbowt_tpu.engine.seeds import locate_from_longest_seed, seeds_greedy_w_sample

    out = sys.stdout
    for names, qc, lens in iter_query_batches(idx, args.fastq, args.batch_size):
        res = seeds_greedy_w_sample(dx, qc, lens, min_length=args.wsize)
        locs, cnt = map(
            np.asarray,
            locate_from_longest_seed(dx, *res, max_hits=args.max_hits),
        )
        for b, name in enumerate(names):
            parts = [name]
            for j in range(int(cnt[b])):
                l = int(locs[b, j])
                for m in midx.at_range(l, l + int(lens[b]) - 1):
                    m = np.int64(m)
                    parts.append(
                        f" {int(marker_seq(m))}/{int(marker_pos(m))}/"
                        f"{int(marker_allele(m))}"
                    )
            out.write("".join(parts) + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
