"""Regenerate BASELINE.md's measured-numbers section from the driver records.

The driver writes `BENCH_r{N}.json` after every round; these are the canonical
measurements.  Hand-copied tables drifted below the records twice (round-3 and
round-4 advisor/judge findings), so the measured section is now GENERATED:
everything between the BENCH:BEGIN / BENCH:END markers in BASELINE.md is
replaced by tables built from the parsed records.  Run after any bench change:

    python tools/sync_bench_docs.py
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# metric key suffix -> row label (order = table order)
ROWS = [
    ("count_reads_per_s", "count reads/s/chip"),
    ("vs_baseline", "count vs 1-thread CPU (x)"),
    ("lf_steps_per_s", "LF-steps/s"),
    ("locate_reads_per_s", "locate reads/s (max_hits=4)"),
    ("locate_unbounded_reads_per_s", "UNBOUNDED locate reads/s"),
    ("locate_unbounded_hits_per_s", "UNBOUNDED locate occs/s"),
    ("markers_reads_per_s", "marker-window reads/s"),
    ("markers_vs_baseline", "markers vs 1-thread CPU (x)"),
    ("markers_greedy_reads_per_s", "greedy-marker reads/s (fwd+rc)"),
    ("greedy_vs_baseline", "greedy vs 1-thread CPU (x)"),
    ("greedy_long_reads_per_s", "greedy LONG 2kb reads/s"),
    ("locate_vs_baseline", "locate vs 1-thread CPU (x)"),
    ("build_wall_s", "construction wall (s)"),
    ("build_peak_rss_gb", "construction peak RSS (GB)"),
]
CONFIGS = [("small", "small n=8.0M"), ("chr", "chr n=160M"),
           ("big", "big n=2.40G"), ("giant", "giant n=10.0G")]


def load_records() -> dict[int, dict]:
    recs = {}
    for path in sorted(glob.glob(os.path.join(REPO, "BENCH_r*.json"))):
        m = re.search(r"BENCH_r(\d+)\.json$", path)
        if not m:
            continue
        with open(path) as f:
            data = json.load(f)
        parsed = data.get("parsed")
        if parsed:
            recs[int(m.group(1))] = parsed
    return recs


def fmt(v) -> str:
    if v is None:
        return "—"
    if isinstance(v, float) and v < 1000:
        return f"{v:,.2f}".rstrip("0").rstrip(".")
    return f"{v:,.0f}"


def round_table(parsed: dict) -> list[str]:
    cols = [(k, lbl) for k, lbl in CONFIGS
            if any(f"{s}_{k}" in parsed for s, _ in ROWS)]
    lines = ["| metric | " + " | ".join(lbl for _, lbl in cols) + " |",
             "|---|" + "---|" * len(cols)]
    for suffix, label in ROWS:
        vals = [parsed.get(f"{suffix}_{k}") for k, _ in cols]
        if all(v is None for v in vals):
            continue
        lines.append(f"| {label} | " + " | ".join(fmt(v) for v in vals) + " |")
    return lines


def build_section(recs: dict[int, dict]) -> str:
    out = ["",
           "_Generated from the driver records by `tools/sync_bench_docs.py` —"
           " do not hand-edit between the markers._", ""]
    for rnd in sorted(recs, reverse=True):
        parsed = recs[rnd]
        table = round_table(parsed)
        if len(table) <= 2:  # record predates the per-config key scheme
            continue
        out.append(f"### Round {rnd} (`BENCH_r{rnd:02d}.json`, driver record)")
        out.append("")
        out.extend(table)
        extras = []
        if parsed.get("n_big"):
            extras.append(f"big config n = {parsed['n_big']:,}"
                          + (f", R = {parsed['R_big']:,}"
                             if parsed.get("R_big") else ""))
        if parsed.get("n_giant"):
            extras.append(f"giant config n = {parsed['n_giant']:,}"
                          + (f", R = {parsed['R_giant']:,}"
                             if parsed.get("R_giant") else ""))
        if parsed.get("cpu_count_spread_big") is not None:
            extras.append("big CPU count baseline spread "
                          f"{parsed['cpu_count_spread_big']:.1%} over "
                          f"{len(parsed.get('cpu_count_trials_big', []))} trials")
        if extras:
            out.append("")
            out.append("(" + "; ".join(extras) + ")")
        out.append("")
    return "\n".join(out)


def main() -> int:
    path = os.path.join(REPO, "BASELINE.md")
    with open(path) as f:
        doc = f.read()
    begin, end = "<!-- BENCH:BEGIN -->", "<!-- BENCH:END -->"
    if begin not in doc or end not in doc:
        print("BASELINE.md is missing the BENCH:BEGIN/END markers", file=sys.stderr)
        return 1
    recs = load_records()
    head, rest = doc.split(begin, 1)
    _, tail = rest.split(end, 1)
    with open(path, "w") as f:
        f.write(head + begin + "\n" + build_section(recs) + end + tail)
    print(f"BASELINE.md measured section regenerated from "
          f"{len(recs)} driver records: rounds {sorted(recs)}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
