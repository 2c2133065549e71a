#!/usr/bin/env python
"""Regenerate the measured-baseline table in BASELINE.md from bench
detail files (BENCH_DETAIL.json copies, one per run).

Usage: python scripts/refresh_baseline.py run1.json run2.json [...]

Per-query value = MEAN across the given runs (queries present in only
some runs use the runs they appear in). Rewrites everything below the
'## Measured baseline' marker; the preamble (reference facts + bench
plan) is preserved.
"""

from __future__ import annotations

import datetime
import json
import sys

MARKER = "## Measured baseline"


def main() -> None:
    runs = [json.load(open(p))["queries"] for p in sys.argv[1:]]
    if not runs:
        sys.exit("need at least one BENCH_DETAIL.json path")
    names = sorted(set().union(*runs))
    means = {}
    for q in names:
        samples = [r[q] for r in runs if q in r and r[q] >= 0]
        if not samples:
            # Negative values are bench error markers; a query that failed
            # in EVERY run must not be recorded as a 0.00 s baseline (that
            # would make any future passing run trip the 2x gate).
            print(f"WARNING: {q} errored in all runs — skipping", file=sys.stderr)
            continue
        means[q] = sum(samples) / len(samples)
    total = round(sum(means.values()), 3)
    singles = [round(sum(v for v in r.values() if v >= 0), 3) for r in runs]

    text = open("BASELINE.md").read()
    head = text.split(MARKER)[0]
    today = datetime.date.today().isoformat()
    lines = [
        head.rstrip(),
        "",
        f"{MARKER} (refreshed {today})",
        "",
        f"Full registered suite ({len(means)} queries), sf0.1, local[32],",
        "`spark.sql.shuffle.partitions=32`, noop sink, one warm-up run.",
        f"Numbers are the per-query MEAN of {len(runs)} full runs — run-to-run",
        "noise on this box is roughly +/-30% per query (fixed JVM/scheduling",
        "overhead dominates the sub-second entries; a contended run skews the",
        "whole suite ~20%), so judge the 2x gate against that noise floor,",
        "especially for queries under ~1 s.",
        "",
        f"**Suite wall-clock (sum of per-query means): {total} s.**",
        f"Single-run totals observed: {' / '.join(str(s) + ' s' for s in singles)}.",
        "",
        "| Query | sec |",
        "|---|---|",
    ]
    for q in sorted(means):
        lines.append(f"| {q} | {means[q]:.2f} |")
    lines.append("")
    open("BASELINE.md", "w").write("\n".join(lines))
    print(f"BASELINE.md refreshed: {len(means)} queries, suite {total} s")


if __name__ == "__main__":
    main()
