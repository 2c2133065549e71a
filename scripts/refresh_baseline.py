#!/usr/bin/env python
"""Regenerate the measured-baseline table in BASELINE.md from bench
detail files (BENCH_DETAIL.json copies, one per run).

Usage: python scripts/refresh_baseline.py run1.json run2.json [...]

Per-query we report BOTH the across-run MEAN and MEDIAN (queries present
in only some runs use the runs they appear in). The 2x regression gate is
judged against the MEDIAN column: with ~+/-30% per-query noise dominated
by fixed JVM/scheduling overhead, a single contended run drags a mean far
more than a median, and sub-second queries flip the mean-based gate
spuriously (VERDICT r3 item 7). Rewrites everything below the
'## Measured baseline' marker; the preamble (reference facts + bench
plan) is preserved.
"""

from __future__ import annotations

import datetime
import json
import statistics
import sys

MARKER = "## Measured baseline"


def main() -> None:
    runs = [json.load(open(p))["queries"] for p in sys.argv[1:]]
    if not runs:
        sys.exit("need at least one BENCH_DETAIL.json path")
    names = sorted(set().union(*runs))
    means: dict[str, float] = {}
    medians: dict[str, float] = {}
    for q in names:
        samples = [r[q] for r in runs if q in r and r[q] >= 0]
        if not samples:
            # Negative values are bench error markers; a query that failed
            # in EVERY run must not be recorded as a 0.00 s baseline (that
            # would make any future passing run trip the 2x gate).
            print(f"WARNING: {q} errored in all runs — skipping", file=sys.stderr)
            continue
        means[q] = sum(samples) / len(samples)
        medians[q] = statistics.median(samples)
    total_mean = round(sum(means.values()), 3)
    total_median = round(sum(medians.values()), 3)
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
        f"Per-query MEAN and MEDIAN of {len(runs)} full runs — run-to-run",
        "noise on this box is roughly +/-30% per query (fixed JVM/scheduling",
        "overhead dominates the sub-second entries; a contended run skews the",
        "whole suite ~20%). **Judge the 2x gate against the MEDIAN column**:",
        "the median sheds single-run contention that the mean keeps, which is",
        "what made the gate mushy for sub-second queries (VERDICT r3 item 7).",
        "",
        f"**Suite wall-clock: {total_median} s (sum of medians);"
        f" {total_mean} s (sum of means).**",
        f"Single-run totals observed: {' / '.join(str(s) + ' s' for s in singles)}.",
        "",
        "| Query | median s | mean s |",
        "|---|---|---|",
    ]
    for q in sorted(means):
        lines.append(f"| {q} | {medians[q]:.2f} | {means[q]:.2f} |")
    lines.append("")
    open("BASELINE.md", "w").write("\n".join(lines))
    print(
        f"BASELINE.md refreshed: {len(means)} queries, "
        f"suite median {total_median} s / mean {total_mean} s"
    )


if __name__ == "__main__":
    main()
