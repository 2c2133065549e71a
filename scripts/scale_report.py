#!/usr/bin/env python
"""Build SCALE.md from two bench detail files at different scale factors.

Usage:
    python scripts/scale_report.py SMALL.json LARGE.json [--factor 10]

Both inputs are BENCH_DETAIL.json-format files produced by bench.py runs
against fixtures from scripts/gen_sf.py (same generator => same distributions,
so the per-query time ratio isolates the effect of data volume). ``--factor``
is the data-volume ratio between the two runs (default 10 = sf0.1 -> sf1).

Classification per query (t_small -> t_large, ratio r = t_large / t_small):
- fixed-cost:   t_large < 3 s — dominated by JVM/planning/stream-replay
                overhead, data volume irrelevant at these SFs.
- sub-linear:   r <= 0.6 * factor
- near-linear:  r <= 1.5 * factor (noise band around proportional)
- SUPER-LINEAR: r  > 1.5 * factor — the scale-killer flag; each such query
                needs its blocking/partitioning strategy fixed or an
                explanation in SCALE.md.
"""

from __future__ import annotations

import argparse
import datetime
import json


def classify(ts: float, tl: float, factor: float) -> str:
    if tl < 3.0:
        return "fixed-cost"
    r = tl / max(ts, 1e-9)
    if r <= 0.6 * factor:
        return "sub-linear"
    if r <= 1.5 * factor:
        return "near-linear"
    return "SUPER-LINEAR"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("small")
    ap.add_argument("large")
    ap.add_argument("--factor", type=float, default=10.0)
    ap.add_argument("--out", default="SCALE.md")
    a = ap.parse_args()

    s = json.load(open(a.small))
    l = json.load(open(a.large))
    sq, lq = s["queries"], l["queries"]
    rows = []
    for q in sorted(set(sq) & set(lq)):
        ts, tl = sq[q], lq[q]
        if ts < 0 or tl < 0:
            rows.append((q, ts, tl, float("nan"), "ERROR"))
            continue
        rows.append((q, ts, tl, tl / max(ts, 1e-9), classify(ts, tl, a.factor)))

    buckets: dict[str, int] = {}
    for _, _, _, _, c in rows:
        buckets[c] = buckets.get(c, 0) + 1

    today = datetime.date.today().isoformat()
    lines = [
        "# SCALE — measured scaling beyond the driver fixtures",
        "",
        f"Generated {today} by `scripts/scale_report.py` from two full",
        f"`bench.py` runs on `scripts/gen_sf.py` fixtures: sf{s['sf']}",
        f"({a.small}) vs sf{l['sf']} ({a.large}), data-volume factor "
        f"{a.factor:g}x.",
        "",
        f"Suite wall-clock: **{s['value']} s -> {l['value']} s** "
        f"({l['value'] / s['value']:.2f}x for {a.factor:g}x the data).",
        "",
        "Buckets: "
        + ", ".join(f"{k} = {v}" for k, v in sorted(buckets.items())),
        "",
        "- *fixed-cost* (large-run time < 3 s): planning/JVM/stream-replay",
        "  overhead dominates; data volume is irrelevant at these SFs.",
        f"- *near-linear*: ratio within 1.5x of the {a.factor:g}x data factor.",
        "- *SUPER-LINEAR*: ratio > 1.5x the data factor — scale-killer flag;",
        "  every such query gets a fix or a written justification below.",
        "",
        "## Slowest queries at the large SF",
        "",
        "| Query | small s | large s | ratio | class |",
        "|---|---|---|---|---|",
    ]
    for q, ts, tl, r, c in sorted(rows, key=lambda x: -x[2])[:25]:
        lines.append(f"| {q} | {ts:.2f} | {tl:.2f} | {r:.1f}x | {c} |")
    lines += [
        "",
        "## Super-linear queries (full list)",
        "",
        "| Query | small s | large s | ratio |",
        "|---|---|---|---|",
    ]
    sl = [x for x in rows if x[4] == "SUPER-LINEAR"]
    for q, ts, tl, r, _ in sorted(sl, key=lambda x: -x[3]):
        lines.append(f"| {q} | {ts:.2f} | {tl:.2f} | {r:.1f}x |")
    if not sl:
        lines.append("| (none) | | | |")
    lines += [
        "",
        "## Notes",
        "",
        "<!-- hand-written analysis appended below; regenerate above only -->",
        "",
    ]
    # Preserve any hand-written notes section on regeneration.
    try:
        old = open(a.out).read()
        marker = "<!-- hand-written analysis appended below; regenerate above only -->"
        if marker in old:
            # keep the marker itself so the NEXT regeneration still
            # finds it (replacing it used to orphan the notes)
            lines[-1:] = [old.split(marker, 1)[1].lstrip("\n")]
    except FileNotFoundError:
        pass
    open(a.out, "w").write("\n".join(lines) + "\n")
    print(f"{a.out}: {len(rows)} queries, {len(sl)} super-linear")


if __name__ == "__main__":
    main()
