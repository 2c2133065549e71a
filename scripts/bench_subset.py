#!/usr/bin/env python
"""Time a named subset of registered queries at an arbitrary fixture dir.

The scale probes (SCALE.md) need per-query wall-clock for a hand-picked
subset at fixtures beyond the driver SFs (sf1/sf10 from scripts/gen_sf.py);
bench.py deliberately runs the FULL registry with the driver's contract and
shouldn't grow probe flags. Same measurement discipline as bench.py: noop
sink (full execution, no collect), one flagship warm-up to amortize
JVM/codegen startup, per-query wall seconds rounded to 2 dp.

Usage:
    python scripts/bench_subset.py SF_DIR OUT.json name1 name2 ...
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from muurschilderingendatabase_etl_spark import registry
from muurschilderingendatabase_etl_spark.session import get_spark


def main() -> None:
    sf_dir, out = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    spark = get_spark(app_name="bench_subset")
    spark.sparkContext.setLogLevel("ERROR")
    queries = registry.all_queries()
    unknown = [n for n in names if n not in queries]
    if unknown:
        sys.exit(f"unknown queries: {unknown}")

    queries["flagship_revenue_by_nation"](spark, sf_dir).write.format(
        "noop"
    ).mode("overwrite").save()

    timings: dict[str, float] = {}
    for name in names:
        t0 = time.perf_counter()
        try:
            queries[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            timings[name] = round(time.perf_counter() - t0, 2)
        except Exception as exc:  # record and continue — a probe, not a gate
            print(f"ERROR {name}: {exc}", file=sys.stderr)
            timings[name] = -1.0
        print(f"{name:42s} {timings[name]:8.2f}s", flush=True)

    with open(out, "w") as fh:
        json.dump(timings, fh, indent=1, sort_keys=True)
    print(json.dumps({"out": out, "n": len(timings), "sf_dir": sf_dir}))
    spark.stop()


if __name__ == "__main__":
    main()
