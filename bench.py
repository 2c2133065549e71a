#!/usr/bin/env python
"""Benchmark harness (driver contract): run every registered query at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and print ONE JSON line with per-query wall-clock seconds.

Each query is materialized with the noop sink (full execution, no driver
collect overhead). One warm-up run of the flagship query amortizes JVM/
codegen startup out of the numbers.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

from muurschilderingendatabase_etl_spark import registry
from muurschilderingendatabase_etl_spark.session import get_spark


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")
    queries = registry.all_queries()

    # Warm-up: JVM JIT, codegen, parquet footer caches.
    materialize(queries["flagship_revenue_by_nation"](spark, sf_dir))

    timings: dict[str, float] = {}
    for name in sorted(queries):
        t0 = time.perf_counter()
        try:
            materialize(queries[name](spark, sf_dir))
            timings[name] = round(time.perf_counter() - t0, 3)
        except Exception as exc:  # a failing query must not hide the rest
            print(f"BENCH ERROR {name}: {exc}", file=sys.stderr)
            timings[name] = -1.0

    total = round(sum(v for v in timings.values() if v >= 0), 3)
    # Full per-query detail goes to a sidecar file and an early stdout line;
    # the FINAL stdout line stays small (the driver parses the tail of the
    # output, and a single ~4 KB line with 121 queries overflows its window —
    # VERDICT.md round 1).
    detail = {
        "metric": "suite_wall_clock",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    with open("BENCH_DETAIL.json", "w") as fh:
        json.dump(detail, fh, indent=1, sort_keys=True)
    print(json.dumps(detail))
    print(
        json.dumps(
            {
                "metric": "suite_wall_clock",
                "value": total,
                "unit": "sec",
                "sf": sf,
                "n_queries": len(timings),
                "n_errors": sum(1 for v in timings.values() if v < 0),
                "detail_file": "BENCH_DETAIL.json",
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
