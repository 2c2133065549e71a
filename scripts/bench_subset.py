#!/usr/bin/env python
"""Time a named subset of registered queries at an arbitrary fixture dir.

The scale probes (SCALE.md) need per-query wall-clock for a hand-picked
subset at fixtures beyond the driver SFs (sf1/sf10 from scripts/gen_sf.py);
bench.py deliberately runs the FULL registry with the driver's contract and
shouldn't grow probe flags. Same measurement discipline as bench.py: noop
sink (full execution, no collect), one flagship warm-up to amortize
JVM/codegen startup, per-query wall seconds rounded to 2 dp.

Usage:
    python scripts/bench_subset.py [--per-process] SF_DIR OUT.json name1 name2 ...

``--per-process`` re-execs this script once per query and merges the
per-query JSONs. This is the MECHANICAL form of the sf10 operational
policy (SCALE.md r8 footnote): one multi-query batch hung with the
Python main thread blocked on a py4j socket read while the JVM gateway
sat in accept() — both sides idle, hours lost. A fresh JVM per query
can't inherit a wedged gateway, and each query's timing carries its own
flagship warm-up (subset-vs-subset ratios stay honest). Costs one JVM
startup + warm-up per query, so reserve it for big-SF sweeps where a
hang costs more than the startups.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from muurschilderingendatabase_etl_spark import registry
from muurschilderingendatabase_etl_spark.session import get_spark


def _per_process(sf_dir: str, out: str, names: list[str]) -> None:
    """One subprocess (fresh JVM) per query; merge results into ``out``."""
    timings: dict[str, float] = {}
    for name in names:
        part = f"{out}.{name}.part"
        rc = subprocess.call(
            [sys.executable, os.path.abspath(__file__), sf_dir, part, name]
        )
        if rc == 0 and os.path.exists(part):
            with open(part) as fh:
                timings.update(json.load(fh))
            os.remove(part)
        else:  # crash/hang-timeout of one query must not lose the sweep
            print(f"ERROR {name}: subprocess rc={rc}", file=sys.stderr)
            timings[name] = -1.0
        with open(out, "w") as fh:  # checkpoint after every query
            json.dump(timings, fh, indent=1, sort_keys=True)
    print(json.dumps({"out": out, "n": len(timings), "sf_dir": sf_dir}))


def main() -> None:
    argv = sys.argv[1:]
    if argv and argv[0] == "--per-process":
        _per_process(argv[1], argv[2], argv[3:])
        return
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
