#!/usr/bin/env python
"""Round-12 optimization probe: isolate named queries with the noop sink,
time R repeats in one warmed session, and dump .explain("formatted") to
plans/r12/<query>_<tag>.txt.

Measurement discipline = bench.py (guide §1): same session confs
(session.get_spark), one flagship warm-up to amortize JVM/codegen
startup, noop sink so the computation is timed rather than the sink,
job descriptions set per query so the UI/event log stays readable.

Usage:
    python scripts/opt_probe.py [--sf DIR] [--reps N] [--tag before|after|none]
                                name1 name2 ...
"""

from __future__ import annotations

import argparse
import contextlib
import io
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from muurschilderingendatabase_etl_spark import registry
from muurschilderingendatabase_etl_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--tag", default="none")
    ap.add_argument("--plandir", default="r13")
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    qs = registry.all_queries()
    unknown = [n for n in args.names if n not in qs]
    if unknown:
        sys.exit(f"unknown query names: {unknown}")

    spark = get_spark(app_name="opt_probe")
    spark.sparkContext.setLogLevel("ERROR")

    def materialize(df):
        df.write.format("noop").mode("overwrite").save()

    materialize(qs["flagship_revenue_by_nation"](spark, args.sf))

    plandir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", args.plandir)
    os.makedirs(plandir, exist_ok=True)

    out: dict[str, list[float]] = {}
    for name in args.names:
        times = []
        for i in range(args.reps):
            spark.sparkContext.setJobDescription(f"{name} rep{i}")
            t0 = time.perf_counter()
            df = qs[name](spark, args.sf)
            t_build = time.perf_counter() - t0
            materialize(df)
            times.append(round(time.perf_counter() - t0, 3))
            if i == 0:
                print(f"  {name}: build={t_build:.3f}s total={times[0]:.3f}s", flush=True)
                if args.tag != "none":
                    buf = io.StringIO()
                    with contextlib.redirect_stdout(buf):
                        df.explain("formatted")
                    with open(os.path.join(plandir, f"{name}_{args.tag}.txt"), "w") as fh:
                        fh.write(buf.getvalue())
        spark.sparkContext.setJobDescription(None)
        out[name] = times
        print(f"{name}: {times}", flush=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
