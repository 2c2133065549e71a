#!/usr/bin/env python
"""Degenerate-input sweep: run every registered query against a
0-row fixture (same schemas as /root/testdata, no data).

At 100 TB an empty slice is routine — a day with no events, a source
with no documents, a filter that prunes everything. Operators must
return an empty (schema-stable) result, not crash: driver-side
summary collects (bloom bitmap, IVF training sample), window/rank
plumbing and stream replay all have empty-input edge paths that no
oracle exercises (oracle fixtures are never empty).

Usage: python scripts/empty_sweep.py [name1 name2 ...]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.001"


def make_empty_fixture(dst: str) -> None:
    from muurschilderingendatabase_etl_spark.tables import TABLES

    os.makedirs(dst, exist_ok=True)
    for name in TABLES:
        schema = pq.read_schema(f"{SRC}/{name}.parquet")
        pq.write_table(schema.empty_table(), f"{dst}/{name}.parquet")


def main() -> None:
    from pyspark.sql import SparkSession

    dst = tempfile.mkdtemp(prefix="empty-sf-")
    make_empty_fixture(dst)

    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as mod

    qs = mod.queries()
    only = sys.argv[1:]
    if only:
        qs = {n: qs[n] for n in only}

    ok, failed = 0, []
    for name, fn in qs.items():
        t0 = time.time()
        try:
            rows = fn(spark, dst).collect()
            ok += 1
            print(f"ok    {name}: {len(rows)} rows ({time.time()-t0:.1f}s)", flush=True)
        except Exception as e:
            failed.append(name)
            msg = traceback.format_exc().strip().splitlines()[-1]
            print(f"FAIL  {name}: {msg[:300]}", flush=True)
    print(f"\n{ok} ok / {len(failed)} failed of {len(qs)}")
    if failed:
        print("failed:", " ".join(failed))
    shutil.rmtree(dst, ignore_errors=True)
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
