#!/usr/bin/env python
"""One-off sf10 verification for graph_pagerank_fixed.

The REGISTERED oracle chains all 8 iterations as CTEs in one statement —
the clearest spec, fine at driver SFs, but DuckDB plans it as one giant
pipeline whose intermediate hash tables coexist: at sf10 (~120M edges)
it spilled >76 GB of temp and died on disk, twice. This script runs the
SAME iteration — same constants, same join/agg per step — as a Python
loop over materialized temp tables, so each iteration's memory is
released before the next starts, then value-compares against the Spark
query at the mimic's 6-dp contract.

Usage: python scripts/pagerank_sf10_check.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scratch/real-sf10"

    import duckdb
    import pandas as pd

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.master("local[32]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as mod

    con = duckdb.connect()
    con.sql(f"CREATE VIEW lineitem AS SELECT * FROM '{sf}/lineitem.parquet'")
    con.sql(
        "CREATE TEMP TABLE pairs AS "
        "SELECT DISTINCT l_suppkey AS s, l_partkey + 10000000 AS p FROM lineitem"
    )
    con.sql(
        "CREATE TEMP TABLE edges AS "
        "SELECT s AS src, p AS dst FROM pairs "
        "UNION ALL SELECT p AS src, s AS dst FROM pairs"
    )
    con.sql("CREATE TEMP TABLE deg AS SELECT src, COUNT(*) AS deg FROM edges GROUP BY src")
    n = con.sql("SELECT CAST(COUNT(*) AS DOUBLE) FROM deg").fetchone()[0]
    con.sql(f"CREATE TEMP TABLE r AS SELECT src AS node, 1.0 / {n!r} AS pr FROM deg")
    for _ in range(8):
        con.sql(
            f"CREATE TEMP TABLE r_next AS "
            f"SELECT e.dst AS node, "
            f"       0.15000000000000002 / {n!r} + 0.85 * SUM(r.pr / d.deg) AS pr "
            f"FROM edges e JOIN r ON e.src = r.node JOIN deg d ON e.src = d.src "
            f"GROUP BY e.dst"
        )
        con.sql("DROP TABLE r")
        con.sql("ALTER TABLE r_next RENAME TO r")
    odf = con.sql("SELECT node, ROUND(pr, 6) AS pr FROM r").df()

    spdf = mod.queries()["graph_pagerank_fixed"](spark, sf).toPandas()

    def canon(df: pd.DataFrame) -> pd.DataFrame:
        df = df[sorted(df.columns)].round(6)
        return df.sort_values(list(df.columns)).reset_index(drop=True)

    a, b = canon(spdf), canon(odf)
    same = len(a) == len(b) and a.equals(b)
    print(f"spark rows={len(a)} oracle rows={len(b)} match={same}")
    if not same and len(a) == len(b):
        # Distinguish real divergence from 6-dp rounding ties at sf10
        # magnitudes (pr ~ 1/N ~ 5e-7 sits near the quantization floor).
        m = a.merge(b, on="node", suffixes=("_s", "_o"))
        bad = m[(m.pr_s - m.pr_o).abs() > 1.5e-6]
        print(f"rows differing beyond one 6-dp ulp: {len(bad)}")
        print(bad.head(10))
    sys.exit(0 if same else 1)


if __name__ == "__main__":
    main()
