#!/usr/bin/env python
"""One-off sf10 verification for skyline_pareto_frontier.

The REGISTERED oracle is the literal quadratic dominance NOT EXISTS —
the clearest spec of the semantics, fine at driver SFs, but ~1.6e11
comparisons at sf10 (2M parts / 25 brands). This script checks the same
query at sf10 against an O(n log n) reformulation of the exact same
frontier: a part survives iff

  * no strictly-cheaper part in its brand reaches its size
    (running MAX(p_size) over prices below it), and
  * no same-price part in its brand strictly exceeds its size.

That is literally the dominance predicate split by the price comparison
(q.price < p.price | q.price = p.price), so the two forms agree row-for
-row on any input — which tests/test_invariants.py asserts at sf0.01 by
diffing both DuckDB forms.

Usage: python scripts/skyline_sf10_check.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FAST_SKYLINE = """
WITH pp AS (
  SELECT p_brand, p_retailprice, MAX(p_size) AS ms
  FROM part GROUP BY 1, 2
),
run AS (
  SELECT p_brand, p_retailprice, ms,
         MAX(ms) OVER (
           PARTITION BY p_brand ORDER BY p_retailprice
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ) AS prev_ms
  FROM pp
)
SELECT p.p_brand, p.p_partkey, p.p_size,
       ROUND(p.p_retailprice, 2) AS p_retailprice
FROM part p
JOIN run r
  ON r.p_brand = p.p_brand AND r.p_retailprice = p.p_retailprice
WHERE (r.prev_ms IS NULL OR r.prev_ms < p.p_size)
  AND r.ms = p.p_size
"""


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scratch/real-sf10"

    import duckdb
    import pandas as pd

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.master("local[32]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as mod

    def canon(df: pd.DataFrame) -> pd.DataFrame:
        df = df[sorted(df.columns)]
        return df.sort_values(list(df.columns)).reset_index(drop=True)

    con = duckdb.connect()
    con.sql(f"CREATE VIEW part AS SELECT * FROM '{sf}/part.parquet'")

    spdf = canon(mod.queries()["skyline_pareto_frontier"](spark, sf).toPandas())
    odf = canon(con.sql(FAST_SKYLINE).df())
    same = len(spdf) == len(odf) and spdf.round(6).equals(odf.round(6))
    print(f"spark rows={len(spdf)} oracle rows={len(odf)} match={same}")
    sys.exit(0 if same else 1)


if __name__ == "__main__":
    main()
