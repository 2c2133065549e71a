#!/usr/bin/env python
"""One-off sf10 verification for geo_distance_join_grid.

The REGISTERED oracle is the honest all-pairs quadratic — the strongest
possible proof that the grid blocking is lossless, but ~1.5e11
haversines at sf10 (100k suppliers x 1.5M customers); the first sf10
sweep ground it for 40+ minutes before being cut. This script checks
the same query at sf10 two ways:

1. DuckDB runs the GRID form itself — same 15-cell neighborhood and
   antimeridian ring wrap as the Spark plan, but DuckDB's own libm trig
   (so cross-engine arithmetic is still independently exercised). The
   grid-form <-> all-pairs-form identity is proven IN DUCKDB at sf0.01
   by tests/test_invariants.py, so this check inherits the losslessness
   proof while staying feasible at sf10.
2. Suppliers are restricted to s_suppkey % 20 = 0 on BOTH sides (every
   other table untouched): each supplier's output row depends only on
   itself and the FULL customer table, so the slice checks 5k supplier
   neighborhoods at true sf10 customer density — the per-probe workload
   IS the at-scale unit of work (same argument as the sf1 single-source
   pair-miner restriction).

Usage: python scripts/geo_sf10_check.py [sf10_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from muurschilderingendatabase_etl_spark.queries.geo import (  # noqa: E402
    CELL_DEG,
    RADIUS_KM,
    _LAT,
    _LON,
    _haversine_sql,
)

N_CELLS_LON = 360 // CELL_DEG  # 72-cell antimeridian ring


def grid_oracle_sql(supplier_pred: str = "TRUE") -> str:
    """DuckDB spelling of the grid plan (independent trig, same cells)."""
    hav = _haversine_sql("s.lat", "s.lon", "c.lat", "c.lon")
    half = N_CELLS_LON // 2
    return f"""
    WITH s0 AS (
      SELECT s_suppkey,
             {_LAT.format(k="s_suppkey")} AS lat,
             {_LON.format(k="s_suppkey")} AS lon
      FROM supplier WHERE {supplier_pred}
    ),
    c AS (
      SELECT c_custkey,
             {_LAT.format(k="c_custkey")} AS lat,
             {_LON.format(k="c_custkey")} AS lon,
             FLOOR({_LAT.format(k="c_custkey")} / {CELL_DEG}) AS cell_lat,
             FLOOR({_LON.format(k="c_custkey")} / {CELL_DEG}) AS cell_lon
      FROM customer
    ),
    offs AS (
      SELECT dla.generate_series AS dla, dlo.generate_series AS dlo
      FROM generate_series(-1, 1) dla, generate_series(-2, 2) dlo
    ),
    s AS (
      SELECT s0.*,
             FLOOR(lat / {CELL_DEG}) + dla AS p_cell_lat,
             ((CAST(FLOOR(lon / {CELL_DEG}) + dlo AS BIGINT) + {half})
              % {N_CELLS_LON} + {N_CELLS_LON}) % {N_CELLS_LON} - {half}
               AS p_cell_lon
      FROM s0, offs
    )
    SELECT s.s_suppkey,
      CAST(COUNT(*) AS BIGINT) AS n_within,
      ROUND(MIN({hav}), 2) AS nearest_km
    FROM s JOIN c
      ON c.cell_lat = s.p_cell_lat AND c.cell_lon = s.p_cell_lon
     AND abs(c.lat - s.lat) <= 4.51
     AND {hav} <= {RADIUS_KM}
    GROUP BY s.s_suppkey
    """


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scratch/real-sf10"

    import duckdb
    import pandas as pd

    from pyspark.sql import SparkSession

    # Supplier-sliced fixture dir: filtered supplier, everything else
    # symlinked — so the registered Spark query runs unmodified.
    dst = sf.rstrip("/") + "-s20"
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    con.sql(
        f"COPY (SELECT * FROM '{sf}/supplier.parquet' "
        f"WHERE s_suppkey % 20 = 0) TO '{dst}/supplier.parquet' "
        f"(FORMAT PARQUET)"
    )
    for t_ in ["region", "nation", "customer", "part", "orders",
               "lineitem", "events", "documents", "embeddings"]:
        link = f"{dst}/{t_}.parquet"
        if not os.path.exists(link):
            os.symlink(f"{sf}/{t_}.parquet", link)

    spark = SparkSession.builder.master("local[32]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as mod

    def canon(df: pd.DataFrame) -> pd.DataFrame:
        df = df[sorted(df.columns)].round(6)
        return df.sort_values(list(df.columns)).reset_index(drop=True)

    con.sql(f"CREATE VIEW supplier AS SELECT * FROM '{dst}/supplier.parquet'")
    con.sql(f"CREATE VIEW customer AS SELECT * FROM '{sf}/customer.parquet'")

    spdf = canon(mod.queries()["geo_distance_join_grid"](spark, dst).toPandas())
    odf = canon(con.sql(grid_oracle_sql()).df())
    same = len(spdf) == len(odf) and spdf.equals(odf)
    print(f"spark rows={len(spdf)} oracle rows={len(odf)} match={same}")
    sys.exit(0 if same else 1)


if __name__ == "__main__":
    main()
