"""Loaders for the driver fixture tables (TESTDATA.md / FIXTURES.md §A).

All loads go through ``spark.read.parquet`` so Catalyst gets predicate
pushdown / column pruning for free. The dimension tables (region, nation,
supplier at low SF) are tiny — query code broadcast-hints them explicitly
where it matters.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimensions small enough to broadcast at ANY scale factor (fixed-size in
# TPC-H: region=5 rows, nation=25 rows always).
ALWAYS_BROADCAST = frozenset({"region", "nation"})


# Lazy-DataFrame memo, keyed by (applicationId, sf_dir, table). This is
# CATALOG caching, not result caching: the cached object is an unexecuted
# logical plan — every action over it re-reads the parquet files — it is
# exactly what a registered catalog table gives a real deployment. It
# exists because `spark.read.parquet` pays file-listing + footer schema
# inference + relation analysis on EVERY call (measured 0.23-0.49 s per
# call warm at sf0.1), and the bench suite makes ~280 such calls — tens
# of seconds of pure re-resolution of ten never-changing fixture paths
# (r12, guide §6 file listing / §7.3 driver-side planning cost). Keyed
# by applicationId so a new session never sees a stale relation; fixture
# dirs are immutable within a session by contract (tests that synthesize
# fixtures use fresh tmp paths).
_DF_CACHE: dict[tuple[str, int, str, str], DataFrame] = {}


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table as a DataFrame.

    events.ts is TIMESTAMP(NANOS) in parquet; Spark reads it as int64
    nanos (spark.sql.legacy.parquet.nanosAsLong) and we convert to a
    proper timestamp here (µs truncation — sub-µs never carries meaning
    in this engine's operators).
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    # id(spark) alongside applicationId (r12 ADVICE): sessions created
    # via newSession() share an applicationId but have their own conf;
    # a cache hit must never hand a DataFrame bound to a sibling
    # session (whose nanosAsLong / shuffle overrides would silently be
    # the ones in effect). applicationId still anchors the lifetime —
    # id() alone could collide after a session is GC'd and the address
    # reused.
    key = (spark.sparkContext.applicationId, id(spark), sf_dir, name)
    cached = _DF_CACHE.get(key)
    if cached is not None:
        return cached
    if name == "events":
        # events.parquet stores ts as INT64 TIMESTAMP(NANOS), which a vanilla
        # SparkSession rejects (PARQUET_TYPE_ILLEGAL). The legacy conf is
        # runtime-settable, so set it here defensively rather than relying on
        # the session having been built by session.get_spark() — any caller's
        # session (e.g. the round driver's bare builder) must be able to load
        # every fixture table.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            # TIMESTAMP(NANOS) fixture era: int64 nanos → µs timestamp.
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            # timestamp[us] (no tz) fixture era: Spark reads TIMESTAMP_NTZ,
            # which watermarks/unix_micros reject. Session TZ is UTC
            # (session.get_spark), so the cast to TIMESTAMP is
            # value-preserving and matches DuckDB's naive-timestamp oracle.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    _DF_CACHE[key] = df
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for spark.sql() use."""
    for name in TABLES:
        t(spark, sf_dir, name).createOrReplaceTempView(name)
