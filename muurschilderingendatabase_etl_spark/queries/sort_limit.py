"""Sort / limit / top-k (SURVEY.md §2.3 'Sort/limit').

Scale notes: `orderBy().limit(k)` compiles to TakeOrderedAndProject — a
per-partition top-k then a single-reduce merge, NOT a global sort; this is
the only safe "global top-k" at 100 TB. The full global sort is kept to
one query and documented as range-partitioned (Spark samples boundaries).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from muurschilderingendatabase_etl_spark.registry import query
from muurschilderingendatabase_etl_spark.tables import t


@query(
    "sort_global_topk",
    oracle="""
    SELECT o_orderkey, o_totalprice AS totalprice, o_orderpriority
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
)
def sort_global_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TakeOrderedAndProject: no global shuffle, k rows per partition merged.
    return (
        t(spark, sf_dir, "orders")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(10)
        .select("o_orderkey", F.col("o_totalprice").alias("totalprice"), "o_orderpriority")
    )


@query(
    "sort_multi_key",
    oracle="""
    SELECT n_name, s_suppkey, s_acctbal AS acctbal
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    ORDER BY n_name ASC, s_acctbal DESC, s_suppkey
    LIMIT 50
    """,
)
def sort_multi_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "supplier")
        .join(F.broadcast(t(spark, sf_dir, "nation")), F.col("s_nationkey") == F.col("n_nationkey"))
        .orderBy(F.asc("n_name"), F.desc("s_acctbal"), F.asc("s_suppkey"))
        .limit(50)
        .select("n_name", "s_suppkey", F.col("s_acctbal").alias("acctbal"))
    )


@query(
    "sort_nulls_ordering",
    oracle="""
    SELECT event_id, NULLIF(event_type, 'error') AS et
    FROM events
    ORDER BY et ASC NULLS FIRST, event_id
    LIMIT 100
    """,
)
def sort_nulls_ordering(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Explicit null ordering on both sides (Spark default asc = NULLS
    # FIRST, DuckDB default = NULLS LAST — always say it, SURVEY §7).
    return (
        t(spark, sf_dir, "events")
        .select("event_id", F.nullif("event_type", F.lit("error")).alias("et"))
        .orderBy(F.col("et").asc_nulls_first(), "event_id")
        .limit(100)
    )
