"""Set operations (SURVEY.md §2.3 'Set ops') — union/unionByName,
intersect, except, distinct. `union + dropDuplicates` is exactly the
rdflib graph-union set semantics (SURVEY §1.1, O13).

Scale notes: intersect/except/distinct all shuffle on the full row; the
queries keep projections narrow first so the shuffled payload is minimal.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from muurschilderingendatabase_etl_spark.registry import query
from muurschilderingendatabase_etl_spark.tables import t


@query(
    "setop_union_distinct",
    oracle="""
    SELECT nationkey FROM (
      SELECT c_nationkey AS nationkey FROM customer
      UNION
      SELECT s_nationkey AS nationkey FROM supplier
    )
    """,
)
def setop_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Set-semantics union (rdflib Graph.add idempotence -> union + dedup).
    cn = t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    sn = t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return cn.union(sn).dropDuplicates()


@query(
    "setop_union_all_counts",
    oracle="""
    SELECT side, CAST(COUNT(*) AS BIGINT) AS n FROM (
      SELECT 'cust' AS side, c_nationkey AS nationkey FROM customer
      UNION ALL
      SELECT 'supp' AS side, s_nationkey AS nationkey FROM supplier
    ) GROUP BY side
    """,
)
def setop_union_all_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    # unionByName: schema aligned by column NAME, not position.
    cn = t(spark, sf_dir, "customer").select(
        F.lit("cust").alias("side"), F.col("c_nationkey").alias("nationkey")
    )
    sn = t(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey"), F.lit("supp").alias("side")
    )
    return cn.unionByName(sn).groupBy("side").agg(F.count(F.lit(1)).alias("n"))


@query(
    "setop_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
    """,
)
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    cn = t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    sn = t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return cn.intersect(sn)


@query(
    "setop_except",
    oracle="""
    SELECT l_partkey AS partkey FROM lineitem WHERE l_quantity > 45
    EXCEPT
    SELECT l_partkey FROM lineitem WHERE l_quantity < 5
    """,
)
def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    cn = li.where(F.col("l_quantity") > 45).select(F.col("l_partkey").alias("partkey"))
    sn = li.where(F.col("l_quantity") < 5).select(F.col("l_partkey").alias("partkey"))
    # subtract == EXCEPT DISTINCT (set semantics); exceptAll would keep
    # multiplicity remainders.
    return cn.subtract(sn)


@query(
    "setop_dropduplicates_subset",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_unique_pairs FROM (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    )
    """,
)
def setop_dropduplicates_subset(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .dropDuplicates(["l_orderkey", "l_partkey"])
        .agg(F.count(F.lit(1)).alias("n_unique_pairs"))
    )
