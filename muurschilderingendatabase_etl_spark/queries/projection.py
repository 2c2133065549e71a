"""Projection & filter operators (SURVEY.md §2.3 'Projection/filter').

Computed columns, isin, rlike, null-safe equality — all as built-in
column expressions so every predicate stays inside whole-stage codegen
(and simple ones push to the parquet scan). No Python UDFs here, per
SURVEY §4.3 item 5.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from muurschilderingendatabase_etl_spark.registry import query
from muurschilderingendatabase_etl_spark.tables import t


@query(
    "project_computed_columns",
    oracle="""
    SELECT
      l_orderkey,
      l_linenumber,
      l_extendedprice * (1 - l_discount)                AS net_price,
      l_extendedprice * (1 - l_discount) * (1 + l_tax)  AS charged,
      CASE WHEN l_returnflag = 'R' THEN 'returned' ELSE 'kept' END AS disposition
    FROM lineitem
    WHERE l_quantity >= 45
    """,
)
def project_computed_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    net = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        t(spark, sf_dir, "lineitem")
        .where(F.col("l_quantity") >= 45)
        .select(
            "l_orderkey",
            "l_linenumber",
            # no ROUND on row-level doubles: IEEE ops with identical
            # operand order are bitwise-equal across engines, while
            # ROUND half-up (Spark) vs half-even (C libs) at .xx5 differs.
            net.alias("net_price"),
            (net * (1 + F.col("l_tax"))).alias("charged"),
            F.when(F.col("l_returnflag") == "R", "returned")
            .otherwise("kept")
            .alias("disposition"),
        )
    )


@query(
    "filter_isin",
    oracle="""
    SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n
    FROM orders
    WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
    GROUP BY o_orderstatus
    """,
)
def filter_isin(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "orders")
        .where(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "filter_rlike",
    oracle="""
    SELECT p_partkey, p_name
    FROM part
    WHERE regexp_matches(p_name, '^(small|large) (widget|bolt)$')
    """,
)
def filter_rlike(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Same regex class the RDF cleanup uses for URI validity (SURVEY O3/O5):
    # rlike stays JVM-side instead of a Python `uritools` UDF.
    return (
        t(spark, sf_dir, "part")
        .where(F.col("p_name").rlike("^(small|large) (widget|bolt)$"))
        .select("p_partkey", "p_name")
    )


@query(
    "filter_null_safe_eq",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_matching
    FROM lineitem
    WHERE NULLIF(l_returnflag, 'N') IS NOT DISTINCT FROM NULLIF(l_linestatus, 'O')
    """,
)
def filter_null_safe_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    # <=> (null-safe equality): NULL <=> NULL is true, unlike plain =.
    lhs = F.nullif(F.col("l_returnflag"), F.lit("N"))
    rhs = F.nullif(F.col("l_linestatus"), F.lit("O"))
    return (
        t(spark, sf_dir, "lineitem")
        .where(lhs.eqNullSafe(rhs))
        .agg(F.count(F.lit(1)).alias("n_matching"))
    )


@query(
    "filter_between_distinct",
    oracle="""
    SELECT DISTINCT c_mktsegment
    FROM customer
    WHERE c_acctbal BETWEEN 1000 AND 5000
    """,
)
def filter_between_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "customer")
        .where(F.col("c_acctbal").between(1000, 5000))
        .select("c_mktsegment")
        .distinct()
    )
