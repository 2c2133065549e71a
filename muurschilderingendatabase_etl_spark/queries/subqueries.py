"""Subquery surface: scalar (correlated + uncorrelated), EXISTS /
NOT EXISTS, IN, quantified (ALL), and lateral top-N per group.

The reference has no subqueries (SURVEY.md §2.2), but a general engine
a user "switches to" must run them; these are the canonical TPC-H
subquery shapes (Q4/Q17/Q22) adapted to the fixture schemas.

Spark-first stance: every correlated subquery is expressed EXPLICITLY
DECORRELATED — the per-group aggregate is computed once as a DataFrame
and joined back (what Catalyst's RewriteCorrelatedScalarSubquery would
do to the SQL form) — so the physical plan is a plain agg + equi-join
that scales: no per-row re-evaluation, broadcast when the aggregate
side is small, shuffle-join otherwise. EXISTS/IN become left_semi,
NOT EXISTS becomes left_anti (no row multiplication, null-safe by
construction). The oracle SQL keeps the *correlated* form so the
parity test also proves the decorrelation is semantics-preserving.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from muurschilderingendatabase_etl_spark.registry import query
from muurschilderingendatabase_etl_spark.queries import money
from muurschilderingendatabase_etl_spark.tables import t


@query(
    "subq_scalar_uncorrelated",
    oracle="""
    SELECT o_orderpriority,
      CAST(COUNT(*) AS BIGINT) AS n_orders,
      CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE)
        AS sum_price
    FROM orders
    WHERE o_totalprice > (SELECT AVG(o_totalprice) FROM orders)
    GROUP BY o_orderpriority
    """,
)
def subq_scalar_uncorrelated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter against a global scalar aggregate (uncorrelated scalar
    subquery). The 1-row aggregate is broadcast and joined — the scalar
    never touches the driver, so the same plan works when the "scalar"
    is recomputed per run over 100 TB."""
    orders = t(spark, sf_dir, "orders").select("o_orderpriority", "o_totalprice")
    global_avg = orders.agg(F.avg("o_totalprice").alias("avg_price"))
    return (
        orders.join(F.broadcast(global_avg))
        .where(F.col("o_totalprice") > F.col("avg_price"))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            money.sum_money(F.col("o_totalprice")).alias("sum_price"),
        )
    )


@query(
    "subq_scalar_correlated",
    oracle="""
    SELECT
      CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE)
        AS small_qty_revenue,
      CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem l1
    WHERE l_quantity < 0.5 * (
      SELECT AVG(l_quantity) FROM lineitem l2
      WHERE l2.l_partkey = l1.l_partkey
    )
    """,
)
def subq_scalar_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: rows below half their part's average quantity.

    Decorrelated: one groupBy(l_partkey) aggregate over lineitem, joined
    back on the part key. Two scans of lineitem but only ONE shuffle of
    the small (partkey, avg) side; the probe side joins on its natural
    key so AQE can pick broadcast when the aggregate fits."""
    li = t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    part_avg = li.groupBy("l_partkey").agg(F.avg("l_quantity").alias("avg_qty"))
    return (
        li.join(part_avg, "l_partkey")
        .where(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg(
            money.sum_money(F.col("l_extendedprice")).alias("small_qty_revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "subq_exists_correlated",
    oracle="""
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1996-07-01'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
      )
    GROUP BY o_orderpriority
    """,
)
def subq_exists_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: correlated EXISTS with an extra non-equi
    correlate (l_shipdate > o_orderdate) → left_semi join with a mixed
    equi + range condition. The equi part (orderkey) drives the shuffle
    partitioning; the range predicate evaluates join-side, so there is
    no row explosion and no second pass."""
    orders = t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        orders.join(
            li,
            (orders.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > orders.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


@query(
    "subq_not_exists_anti",
    oracle="""
    SELECT c_mktsegment,
      CAST(COUNT(*) AS BIGINT) AS n_customers,
      CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(18,2))), 2) AS DOUBLE)
        AS sum_acctbal
    FROM customer c
    WHERE c_acctbal > (
        SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0
      )
      AND NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c.c_custkey AND o_totalprice > 300000
      )
    GROUP BY c_mktsegment
    """,
)
def subq_not_exists_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: wealthy customers with no large order — a
    scalar threshold (broadcast 1-row aggregate) plus correlated NOT
    EXISTS as a left_anti join on the customer key. The anti join's
    build side is filtered and projected to the single join column
    BEFORE the exchange, a fraction of orders' width."""
    cust = t(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    avg_pos = (
        cust.where(F.col("c_acctbal") > 0)
        .agg(F.avg("c_acctbal").alias("avg_bal"))
    )
    buyers = (
        t(spark, sf_dir, "orders")
        .where(F.col("o_totalprice") > 300000)
        .select("o_custkey")
    )
    return (
        cust.join(F.broadcast(avg_pos))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(buyers, cust.c_custkey == buyers.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            money.sum_money(F.col("c_acctbal")).alias("sum_acctbal"),
        )
    )


@query(
    "subq_in_uncorrelated",
    oracle="""
    SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n_parts
    FROM part
    WHERE p_partkey IN (
      SELECT l_partkey FROM lineitem WHERE l_quantity >= 49
    )
    GROUP BY p_brand
    """,
)
def subq_in_uncorrelated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN (subquery) → left_semi join. The subquery side is filtered
    and projected to the single join column before the exchange, so the
    shuffle carries only the key — semi-join never duplicates rows for
    parts appearing in many lineitems."""
    part = t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    big = (
        t(spark, sf_dir, "lineitem")
        .where(F.col("l_quantity") >= 49)
        .select("l_partkey")
    )
    return (
        part.join(big, part.p_partkey == big.l_partkey, "left_semi")
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n_parts"))
    )


@query(
    "subq_quantified_all",
    oracle="""
    SELECT n_name, s_name, ROUND(s_acctbal, 2) AS acctbal
    FROM supplier s1 JOIN nation ON s_nationkey = n_nationkey
    WHERE s_acctbal >= ALL (
      SELECT s_acctbal FROM supplier s2
      WHERE s2.s_nationkey = s1.s_nationkey
    )
    ORDER BY n_name, s_name
    """,
)
def subq_quantified_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantified comparison (>= ALL over the correlation group) — the
    per-nation maximum holders. Decorrelated to a groupBy(max) + join:
    one partial+final agg and one equi-join instead of a per-row
    rescan; ties (multiple suppliers at the max) are preserved, exactly
    the ALL semantics.

    NULL fidelity: SQL's `x >= ALL (S)` is UNKNOWN (row dropped) when S
    contains a NULL, but MAX ignores NULLs and would keep the top row.
    The decorrelation therefore carries a per-group has-NULL flag
    (count(*) != count(col)) and excludes those groups, matching the
    quantified-comparison semantics even on NULL-bearing data."""
    sup = t(spark, sf_dir, "supplier").select("s_nationkey", "s_name", "s_acctbal")
    nation = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    nation_max = sup.groupBy("s_nationkey").agg(
        F.max("s_acctbal").alias("max_bal"),
        (F.count(F.lit(1)) != F.count("s_acctbal")).alias("has_null_bal"),
    )
    return (
        sup.join(nation_max, "s_nationkey")
        .where((F.col("s_acctbal") >= F.col("max_bal")) & ~F.col("has_null_bal"))
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .select("n_name", "s_name", F.round("s_acctbal", 2).alias("acctbal"))
        .orderBy("n_name", "s_name")
    )


@query(
    "subq_lateral_topn",
    oracle="""
    SELECT r_name, n_name, n_customers
    FROM region, LATERAL (
      SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n_customers
      FROM nation JOIN customer ON c_nationkey = n_nationkey
      WHERE n_regionkey = r_regionkey
      GROUP BY n_name
      ORDER BY n_customers DESC, n_name
      LIMIT 2
    )
    ORDER BY r_name, n_customers DESC, n_name
    """,
)
def subq_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL top-N per outer row (top-2 nations by customer count per
    region). The scalable plan is NOT per-row re-execution: aggregate
    once over all groups, then a window row_number() <= 2 partitioned
    by region — one shuffle for the agg, one narrow window pass, no
    matter how many outer rows."""
    cust = t(spark, sf_dir, "customer").select("c_nationkey")
    nation = t(spark, sf_dir, "nation")
    region = t(spark, sf_dir, "region")
    counts = (
        cust.join(
            F.broadcast(nation), cust.c_nationkey == nation.n_nationkey
        )
        .groupBy("n_regionkey", "n_name")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )
    w = Window.partitionBy("n_regionkey").orderBy(
        F.desc("n_customers"), "n_name"
    )
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 2)
        .join(F.broadcast(region), F.col("n_regionkey") == region.r_regionkey)
        .select("r_name", "n_name", "n_customers")
        .orderBy("r_name", F.desc("n_customers"), "n_name")
    )
