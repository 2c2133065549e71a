"""Bucketed co-located join (the 100-TB join strategy).

At scale, the fact-fact join (lineitem ⋈ orders) is the shuffle that
hurts; bucketing both tables by the join key at WRITE time means every
subsequent join (and groupBy on the key) is exchange-free. This test
writes both sides bucketed, joins them with broadcast disabled, and
asserts the plan contains no shuffle exchange."""

from __future__ import annotations

import contextlib
import io

import pyspark.sql.functions as F

from muurschilderingendatabase_etl_spark.tables import t
from tests.conftest import SF_DIR


def test_bucketed_join_is_shuffle_free(spark):
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    t(spark, SF_DIR, "orders").select("o_orderkey", "o_totalprice").write.bucketBy(
        8, "o_orderkey"
    ).sortBy("o_orderkey").mode("overwrite").format("parquet").saveAsTable("b_orders")
    t(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_extendedprice"
    ).write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").mode("overwrite").format(
        "parquet"
    ).saveAsTable("b_lineitem")

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = (
            spark.table("b_lineitem")
            .join(
                spark.table("b_orders"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .select("l_orderkey", "l_extendedprice", "o_totalprice")
        )
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            joined.explain("formatted")
        plan = buf.getvalue()
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan
        assert "SelectedBucketsCount" in plan
        # and the result is right: every lineitem row finds its order
        assert joined.count() == t(spark, SF_DIR, "lineitem").count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
