"""Batch-stream equivalence (SURVEY.md §5.2 item 4): the same windowed
aggregation computed by Structured Streaming replay and by a plain batch
DataFrame plan must agree exactly. The oracle-parity suite already checks
the streaming queries against DuckDB; this checks them against Spark's own
batch engine, closing the triangle."""

from __future__ import annotations

import pyspark.sql.functions as F

from muurschilderingendatabase_etl_spark.queries.streaming_windows import (
    stream_session_window,
    stream_tumbling_window,
)
from muurschilderingendatabase_etl_spark.tables import t
from tests.conftest import SF_DIR


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_tumbling_batch_equivalence(spark):
    streamed = stream_tumbling_window(spark, SF_DIR)
    batch = (
        t(spark, SF_DIR, "events")
        .groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )
    assert _sorted_rows(streamed) == _sorted_rows(batch)


def test_session_batch_equivalence(spark):
    streamed = stream_session_window(spark, SF_DIR)
    batch = (
        t(spark, SF_DIR, "events")
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            "user_id",
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
                "session_start"
            ),
            "n_events",
            "total_value",
        )
    )
    assert _sorted_rows(streamed) == _sorted_rows(batch)
