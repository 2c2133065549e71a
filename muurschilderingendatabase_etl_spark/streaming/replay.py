"""Replay the events parquet through Structured Streaming.

``readStream`` needs an explicit schema; we reuse the batch reader's
(including the TIMESTAMP(NANOS) → bigint → timestamp conversion from
``tables.t``). ``trigger(availableNow=True)`` processes the backlog and
terminates — the deterministic replay mode that makes batch-stream
equivalence testable (SURVEY §5.2 item 4).

At scale the same topology runs unmodified against a live source (Kafka
/ file drop): swap ``readStream.parquet`` for the real source; watermarks
and state management are already in place.
"""

from __future__ import annotations

import tempfile
import uuid

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


_STAGED: dict[tuple[str, str], str] = {}


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream the events table: Spark's file stream source requires a
    directory, so stage the (timestamp-normalized) events parquet into a
    session-scoped temp dir once per sf_dir, then readStream from it."""
    from muurschilderingendatabase_etl_spark.tables import t

    key = (spark.sparkContext.applicationId, sf_dir)
    staged = _STAGED.get(key)
    if staged is None:
        staged = tempfile.mkdtemp(prefix="msdb_events_stage_")
        t(spark, sf_dir, "events").write.mode("overwrite").parquet(staged)
        _STAGED[key] = staged
    schema = spark.read.parquet(staged).schema
    return spark.readStream.schema(schema).parquet(staged)


def run_to_memory(result: DataFrame, output_mode: str = "complete") -> DataFrame:
    """Execute a streaming DataFrame to completion into a memory sink and
    return the materialized result as a batch DataFrame."""
    name = f"msdb_stream_{uuid.uuid4().hex[:12]}"
    query = (
        result.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="msdb_ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    spark = result.sparkSession
    return spark.table(name)
