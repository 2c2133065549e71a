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


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    batch = spark.read.parquet(f"{sf_dir}/events.parquet")
    stream = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{sf_dir}/events.parquet")
    )
    if dict(stream.dtypes).get("ts") == "bigint":
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return stream


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
