"""Multimodal column convention (north-star extension).

Media payloads are opaque ``binary`` columns with a typed metadata
struct (mime, size, content hash). The Spark-side plumbing — schema,
partitioning, Arrow-batched UDF signatures — is real and tested; the
actual image/audio decoding is STUBBED (decode libraries are not in
this container) behind a deterministic fake that derives "features"
from the payload hash, clearly marked below.

Scale notes: binary payloads ride in parquet as-is; metadata extraction
is a projection (no shuffle); feature extraction is `mapInPandas` so
each Arrow batch crosses the Python boundary once, vectorized.
"""

from __future__ import annotations

from collections.abc import Iterator

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from muurschilderingendatabase_etl_spark.registry import query
from muurschilderingendatabase_etl_spark.tables import t


def _media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize a media table: document text encoded as the binary
    payload (deterministic), with a typed metadata struct — the column
    convention a real ingest would produce."""
    docs = t(spark, sf_dir, "documents")
    payload = F.encode("text", "UTF-8")
    return docs.select(
        "doc_id",
        payload.alias("content"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.octet_length(payload).alias("size_bytes"),
            F.sha2(payload, 256).alias("content_hash"),
            F.col("source").alias("origin"),
        ).alias("meta"),
    )


@query(
    "multimodal_metadata",
    oracle="""
    SELECT
      doc_id,
      'application/octet-stream'        AS mime,
      CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS size_bytes,
      sha256(text)                      AS content_hash
    FROM documents
    WHERE doc_id < 200
    """,
)
def multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed-metadata extraction from the binary column — oracle-checked
    (hashes and sizes are engine-independent)."""
    media = _media_table(spark, sf_dir)
    return media.where(F.col("doc_id") < 200).select(
        "doc_id",
        F.col("meta.mime").alias("mime"),
        F.col("meta.size_bytes").cast("long").alias("size_bytes"),
        F.col("meta.content_hash").alias("content_hash"),
    )


@query("multimodal_feature_extract")  # rows-only: stubbed decoder
def multimodal_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched feature extraction over the binary column.

    STUB: a real deployment would decode the payload (image/audio) and
    emit model features; decode libs are absent here, so features are
    derived deterministically from the payload bytes. The mapInPandas
    plumbing (schema contract, batch shape, binary transport) is the
    real thing.
    """
    import hashlib

    import pandas as pd

    # Repartition: single-file fixture scan = one split; spreading rows
    # lets one Python worker per core process Arrow batches in parallel.
    media = (
        _media_table(spark, sf_dir)
        .select("doc_id", "content")
        .repartition(spark.sparkContext.defaultParallelism)
    )

    def extract(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            # --- STUB decode: replace with PIL/librosa/etc. in prod ---
            digests = [hashlib.sha1(b).digest() for b in pdf["content"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": [d[0] % 64 + 1 for d in digests],
                    "height": [d[1] % 64 + 1 for d in digests],
                    "feature": [
                        [b / 255.0 for b in d[:8]] for d in digests
                    ],
                }
            )

    out = media.mapInPandas(
        extract,
        schema="doc_id long, width int, height int, feature array<double>",
    )
    return out.orderBy("doc_id")


@query(
    "multimodal_frame_sample",
    oracle="""
    SELECT doc_id, CAST(f AS INT) AS frame_idx, CAST(f * 64 AS INT) AS byte_offset
    FROM (
      SELECT doc_id,
             unnest(generate_series(
               0,
               CAST(FLOOR(LEAST(octet_length(CAST(text AS BLOB)) / 64.0, 8)) AS INT)
             )) AS f
      FROM documents WHERE doc_id < 100
    )
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plumbing for video-like payloads: one row per
    sampled frame offset (explode), deterministic offsets from payload
    size — offset arithmetic is engine-independent, hence oracle-checked
    (only the decode itself is stubbed in this container)."""
    media = _media_table(spark, sf_dir)
    n_frames = F.least(F.col("meta.size_bytes") / 64, F.lit(8)).cast("int")
    return (
        media.where(F.col("doc_id") < 100)
        .select(
            "doc_id",
            F.explode(F.sequence(F.lit(0), n_frames)).alias("frame_idx"),
        )
        .select(
            "doc_id",
            "frame_idx",
            (F.col("frame_idx") * 64).alias("byte_offset"),
        )
        .orderBy("doc_id", "frame_idx")
    )
