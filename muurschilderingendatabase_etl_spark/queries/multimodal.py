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
    # The array column is real inside the plan (Arrow transport, typed
    # schema); serialize it at the query boundary because the driver's
    # pandas canonicalizer cannot sort/hash array-typed cells.
    return out.select(
        "doc_id", "width", "height", F.to_json("feature").alias("feature_json")
    ).orderBy("doc_id")


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


@query(
    "multimodal_resize_plan",
    oracle="""
    WITH dims AS (
      SELECT doc_id,
             (octet_length(CAST(text AS BLOB)) % 64) + 1 AS in_w,
             (octet_length(CAST(text AS BLOB)) % 48) + 1 AS in_h
      FROM documents WHERE doc_id < 200
    )
    SELECT doc_id, CAST(in_w AS INT) AS in_w, CAST(in_h AS INT) AS in_h,
           CAST(FLOOR(32.0 * in_w / greatest(in_w, in_h)) AS INT) AS out_w,
           CAST(FLOOR(32.0 * in_h / greatest(in_w, in_h)) AS INT) AS out_h
    FROM dims
    """,
)
def multimodal_resize_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize plumbing: aspect-preserving fit into a 32x32 box computed
    in an Arrow-batched mapInPandas pass over the binary column. The
    DECODE is stubbed (source dimensions derived deterministically from
    payload size — no image libs in this container); the resize
    arithmetic, batch shape, and schema contract are the real thing, so
    the geometry is oracle-checked."""
    import math

    import pandas as pd

    media = _media_table(spark, sf_dir).where(F.col("doc_id") < 200).select(
        "doc_id", "content"
    )

    def resize(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            # --- STUB decode: real code would read the image header ---
            sizes = pdf["content"].map(len)
            in_w = (sizes % 64 + 1).astype("int32")
            in_h = (sizes % 48 + 1).astype("int32")
            maxwh = pd.concat([in_w, in_h], axis=1).max(axis=1)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "in_w": in_w,
                    "in_h": in_h,
                    # floor of (32*w)/m with the SAME operation order as
                    # the oracle SQL: both engines then divide identical
                    # doubles and floor identical results (round() would
                    # differ on exact halves, w*(32/m) by 1 ulp).
                    "out_w": ((32.0 * in_w) / maxwh).apply(math.floor).astype("int32"),
                    "out_h": ((32.0 * in_h) / maxwh).apply(math.floor).astype("int32"),
                }
            )

    return media.mapInPandas(
        resize, schema="doc_id long, in_w int, in_h int, out_w int, out_h int"
    )
