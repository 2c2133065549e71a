"""Dataset-split assignment and document chunking — the two passes that
sit between a cleaned corpus and a tokenizer in an LLM data pipeline.

Split assignment must be DETERMINISTIC and content-keyed (hash of the
text, never random()) so that re-runs, backfills, and incremental
appends land each document in the same split — the property that makes
decontamination auditable. Chunking fans each document out into
fixed-width overlapping windows; at 100 TB the explode is the scan
itself (no shuffle until the closing aggregation) and the chunk count
per document is bounded, so no partition can blow up.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from muurschilderingendatabase_etl_spark.registry import query
from muurschilderingendatabase_etl_spark.tables import t

# Hex-prefix thresholds on md5(text): '00'..'07' -> test (8/256 ~ 3.1%),
# '08'..'0f' -> valid (8/256), rest -> train. String comparison on the
# lowercase hex digest is identical in Spark and DuckDB.
TEST_UPPER = "08"
VALID_UPPER = "10"

CHUNK_W = 32  # words per chunk
CHUNK_S = 24  # stride (8-word overlap)


@query(
    "split_train_valid_test",
    oracle=f"""
    WITH s AS (
      SELECT CASE WHEN substr(md5(text), 1, 2) < '{TEST_UPPER}' THEN 'test'
                  WHEN substr(md5(text), 1, 2) < '{VALID_UPPER}' THEN 'valid'
                  ELSE 'train' END AS split,
             source, n_chars
      FROM documents
    )
    SELECT split,
      CAST(COUNT(*) AS BIGINT) AS n_docs,
      CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
      CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM s GROUP BY split
    """,
)
def split_train_valid_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic content-hash split: the first two hex chars of
    md5(text) bucket each document into train/valid/test with fixed
    proportions. Pure projection + one small aggregation; the same
    expression works as a partition column for a three-way write."""
    docs = t(spark, sf_dir, "documents")
    prefix = F.substring(F.md5(F.col("text").cast("binary")), 1, 2)
    split = (
        F.when(prefix < TEST_UPPER, "test")
        .when(prefix < VALID_UPPER, "valid")
        .otherwise("train")
    )
    return (
        docs.select(split.alias("split"), "source", "n_chars")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("source").alias("n_sources"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


@query(
    "chunk_fixed_windows",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, source, string_split(text, ' ') AS w,
             len(string_split(text, ' ')) AS nw
      FROM documents
    ),
    c AS (
      SELECT doc_id, source,
        unnest(generate_series(0,
          CAST(CASE WHEN nw <= {CHUNK_W} THEN 0
               ELSE ceil((nw - {CHUNK_W}) / {CHUNK_S}.0) END AS INT))) AS i,
        w
      FROM d
    )
    SELECT source,
      CAST(COUNT(*) AS BIGINT) AS n_chunks,
      CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
      ROUND(AVG(len(list_slice(w, i * {CHUNK_S} + 1,
                               i * {CHUNK_S} + {CHUNK_W}))), 4)
        AS avg_chunk_words
    FROM c GROUP BY source
    """,
)
def chunk_fixed_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width overlapping word chunks (W=32, stride=24): each
    document explodes into ceil((n-W)/S)+1 windows, the unit a
    tokenizer / embedding stage consumes. The explode happens where the
    data lives (no pre-shuffle); chunk construction is ``slice`` on the
    already-split array, so the text is tokenized once per document,
    not once per chunk."""
    docs = t(spark, sf_dir, "documents")
    w = F.split("text", " ")
    d = docs.select("doc_id", "source", w.alias("w"), F.size(w).alias("nw"))
    last_i = (
        F.when(F.col("nw") <= CHUNK_W, 0)
        .otherwise(F.ceil((F.col("nw") - CHUNK_W) / F.lit(float(CHUNK_S))))
        .cast("int")
    )
    c = d.select(
        "doc_id",
        "source",
        "w",
        F.explode(F.sequence(F.lit(0), last_i)).alias("i"),
    )
    chunk_len = F.size(
        F.slice(F.col("w"), F.col("i") * CHUNK_S + 1, CHUNK_W)
    )
    return c.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.countDistinct("doc_id").alias("n_docs"),
        F.round(F.avg(chunk_len), 4).alias("avg_chunk_words"),
    )


QUOTA = 15  # max docs kept per source


@query(
    "sample_per_source_quota",
    oracle=f"""
    WITH r AS (
      SELECT doc_id, source, n_chars,
        ROW_NUMBER() OVER (PARTITION BY source
                           ORDER BY md5(text), doc_id) AS rk
      FROM documents
    )
    SELECT source,
      CAST(COUNT(*) AS BIGINT) AS n_kept,
      CAST(SUM(n_chars) AS BIGINT) AS kept_chars,
      CAST(MIN(doc_id) AS BIGINT) AS min_doc_id
    FROM r WHERE rk <= {QUOTA} GROUP BY source
    """,
)
def sample_per_source_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain quota sampling: cap each source at QUOTA documents,
    chosen by md5(text) rank — a deterministic, content-keyed stand-in
    for uniform sampling that re-runs identically on backfills (the same
    reason the split operator avoids random()). One window shuffle on
    the source key; a skewed mega-domain is exactly the case the quota
    exists to clip, and rank-then-filter discards its tail early."""
    from pyspark.sql import Window

    docs = t(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("text").cast("binary")), "doc_id"
    )
    return (
        docs.select(
            "doc_id",
            "source",
            "n_chars",
            F.row_number().over(w).alias("rk"),
        )
        .where(F.col("rk") <= QUOTA)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum("n_chars").alias("kept_chars"),
            F.min("doc_id").alias("min_doc_id"),
        )
    )
