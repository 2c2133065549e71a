"""Inverted-index construction over the documents corpus: document
frequency ranking and per-term posting lists.

The explode(split(text)) fan-out runs where the data lives; the only
shuffle groups by term. Term frequency follows a Zipf distribution, so
the head terms are the skew risk at 100 TB — the df ranking partial-
aggregates (a count, safe under skew + AQE split), while posting-list
assembly materializes per-term lists and is therefore run on a bounded
term subset here; production shards postings by (term, doc_id range)
before concatenation, which is the same plan with one extra group key.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from muurschilderingendatabase_etl_spark.registry import query
from muurschilderingendatabase_etl_spark.tables import t

TOP_N = 20
POSTING_TERMS = ("spark", "customer", "window", "vector", "hash")


@query(
    "index_doc_frequency",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS word
      FROM documents
    )
    SELECT word,
      CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS doc_freq,
      CAST(COUNT(*) AS BIGINT) AS coll_freq
    FROM w WHERE word <> ''
    GROUP BY word
    ORDER BY doc_freq DESC, word
    LIMIT {TOP_N}
    """,
)
def index_doc_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary head: top-N terms by document frequency (ties broken
    by term for determinism), with collection frequency alongside.
    count + count-distinct per term; the top-N is a TakeOrdered over
    the aggregated (small) term table, not a global sort of postings."""
    docs = t(spark, sf_dir, "documents")
    w = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("word")
    ).where(F.col("word") != "")
    return (
        w.groupBy("word")
        .agg(
            F.countDistinct("doc_id").alias("doc_freq"),
            F.count(F.lit(1)).alias("coll_freq"),
        )
        .orderBy(F.col("doc_freq").desc(), "word")
        .limit(TOP_N)
    )


@query(
    "index_posting_lists",
    oracle=f"""
    WITH w AS (
      SELECT DISTINCT word, doc_id FROM (
        SELECT doc_id, unnest(string_split(text, ' ')) AS word
        FROM documents
      )
      WHERE word IN {POSTING_TERMS!r}
    )
    SELECT word,
      CAST(COUNT(*) AS BIGINT) AS doc_freq,
      string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings
    FROM w GROUP BY word
    """,
)
def index_posting_lists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Posting lists for a fixed term subset: sorted, comma-joined
    doc_id lists plus document frequency. The term filter lands before
    the explode output is shuffled (predicate on the generated column),
    so only matching (term, doc) pairs move."""
    docs = t(spark, sf_dir, "documents")
    w = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
        .where(F.col("word").isin(*POSTING_TERMS))
        .distinct()
    )
    postings = F.array_join(
        F.transform(
            F.array_sort(F.collect_list("doc_id")),
            lambda x: x.cast("string"),
        ),
        ",",
    )
    return w.groupBy("word").agg(
        F.count(F.lit(1)).alias("doc_freq"),
        postings.alias("postings"),
    )
