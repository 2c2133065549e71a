"""PII / safety filtering operators for a pre-training corpus pipeline:
regex masking (emails, phone numbers, denylist terms) and a
quarantine split by denylist-hit density.

These are the shapes of the "redact-then-count" and "route unsafe docs
out of the training mix" passes every large-scale LLM data pipeline
runs. All computations are single-pass column expressions (Java regex
on the JVM side — no Python in the hot path); the only shuffle is the
final small aggregation, so at 100 TB the cost is one scan of the text
column per pass.

Regex note: patterns are written in the common subset of Java regex
(Spark) and RE2 (DuckDB oracle) — no backrefs, no lookbehind.

The synthetic fixture corpus contains no literal emails/phones, so those
counters exercise the zero path; the denylist term ("customer") does
occur, making the mask/quarantine results non-trivial.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from muurschilderingendatabase_etl_spark.registry import query
from muurschilderingendatabase_etl_spark.tables import t

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\d{3}[-.]\d{3}[-.]\d{4}"
DENY_RE = r"\bcustomer\b"
MASK = "[X]"


def _n_hits(col, pattern: str):
    # idx=0 = the whole match (Spark defaults to capture group 1, which
    # errors on group-free patterns; DuckDB defaults to group 0).
    return F.size(F.regexp_extract_all(col, F.lit(pattern), 0))


@query(
    "pii_redact_mask",
    oracle=f"""
    WITH h AS (
      SELECT source,
        len(regexp_extract_all(text, '{EMAIL_RE}')) AS h_email,
        len(regexp_extract_all(text, '\\d{{3}}[-.]\\d{{3}}[-.]\\d{{4}}')) AS h_phone,
        len(regexp_extract_all(text, '\\bcustomer\\b')) AS h_deny,
        length(regexp_replace(
          regexp_replace(
            regexp_replace(text, '{EMAIL_RE}', '[X]', 'g'),
            '\\d{{3}}[-.]\\d{{3}}[-.]\\d{{4}}', '[X]', 'g'),
          '\\bcustomer\\b', '[X]', 'g')) AS masked_len
      FROM documents
    )
    SELECT source,
      CAST(COUNT(*) AS BIGINT) AS n_docs,
      CAST(SUM(CASE WHEN h_email + h_phone + h_deny > 0 THEN 1 ELSE 0 END)
           AS BIGINT) AS n_flagged,
      CAST(SUM(h_email) AS BIGINT) AS n_email_hits,
      CAST(SUM(h_phone) AS BIGINT) AS n_phone_hits,
      CAST(SUM(h_deny)  AS BIGINT) AS n_deny_hits,
      CAST(SUM(masked_len) AS BIGINT) AS masked_chars
    FROM h GROUP BY source
    """,
)
def pii_redact_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source PII masking report: hit counts per pattern class
    (email / phone / denylist term) plus the total post-mask character
    count. The masked text itself is computed (three chained
    ``regexp_replace`` — all whole-stage-codegen) and immediately
    reduced; in production the same projection writes the redacted
    corpus while ``observe`` carries these counters for free."""
    docs = t(spark, sf_dir, "documents")
    masked = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace("text", EMAIL_RE, MASK), PHONE_RE, MASK
        ),
        DENY_RE,
        MASK,
    )
    h = docs.select(
        "source",
        _n_hits(F.col("text"), EMAIL_RE).alias("h_email"),
        _n_hits(F.col("text"), PHONE_RE).alias("h_phone"),
        _n_hits(F.col("text"), DENY_RE).alias("h_deny"),
        F.length(masked).alias("masked_len"),
    )
    any_hit = (F.col("h_email") + F.col("h_phone") + F.col("h_deny")) > 0
    return h.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(any_hit.cast("long")).alias("n_flagged"),
        F.sum("h_email").alias("n_email_hits"),
        F.sum("h_phone").alias("n_phone_hits"),
        F.sum("h_deny").alias("n_deny_hits"),
        F.sum("masked_len").alias("masked_chars"),
    )


@query(
    "pii_quarantine_split",
    oracle="""
    WITH h AS (
      SELECT lang,
        CAST(len(regexp_extract_all(text, '\\bcustomer\\b')) AS DOUBLE)
          / len(string_split(text, ' ')) AS deny_ratio
      FROM documents
    )
    SELECT lang,
      CAST(SUM(CASE WHEN deny_ratio <= 0.05 THEN 1 ELSE 0 END) AS BIGINT)
        AS n_clean,
      CAST(SUM(CASE WHEN deny_ratio >  0.05 THEN 1 ELSE 0 END) AS BIGINT)
        AS n_quarantined,
      ROUND(AVG(deny_ratio), 6) AS avg_deny_ratio
    FROM h GROUP BY lang
    """,
)
def pii_quarantine_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Route documents above a denylist-hit density threshold into a
    quarantine bucket, reported per language. The production shape is a
    single boolean projection feeding two filtered writes (clean corpus
    / quarantine review); here both branches are counted in one
    aggregation so the scan happens once."""
    docs = t(spark, sf_dir, "documents")
    ratio = _n_hits(F.col("text"), DENY_RE).cast("double") / F.size(
        F.split("text", " ")
    )
    return (
        docs.select("lang", ratio.alias("deny_ratio"))
        .groupBy("lang")
        .agg(
            F.sum((F.col("deny_ratio") <= 0.05).cast("long")).alias("n_clean"),
            F.sum((F.col("deny_ratio") > 0.05).cast("long")).alias(
                "n_quarantined"
            ),
            F.round(F.avg("deny_ratio"), 6).alias("avg_deny_ratio"),
        )
    )
