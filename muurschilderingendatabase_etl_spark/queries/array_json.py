"""Array / map / JSON operators (SURVEY.md §2.3 'Array/map/JSON').

`from_json` on events.props, explode over split text, array aggregation
on the embeddings vectors, and a map-literal lookup (the Spark form of
the reference's predicate-rename map, transform_datamodel.py:112-119 /
SURVEY O14).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from muurschilderingendatabase_etl_spark.registry import query
from muurschilderingendatabase_etl_spark.tables import t


@query(
    "json_extract_props",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(AVG(CAST(json_extract_string(props, '$.k') AS BIGINT)), 4) AS avg_k,
           CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
    FROM events
    GROUP BY event_type
    """,
)
def json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    # from_json with explicit schema: parsed once, then plain column ops.
    k = F.from_json("props", "k long").getField("k")
    return (
        t(spark, sf_dir, "events")
        .withColumn("k", k)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("k"), 4).alias("avg_k"),
            F.max("k").alias("max_k"),
        )
    )


@query(
    "json_variant_extract",
    oracle="""
    SELECT event_type,
      CAST(COUNT(*) AS BIGINT) AS n,
      CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      CAST(MIN(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS min_k
    FROM events
    WHERE event_id < 5000
    GROUP BY event_type
    """,
)
def json_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT path: parse_json once into the binary-encoded
    VARIANT type, then typed variant_get access — unlike string-walking
    get_json_object, repeated field reads don't re-parse the JSON text.
    The shredded-variant encoding is the semi-structured scale story
    (columnarized JSON fields with pushdown in Parquet readers)."""
    # try_ variants: malformed JSON (or a non-numeric k) yields NULL and
    # drops out of the aggregates instead of MALFORMED_RECORD_IN_PARSING
    # aborting the job — the posture a 100 TB ingest needs, where some
    # slice of props is always garbage.
    v = F.try_parse_json("props")
    k = F.try_variant_get(v, "$.k", "bigint")
    return (
        t(spark, sf_dir, "events")
        .where(F.col("event_id") < 5000)
        .withColumn("k", k)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
        )
    )


@query(
    "array_explode_tokens",
    oracle="""
    SELECT token, CAST(COUNT(*) AS BIGINT) AS occurrences
    FROM (
      SELECT UNNEST(string_split(text, ' ')) AS token
      FROM documents WHERE lang = 'en'
    )
    WHERE token <> ''
    GROUP BY token
    ORDER BY occurrences DESC, token
    LIMIT 20
    """,
)
def array_explode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    # split -> explode -> count: generator + partial-agg; the shuffle
    # carries (token, partial_count), not raw tokens.
    return (
        t(spark, sf_dir, "documents")
        .where(F.col("lang") == "en")
        .select(F.explode(F.split("text", " ")).alias("token"))
        .where(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("occurrences"))
        .orderBy(F.desc("occurrences"), "token")
        .limit(20)
    )


@query(
    "array_ops_embeddings",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS INT)                       AS dim,
           ROUND(CAST(list_aggregate(embedding, 'sum') AS DOUBLE), 4) AS vec_sum,
           ROUND(CAST(list_aggregate(embedding, 'max') AS DOUBLE), 4) AS vec_max,
           ROUND(CAST(embedding[1] AS DOUBLE), 4)                     AS first_component
    FROM embeddings
    WHERE vec_id < 100
    """,
)
def array_ops_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Array ops stay JVM-side: aggregate() folds without exploding rows.
    emb = F.col("embedding")
    return (
        t(spark, sf_dir, "embeddings")
        .where(F.col("vec_id") < 100)
        .select(
            "vec_id",
            F.size(emb).alias("dim"),
            F.round(
                F.aggregate(emb, F.lit(0.0), lambda acc, x: acc + x.cast("double")), 4
            ).alias("vec_sum"),
            F.round(F.array_max(emb).cast("double"), 4).alias("vec_max"),
            F.round(emb.getItem(0).cast("double"), 4).alias("first_component"),
        )
    )


@query(
    "map_lookup_remap",
    oracle="""
    SELECT
      CASE event_type
        WHEN 'click'    THEN 'interaction'
        WHEN 'view'     THEN 'interaction'
        WHEN 'purchase' THEN 'conversion'
        ELSE event_type
      END AS event_class,
      CAST(COUNT(*) AS BIGINT) AS n
    FROM events
    GROUP BY event_class
    """,
)
def map_lookup_remap(spark: SparkSession, sf_dir: str) -> DataFrame:
    # create_map literal + coalesce fallback == the reference's predicate
    # rename O14: map hit -> new value, miss -> original. Pure projection,
    # no shuffle, no UDF.
    remap = F.create_map(
        F.lit("click"), F.lit("interaction"),
        F.lit("view"), F.lit("interaction"),
        F.lit("purchase"), F.lit("conversion"),
    )
    return (
        t(spark, sf_dir, "events")
        .groupBy(
            F.coalesce(remap[F.col("event_type")], F.col("event_type")).alias(
                "event_class"
            )
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "array_collect_sorted",
    oracle="""
    SELECT n_regionkey,
           array_to_string(list_sort(list(n_name)), ',') AS nations
    FROM nation
    GROUP BY n_regionkey
    """,
)
def array_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    # collect_list + array_sort: deterministic despite unordered collect.
    # Serialized to a scalar string at the query boundary — the driver's
    # pandas canonicalizer cannot sort/hash array-typed cells.
    return (
        t(spark, sf_dir, "nation")
        .groupBy("n_regionkey")
        .agg(
            F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias(
                "nations"
            )
        )
    )


@query(
    "array_hof_vector_norm",
    oracle="""
    SELECT vec_id,
      CAST(len(embedding) AS INT) AS dim,
      ROUND(sqrt(list_sum(list_transform(embedding,
            x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 4) AS l2_norm,
      ROUND(CAST(embedding[1] AS DOUBLE)
            / sqrt(list_sum(list_transform(embedding,
                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6)
        AS first_unit
    FROM embeddings
    """,
)
def array_hof_vector_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions on the embedding column: a lambda
    fold (``aggregate``) computes the L2 norm and ``element_at`` /
    arithmetic derive the first unit-normalized component — all inside
    codegen, no explode, no Python. The fold visits elements in array
    order on both engines, so the double sums are bitwise comparable
    before rounding."""
    sq = F.aggregate(
        "embedding",
        F.lit(0.0),
        lambda acc, x: acc + x.cast("double") * x.cast("double"),
    )
    norm = F.sqrt(sq)
    emb = t(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(norm, 4).alias("l2_norm"),
        # try_divide: a zero vector has no unit direction — NULL, matching
        # DuckDB's x/0, instead of an ANSI DIVIDE_BY_ZERO job abort.
        F.round(
            F.try_divide(F.element_at("embedding", 1).cast("double"), norm), 6
        ).alias("first_unit"),
    )
