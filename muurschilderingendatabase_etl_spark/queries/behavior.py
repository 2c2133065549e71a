"""Behavioral / event-sequence analytics over the events stream table:
conversion funnels and weekly retention cohorts.

Both are two-level aggregations (per-user reduction first, then the
small report aggregation). The per-user stage is the only real shuffle
and it partitions on user_id — the natural high-cardinality key, so the
plan scales linearly with users and is skew-free unless one user owns a
pathological share of events (the AQE skew-join/agg split handles that
case, asserted elsewhere in tests/test_plans.py).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from muurschilderingendatabase_etl_spark.registry import query
from muurschilderingendatabase_etl_spark.tables import t


@query(
    "funnel_signup_purchase",
    oracle="""
    WITH w AS (
      SELECT user_id, ts, event_type,
        MIN(CASE WHEN event_type = 'signup' THEN ts END)
          OVER (PARTITION BY user_id) AS s_ts
      FROM events
    ),
    u AS (
      SELECT user_id, MIN(s_ts) AS s_ts,
        MIN(CASE WHEN event_type = 'purchase' AND ts > s_ts THEN ts END)
          AS p_ts
      FROM w WHERE s_ts IS NOT NULL GROUP BY user_id
    )
    SELECT
      CAST(COUNT(*) AS BIGINT) AS n_signup_users,
      CAST(COUNT(p_ts) AS BIGINT) AS n_converted,
      ROUND(CAST(COUNT(p_ts) AS DOUBLE) / COUNT(*), 4) AS conversion_rate,
      ROUND(AVG((epoch_us(p_ts) - epoch_us(s_ts)) / 3600000000.0), 2)
        AS avg_hours_to_convert
    FROM u
    """,
)
def funnel_signup_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage funnel: users whose first purchase strictly follows
    their first signup. The signup anchor is distributed to the user's
    other rows with a partition-only window (no ORDER BY — one shuffle,
    no sort), then a per-user aggregate collapses to (first signup,
    first qualifying purchase), and a single global row reports
    conversion rate and mean hours-to-convert."""
    ev = t(spark, sf_dir, "events")
    uw = Window.partitionBy("user_id")
    w = ev.select(
        "user_id",
        "ts",
        "event_type",
        F.min(
            F.when(F.col("event_type") == "signup", F.col("ts"))
        ).over(uw).alias("s_ts"),
    ).where(F.col("s_ts").isNotNull())
    u = w.groupBy("user_id").agg(
        F.min("s_ts").alias("s_ts"),
        F.min(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("ts") > F.col("s_ts")),
                F.col("ts"),
            )
        ).alias("p_ts"),
    )
    hours = (
        F.unix_micros("p_ts") - F.unix_micros("s_ts")
    ) / 3_600_000_000.0
    return u.agg(
        F.count(F.lit(1)).alias("n_signup_users"),
        F.count("p_ts").alias("n_converted"),
        # try_divide: NULL on an empty funnel (0 signup users) instead of
        # ANSI DIVIDE_BY_ZERO — matching DuckDB, whose x/0 is NULL.
        F.round(
            F.try_divide(F.count("p_ts").cast("double"), F.count(F.lit(1))), 4
        ).alias("conversion_rate"),
        F.round(F.avg(hours), 2).alias("avg_hours_to_convert"),
    )


@query(
    "retention_weekly_cohorts",
    oracle="""
    WITH e AS (
      SELECT user_id, date_trunc('week', ts) AS wk FROM events
    ),
    c AS (
      SELECT user_id, MIN(wk) AS cohort FROM e GROUP BY user_id
    )
    SELECT strftime(c.cohort, '%Y-%m-%d') AS cohort_week,
      CAST(date_diff('day', c.cohort, e.wk) / 7 AS INT) AS week_offset,
      CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_active
    FROM e JOIN c USING (user_id)
    GROUP BY 1, 2
    """,
)
def retention_weekly_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic retention triangle: cohort = ISO week of a user's first
    event; each (cohort, week-offset) cell counts distinct users active
    that week. The cohort frame is user_id-keyed and tiny relative to
    the fact table, so the join back is broadcastable at any events
    scale where users << events."""
    ev = t(spark, sf_dir, "events").select(
        "user_id", F.date_trunc("week", "ts").alias("wk")
    )
    cohort = ev.groupBy("user_id").agg(F.min("wk").alias("cohort"))
    return (
        ev.join(cohort, "user_id")
        .select(
            F.date_format("cohort", "yyyy-MM-dd").alias("cohort_week"),
            (F.datediff("wk", "cohort") / 7).cast("int").alias("week_offset"),
            "user_id",
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").alias("n_active"))
    )


@query(
    "anomaly_zscore_gate",
    oracle="""
    WITH s AS (
      SELECT event_type, AVG(value) AS mu, stddev_samp(value) AS sd
      FROM events GROUP BY event_type
    )
    SELECT e.event_type,
      CAST(COUNT(*) AS BIGINT) AS n_events,
      CAST(SUM(CASE WHEN abs(e.value - s.mu) > 3 * s.sd THEN 1 ELSE 0 END)
           AS BIGINT) AS n_outliers,
      ROUND(s.mu, 4) AS mean_value,
      ROUND(s.sd, 4) AS stddev_value
    FROM events e JOIN s USING (event_type)
    GROUP BY e.event_type, s.mu, s.sd
    """,
)
def anomaly_zscore_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-sigma outlier gate per event type: a first aggregation
    derives (mean, stddev) per type — a handful of rows, broadcast back
    onto the fact scan — and a second counts values beyond 3 sigma. The
    monitoring-pipeline shape: two scans, no wide shuffle; the stats
    frame stays broadcastable no matter how large events grows because
    its cardinality is the type dimension, not the fact table."""
    ev = t(spark, sf_dir, "events")
    s = ev.groupBy("event_type").agg(
        F.avg("value").alias("mu"), F.stddev_samp("value").alias("sd")
    )
    return (
        ev.join(F.broadcast(s), "event_type")
        .groupBy("event_type", "mu", "sd")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(
                (
                    F.abs(F.col("value") - F.col("mu")) > 3 * F.col("sd")
                ).cast("long")
            ).alias("n_outliers"),
        )
        .select(
            "event_type",
            "n_events",
            "n_outliers",
            F.round("mu", 4).alias("mean_value"),
            F.round("sd", 4).alias("stddev_value"),
        )
    )


@query(
    "sequence_pattern_match",
    oracle="""
    WITH seqs AS (
      SELECT user_id,
        string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id)
          AS seq
      FROM events GROUP BY user_id
    )
    SELECT
      CAST(COUNT(*) AS BIGINT) AS n_users,
      CAST(SUM(CASE WHEN regexp_matches(seq, 's[^p]*p') THEN 1 ELSE 0 END)
           AS BIGINT) AS n_direct_convert,
      CAST(SUM(CASE WHEN regexp_matches(seq, 'sv+p') THEN 1 ELSE 0 END)
           AS BIGINT) AS n_browse_convert,
      CAST(SUM(CASE WHEN regexp_matches(seq, 'e.*e.*e') THEN 1 ELSE 0 END)
           AS BIGINT) AS n_error_prone,
      ROUND(AVG(length(seq)), 4) AS avg_events_per_user
    FROM seqs
    """,
)
def sequence_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE-lite: each user's event history becomes an
    ordered string of event-type initials (signup->s, view->v,
    purchase->p, click->c, error->e; ties broken by event_id), and
    behavioral patterns are regexes over that string — 'signup then
    purchase with no purchase in between', 'signup, views, then
    purchase adjacent', 'three errors ever'. One groupBy(user) with an
    ordered in-group reduction (array_sort on (ts, event_id, initial)
    structs — collect order never matters), then pure string ops. The
    per-user string is bounded by that user's event count, the same
    state bound every sessionization operator here carries."""
    ev = t(spark, sf_dir, "events").select(
        "user_id",
        F.struct(
            F.col("ts"),
            F.col("event_id"),
            F.substring("event_type", 1, 1).alias("init"),
        ).alias("rec"),
    )
    seqs = ev.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list("rec")), lambda r: r["init"]
            ),
            "",
        ).alias("seq")
    )
    return seqs.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum(F.col("seq").rlike("s[^p]*p").cast("long")).alias(
            "n_direct_convert"
        ),
        F.sum(F.col("seq").rlike("sv+p").cast("long")).alias(
            "n_browse_convert"
        ),
        F.sum(F.col("seq").rlike("e.*e.*e").cast("long")).alias(
            "n_error_prone"
        ),
        F.round(F.avg(F.length("seq")), 4).alias("avg_events_per_user"),
    )


@query(
    "debounce_events",
    oracle="""
    WITH g AS (
      SELECT event_type,
        epoch_us(ts) - epoch_us(LAG(ts) OVER (
          PARTITION BY user_id, event_type ORDER BY ts, event_id))
          AS gap_us
      FROM events
    )
    SELECT event_type,
      CAST(COUNT(*) AS BIGINT) AS n_events,
      CAST(SUM(CASE WHEN gap_us IS NULL OR gap_us > 600000000
               THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
      CAST(SUM(CASE WHEN gap_us IS NOT NULL AND gap_us <= 600000000
               THEN 1 ELSE 0 END) AS BIGINT) AS n_debounced
    FROM g GROUP BY event_type
    """,
)
def debounce_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Debounce / bounce-filter: an event is suppressed when the SAME
    (user, type) fired within the preceding 10 minutes — the classic
    duplicate-click / retry-storm cleaner in front of a metrics
    pipeline. One lag window per (user, type); the gap compares in
    exact integer microseconds (never float seconds — the same rule
    join_interval_bucketed and the sessionizer follow), so the
    10-minute boundary can't flip between engines. The batch twin of
    streaming's dropDuplicatesWithinWatermark, with a full value
    oracle where the streaming variant is rows-only."""
    w = Window.partitionBy("user_id", "event_type").orderBy(
        "ts", "event_id"
    )
    gap = F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
    g = t(spark, sf_dir, "events").select(
        "event_type", gap.alias("gap_us")
    )
    kept = F.col("gap_us").isNull() | (F.col("gap_us") > 600_000_000)
    return g.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(kept.cast("long")).alias("n_kept"),
        F.sum((~kept).cast("long")).alias("n_debounced"),
    )
