"""Window functions (SURVEY.md §2.3 'Window fns').

rank/dense_rank/row_number, lag/lead, running aggregates, explicit frame
specifications.

Scale notes: each window is ONE shuffle on its partition key followed by a
per-partition sort. All orderings carry a unique tiebreak column so
row_number/lag results are deterministic and oracle-comparable. Windows
partitioned by a high-cardinality key (customer, user) scale linearly;
there is deliberately no unpartitioned global window in the hot set (that
would serialize onto one task at 100 TB).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from muurschilderingendatabase_etl_spark.registry import query
from muurschilderingendatabase_etl_spark.tables import t


@query(
    "window_topk_per_group",
    oracle="""
    SELECT c_custkey, o_orderkey, o_totalprice AS totalprice, rn
    FROM (
      SELECT c_custkey, o_orderkey, o_totalprice,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY c_custkey
               ORDER BY o_totalprice DESC, o_orderkey
             ) AS BIGINT) AS rn
      FROM customer JOIN orders ON c_custkey = o_custkey
    ) WHERE rn <= 3
    """,
)
def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Top-k per group: window + filter, the scalable alternative to a
    # global sort (shuffle on group key only, k rows retained per group).
    joined = t(spark, sf_dir, "customer").join(
        t(spark, sf_dir, "orders"), F.col("c_custkey") == F.col("o_custkey")
    )
    w = Window.partitionBy("c_custkey").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return (
        joined.withColumn("rn", F.row_number().over(w).cast("long"))
        .where(F.col("rn") <= 3)
        .select("c_custkey", "o_orderkey", F.col("o_totalprice").alias("totalprice"), "rn")
    )


@query(
    "window_rank_dense_rank",
    oracle="""
    SELECT n_name, s_suppkey,
           CAST(RANK()       OVER (PARTITION BY n_name ORDER BY s_acctbal DESC) AS BIGINT) AS bal_rank,
           CAST(DENSE_RANK() OVER (PARTITION BY n_name ORDER BY s_acctbal DESC) AS BIGINT) AS bal_dense_rank
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    """,
)
def window_rank_dense_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    joined = t(spark, sf_dir, "supplier").join(
        F.broadcast(t(spark, sf_dir, "nation")), F.col("s_nationkey") == F.col("n_nationkey")
    )
    w = Window.partitionBy("n_name").orderBy(F.desc("s_acctbal"))
    return joined.select(
        "n_name",
        "s_suppkey",
        F.rank().over(w).cast("long").alias("bal_rank"),
        F.dense_rank().over(w).cast("long").alias("bal_dense_rank"),
    )


@query(
    "window_lag_lead",
    oracle="""
    SELECT user_id, event_id,
           value,
           value - LAG(value) OVER w AS delta_prev,
           LEAD(value) OVER w        AS next_value
    FROM events
    WHERE event_type = 'purchase'
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        t(spark, sf_dir, "events")
        .where(F.col("event_type") == "purchase")
        .select(
            "user_id",
            "event_id",
            "value",
            (F.col("value") - F.lag("value").over(w)).alias("delta_prev"),
            F.lead("value").over(w).alias("next_value"),
        )
    )


@query(
    "window_running_sum",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ), 2) AS DOUBLE) AS running_spend
    FROM orders
    """,
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The running sum accumulates integer cents (queries/money.py): a
    # double accumulator would round each prefix independently, and any
    # prefix landing near a cent boundary flips — the same class as the
    # grouped money sums, amplified by emitting EVERY prefix.
    from muurschilderingendatabase_etl_spark.queries import money

    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    running_cents = F.sum(
        money.cents(F.col("o_totalprice")).cast("decimal(20,0)")
    ).over(w)
    return t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.round(running_cents / 100, 2).cast("double").alias("running_spend"),
    )


@query(
    "window_moving_avg_frame",
    oracle="""
    SELECT user_id, event_id,
           ROUND(AVG(value) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
           ), 4) AS moving_avg3
    FROM events
    """,
)
def window_moving_avg_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Explicit bounded frame: 3-row trailing average per user.
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-2, Window.currentRow)
    )
    return t(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.round(F.avg("value").over(w), 4).alias("moving_avg3"),
    )


@query(
    "window_share_of_group",
    oracle="""
    SELECT n_name, c_custkey,
           ROUND(c_acctbal / SUM(c_acctbal) OVER (PARTITION BY n_name), 6) AS bal_share
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    """,
)
def window_share_of_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Unordered analytic window (whole-partition aggregate as a column).
    joined = t(spark, sf_dir, "customer").join(
        F.broadcast(t(spark, sf_dir, "nation")), F.col("c_nationkey") == F.col("n_nationkey")
    )
    w = Window.partitionBy("n_name")
    return joined.select(
        "n_name",
        "c_custkey",
        F.round(F.col("c_acctbal") / F.sum("c_acctbal").over(w), 6).alias("bal_share"),
    )


@query(
    "window_rank_distribution",
    oracle="""
    SELECT o_orderkey,
           o_orderpriority,
           CAST(ntile(4) OVER w AS INT)            AS quartile,
           ROUND(percent_rank() OVER w, 6)         AS pct_rank,
           ROUND(cume_dist() OVER w, 6)            AS cdist
    FROM orders
    WHERE o_custkey < 200
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
    """,
)
def window_rank_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions: ntile / percent_rank / cume_dist
    over a price ordering per priority class."""
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return (
        t(spark, sf_dir, "orders")
        .where(F.col("o_custkey") < 200)
        .select(
            "o_orderkey",
            "o_orderpriority",
            F.ntile(4).over(w).alias("quartile"),
            F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
            F.round(F.cume_dist().over(w), 6).alias("cdist"),
        )
    )


@query(
    "window_first_last_nth",
    oracle="""
    SELECT o_orderkey, o_custkey,
           ROUND(first_value(o_totalprice) OVER w, 2) AS cheapest,
           ROUND(last_value(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ), 2) AS priciest,
           ROUND(nth_value(o_totalprice, 2) OVER w, 2) AS second_cheapest
    FROM orders
    WHERE o_custkey < 200
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def window_first_last_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last/nth_value with an explicit unbounded frame (the default
    frame would make last_value degenerate to the current row)."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_totalprice", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        t(spark, sf_dir, "orders")
        .where(F.col("o_custkey") < 200)
        .select(
            "o_orderkey",
            "o_custkey",
            F.round(F.first("o_totalprice").over(w), 2).alias("cheapest"),
            F.round(F.last("o_totalprice").over(w), 2).alias("priciest"),
            F.round(F.nth_value("o_totalprice", 2).over(w), 2).alias(
                "second_cheapest"
            ),
        )
    )


@query(
    "window_range_frame",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice AS totalprice,
           CAST(COUNT(*) OVER (
             PARTITION BY o_custkey ORDER BY o_totalprice
             RANGE BETWEEN 1000 PRECEDING AND 1000 FOLLOWING
           ) AS BIGINT) AS n_similar_priced
    FROM orders
    WHERE o_custkey < 200
    """,
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame (value-based, not row-based): count of the customer's
    orders within ±1000 of each order's price."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_totalprice")
        .rangeBetween(-1000, 1000)
    )
    return (
        t(spark, sf_dir, "orders")
        .where(F.col("o_custkey") < 200)
        .select(
            "o_orderkey",
            "o_custkey",
            F.col("o_totalprice").alias("totalprice"),
            F.count(F.lit(1)).over(w).alias("n_similar_priced"),
        )
    )


@query(
    "window_sessionize_gaps",
    oracle="""
    WITH marked AS (
      SELECT user_id, event_id, ts,
        CASE WHEN ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
                  OR LAG(ts) OVER w IS NULL
             THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessions AS (
      SELECT user_id, ts,
        SUM(new_session) OVER (
          PARTITION BY user_id ORDER BY ts, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
        ) AS session_no
      FROM marked
    )
    SELECT CAST(n_events AS BIGINT) AS n_events,
           CAST(COUNT(*) AS BIGINT) AS n_sessions
    FROM (
      SELECT user_id, session_no, COUNT(*) AS n_events
      FROM sessions GROUP BY user_id, session_no
    )
    GROUP BY n_events
    ORDER BY n_events
    """,
)
def window_sessionize_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization: lag-gap marking + running sum assigns
    session ids without a session-window operator — the standard batch
    twin of streaming session_window (streaming_windows.py). Output is
    the session-size histogram.

    Scale shape: ONE shuffle on user_id serves both window passes (same
    partitioning, Catalyst reuses the sort), then two partial-agg
    shuffles on shrinking data. Deterministic tie-break (ts, event_id)
    keeps the lag reproducible."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wrun = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ev = t(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    marked = ev.withColumn(
        "new_session",
        F.when(
            F.lag("ts").over(w).isNull()
            # Exact integer-microsecond gap: a double cast (epoch ~1.7e9 s)
            # can round at the precise 1800 s boundary and flip a split vs
            # the oracle's exact INTERVAL comparison. The cast handles ts
            # arriving as TIMESTAMP_NTZ (unix_micros wants LTZ; session TZ
            # is UTC so the cast is value-preserving).
            | (
                F.unix_micros(F.col("ts").cast("timestamp"))
                - F.unix_micros(F.lag("ts").over(w).cast("timestamp"))
                > 1_800_000_000
            ),
            1,
        ).otherwise(0),
    )
    sessions = marked.withColumn("session_no", F.sum("new_session").over(wrun))
    per_session = sessions.groupBy("user_id", "session_no").agg(
        F.count(F.lit(1)).alias("n_events")
    )
    return (
        per_session.groupBy("n_events")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .orderBy("n_events")
    )


@query(
    "window_ntile_buckets",
    oracle="""
    SELECT CAST(bucket AS BIGINT) AS bucket,
      CAST(COUNT(*) AS BIGINT) AS n_customers,
      ROUND(MIN(c_acctbal), 2) AS min_bal,
      ROUND(MAX(c_acctbal), 2) AS max_bal,
      ROUND(AVG(c_acctbal), 4) AS avg_bal
    FROM (
      SELECT c_acctbal,
        NTILE(10) OVER (ORDER BY c_acctbal, c_custkey) AS bucket
      FROM customer
    )
    GROUP BY bucket
    ORDER BY bucket
    """,
)
def window_ntile_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth decile bucketing with exact NTILE semantics — the
    histogram/binning primitive (both engines hand the remainder rows
    to the first buckets, and the (c_acctbal, c_custkey) tie-break
    makes bucket assignment deterministic).

    Scale shape: NTILE over an un-partitioned window would be a
    single-task global sort; instead the exact global rank comes from
    the two-phase distributed ranker (distributed.
    with_global_row_number) and NTILE(k) is reconstructed
    arithmetically from (rank, total): with base = N div k and
    rem = N mod k the first rem buckets hold base+1 rows — identical
    output to the window ntile (oracle unchanged), no single-partition
    Exchange in the plan (asserted by tests/test_plans.py)."""
    from muurschilderingendatabase_etl_spark.queries.distributed import (
        with_global_row_number,
    )

    ranked = with_global_row_number(
        t(spark, sf_dir, "customer").select("c_custkey", "c_acctbal"),
        [F.col("c_acctbal"), F.col("c_custkey")],
        out_col="rn",
        total_col="_total",
    )
    k = 10
    # NTILE(k) from (rank, total): first rem buckets hold base+1 rows.
    # All arithmetic on columns keeps the plan fully lazy; `/` on longs
    # is double division — exact for counts < 2^53, and the otherwise
    # branch's base=0 case (total < k) is unreachable because pivot
    # then covers every rank (CaseWhen evaluates lazily per row).
    base = F.floor(F.col("_total") / k)
    rem = F.col("_total") % k
    pivot = rem * (base + 1)
    r = F.col("rn")
    bucket = F.when(r <= pivot, (r - 1) / (base + 1)).otherwise(
        rem + (r - pivot - 1) / F.greatest(base, F.lit(1))
    )
    return (
        ranked.withColumn("bucket", F.floor(bucket).cast("long") + 1)
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.min("c_acctbal"), 2).alias("min_bal"),
            F.round(F.max("c_acctbal"), 2).alias("max_bal"),
            F.round(F.avg("c_acctbal"), 4).alias("avg_bal"),
        )
        .orderBy("bucket")
    )


@query(
    "window_rolling_median",
    oracle="""
    SELECT user_id, event_id,
      ROUND(list_sort([value, l1, l2])[2], 4) AS m
    FROM (
      SELECT user_id, event_id, value,
        LAG(value, 1) OVER w AS l1,
        LAG(value, 2) OVER w AS l2
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    WHERE l2 IS NOT NULL
    """,
)
def window_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling exact median over a 3-row trailing frame per user —
    robust-statistics smoothing (outlier-resistant counterpart of
    window_moving_avg_frame), as middle-of-three over lag values
    (Spark disallows ordered frames for the median aggregate; the
    sort-of-3 formulation is pure codegen and engine-portable). Only
    full frames emit. Same single-shuffle shape as every other window
    here."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lagged = t(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "value",
        F.lag("value", 1).over(w).alias("l1"),
        F.lag("value", 2).over(w).alias("l2"),
    )
    mid = F.element_at(F.array_sort(F.array("value", "l1", "l2")), 2)
    return (
        lagged.where(F.col("l2").isNotNull())
        .select("user_id", "event_id", F.round(mid, 4).alias("m"))
    )
