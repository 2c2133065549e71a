"""Structured Streaming operators over the events table (SURVEY.md §2.3
'Streaming'; reference has no streaming — this is north-star surface).

Each query replays the events parquet through ``readStream`` with
``trigger(availableNow=True)`` (streaming/replay.py) and materializes the
result via a memory sink, so the registered callable still returns a batch
DataFrame for the driver to collect. The topology is the production one:
swap the file source for Kafka and the same plan runs continuously.

Oracle notes:
- Tumbling/sliding/session windows are batch-equivalent, so they get full
  SQL oracles (sliding = union of the two 12h-offset bucket assignments;
  session = gaps-and-islands with the same `diff >= gap` boundary rule
  Spark uses for session merging).
- The watermark query IS deterministic under availableNow replay: the
  final no-data micro-batch advances the watermark to max(ts) - delay and
  append mode emits exactly the windows whose end <= watermark. The oracle
  reproduces that cutoff in SQL.
- Window starts are emitted as formatted strings on both sides, dodging
  the Spark-µs vs DuckDB-ns timestamp precision trap.

Scale notes: windowed streaming aggregation state is partitioned by
(group keys) across executors; watermarks bound state size. Session
windows use Spark's built-in session merge (local partial merge before
shuffle). Nothing here holds unbounded state except the two complete-mode
demos, whose production form would carry the same watermark as the append
query.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from muurschilderingendatabase_etl_spark.queries import money
from muurschilderingendatabase_etl_spark.registry import query
from muurschilderingendatabase_etl_spark.streaming.replay import (
    read_events_stream,
    run_to_memory,
)


@query(
    "stream_tumbling_window",
    oracle="""
    SELECT strftime(date_trunc('day', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE)
             AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def stream_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-day tumbling window counts+sums per event_type via readStream."""
    ev = read_events_stream(spark, sf_dir)
    win = (
        ev.groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            money.sum_money(F.col("value")).alias("total_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )
    return run_to_memory(win, "complete")


@query(
    "stream_sliding_window",
    oracle="""
    WITH assigned AS (
      SELECT time_bucket(INTERVAL 12 HOUR, ts) - k * INTERVAL 12 HOUR AS ws,
             event_type, value
      FROM events CROSS JOIN (VALUES (0), (1)) offs(k)
    )
    SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE)
             AS total_value
    FROM assigned
    GROUP BY 1, 2
    """,
)
def stream_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-day windows sliding every 12h: each event lands in 2 windows."""
    ev = read_events_stream(spark, sf_dir)
    win = (
        ev.groupBy(F.window("ts", "1 day", "12 hours").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            money.sum_money(F.col("value")).alias("total_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )
    return run_to_memory(win, "complete")


@query(
    "stream_session_window",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                       OR ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                          >= INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ),
    sessions AS (
      SELECT user_id, ts, value,
             SUM(new_session) OVER (
               PARTITION BY user_id ORDER BY ts
               ROWS UNBOUNDED PRECEDING
             ) AS session_id
      FROM flagged
    )
    SELECT user_id,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE)
             AS total_value
    FROM sessions
    GROUP BY user_id, session_id
    """,
)
def stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30-min-gap session windows per user (Spark session_window merge:
    same session while next.ts < prev.ts + gap, i.e. new when diff >= gap —
    the oracle's islands condition mirrors that exactly)."""
    ev = read_events_stream(spark, sf_dir)
    win = (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # bounded variant: one state row PER SESSION (9.5M at sf10)
            # makes decimal state 2x heap vs the 8-byte long cents
            money.sum_money_bounded(F.col("value")).alias("total_value"),
        )
        .select(
            "user_id",
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
                "session_start"
            ),
            "n_events",
            "total_value",
        )
    )
    return run_to_memory(win, "complete")


@query(
    "stream_watermark_append",
    oracle="""
    WITH wm AS (SELECT MAX(ts) - INTERVAL 1 HOUR AS w FROM events)
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM events, wm
    WHERE date_trunc('hour', ts) + INTERVAL 1 HOUR <= wm.w
    GROUP BY 1
    """,
)
def stream_watermark_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked hourly windows in append mode: only windows finalized
    by the end-of-replay watermark (max event time - 1h) are emitted —
    the oracle reproduces that cutoff."""
    ev = read_events_stream(spark, sf_dir).withWatermark("ts", "1 hour")
    win = (
        ev.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "n_events",
        )
    )
    return run_to_memory(win, "append")


@query(
    "stream_dedup_stateful",
    oracle="SELECT DISTINCT user_id, event_type FROM events",
)
def stream_dedup_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful streaming dedup on (user_id, event_type) — first arrival
    wins; state partitioned by key across executors."""
    ev = read_events_stream(spark, sf_dir)
    deduped = ev.select("user_id", "event_type").dropDuplicates(
        ["user_id", "event_type"]
    )
    return run_to_memory(deduped, "append")


@query(
    "stream_dedup_within_watermark",
    oracle="SELECT DISTINCT user_id, event_type FROM events",
)
def stream_dedup_within_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dropDuplicatesWithinWatermark: like stateful dedup but state for a
    key expires once the watermark passes its event time + delay — bounded
    state at 100 TB. Single-batch replay never expires state mid-stream,
    so the result equals plain DISTINCT deterministically."""
    ev = read_events_stream(spark, sf_dir).withWatermark("ts", "1 hour")
    deduped = ev.select("ts", "user_id", "event_type").dropDuplicatesWithinWatermark(
        ["user_id", "event_type"]
    ).select("user_id", "event_type")
    return run_to_memory(deduped, "append")


@query(
    "stream_static_join",
    oracle="""
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE)
             AS total_value
    FROM events JOIN customer ON user_id = c_custkey
    GROUP BY c_mktsegment
    """,
)
def stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join: each micro-batch joins against the (batch)
    customer dim — the standard streaming enrichment topology. The dim
    side is broadcast; no stream-side shuffle for the join."""
    from muurschilderingendatabase_etl_spark.tables import t

    ev = read_events_stream(spark, sf_dir)
    dim = t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    joined = ev.join(F.broadcast(dim), ev.user_id == dim.c_custkey)
    agg = joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_events"),
        money.sum_money(F.col("value")).alias("total_value"),
    )
    return run_to_memory(agg, "complete")


@query(
    "stream_stateful_user_stats",
    oracle="""
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE)
             AS total_value,
           CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types
    FROM events
    GROUP BY user_id
    """,
)
def stream_stateful_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator via applyInPandasWithState:
    per-user running stats carried in GroupState across micro-batches
    (count, sum, distinct-type set), emitted on stream end. The state
    value is a bounded summary — not the rows — so state size is
    O(users), the 100-TB-safe shape. Deterministic under availableNow
    replay, hence oracle-checkable."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    ev = read_events_stream(spark, sf_dir).select("user_id", "event_type", "value")

    def update(key, pdfs, state: GroupState):
        # State carries INTEGER CENTS (queries/money.py class): a double
        # running total would make the emitted value depend on batch
        # arrival order; cents accumulate exactly in int64.
        n, total_cents, types = (
            state.get if state.exists else (0, 0, "")
        )
        seen = set(types.split("|")) - {""}
        for pdf in pdfs:
            n += len(pdf)
            v = pdf["value"].dropna().to_numpy()
            total_cents += int(np.rint(v * 100).astype("int64").sum())
            # dropna: a NULL event_type is countable but not a type —
            # and None poisons the sorted() in the state encoding.
            seen |= set(pdf["event_type"].dropna())
        state.update((n, total_cents, "|".join(sorted(seen))))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [total_cents / 100.0],
                "n_types": [len(seen)],
            }
        )

    out = ev.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id long, n_events long, total_value double, n_types long",
        stateStructType="n long, total_cents long, types string",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    # Update mode re-emits a user's row each batch it appears in; the
    # single-batch availableNow replay emits exactly one row per user.
    return run_to_memory(out, "update")


@query(
    "stream_late_data_drop",
    oracle="""
    WITH params AS (SELECT max(ts) - INTERVAL 2 DAY AS tsplit FROM events),
    tagged AS (
      SELECT ts,
             CASE WHEN ts <= (SELECT tsplit FROM params)
                       AND event_id % 50 != 0
                  THEN 1 ELSE 2 END AS f
      FROM events
    ),
    w1 AS (SELECT max(ts) - INTERVAL 1 HOUR AS w FROM tagged WHERE f = 1),
    w2 AS (SELECT max(ts) - INTERVAL 1 HOUR AS w FROM tagged),
    counted AS (
      SELECT date_trunc('hour', ts) AS ws,
             count(*) FILTER (
               f = 1
               OR date_trunc('hour', ts) + INTERVAL 1 HOUR > (SELECT w FROM w1)
             ) AS n
      FROM tagged
      GROUP BY 1
    )
    SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
           CAST(n AS BIGINT) AS n_events
    FROM counted
    WHERE ws + INTERVAL 1 HOUR <= (SELECT w FROM w2) AND n > 0
    """,
)
def stream_late_data_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRUE late-data drop via the incremental-batch-job pattern: two
    availableNow runs sharing one checkpoint. Run 1 processes the bulk
    file and persists its watermark (max bulk ts - 1h); the stragglers
    file then lands in the source dir and run 2 resumes from the
    checkpoint — its genuinely-late rows (window end <= persisted
    watermark) are dropped, stragglers in still-open windows aggregate,
    and run 2's final watermark closes the remaining windows. (A single
    availableNow run can NOT drop anything: it plans every file's offsets
    up front under the initial watermark.) The combined append output of
    both runs is deterministic, and the oracle reproduces the drop rule
    exactly in SQL."""
    import os
    import shutil
    import tempfile

    from muurschilderingendatabase_etl_spark.streaming.replay import (
        source_bytes_of,
        stage_events_two_phase,
        stream_state_partitions,
    )

    from muurschilderingendatabase_etl_spark.queries.scans import _rm_at_exit

    srcdir, parked = stage_events_two_phase(spark, sf_dir)
    # atexit (not eager): the returned frame reads outdir lazily
    work = _rm_at_exit(tempfile.mkdtemp(prefix="msdb_late_"))
    ckpt = os.path.join(work, "ckpt")
    outdir = os.path.join(work, "out")

    def run_once() -> None:
        # parquet sink (not memory): the file sink supports resuming from
        # the shared checkpoint, which is the whole point here.
        schema = spark.read.parquet(f"{srcdir}/a_bulk.parquet").schema
        ev = (
            spark.readStream.schema(schema).parquet(srcdir)
        ).withWatermark("ts", "1 hour")
        win = (
            ev.groupBy(F.window("ts", "1 hour").alias("w"))
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select(
                F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias(
                    "window_start"
                ),
                "n_events",
            )
        )
        with stream_state_partitions(spark, source_bytes=source_bytes_of(win)):
            q = (
                win.writeStream.format("parquet")
                .option("path", outdir)
                .option("checkpointLocation", ckpt)
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()

    run_once()  # bulk only; persists watermark = max(bulk ts) - 1h
    shutil.copy(parked, f"{srcdir}/b_stragglers.parquet")
    try:
        run_once()  # resumes: late stragglers dropped against it
    finally:
        # leave the source dir bulk-only for repeat in-session invocations
        os.remove(f"{srcdir}/b_stragglers.parquet")
    return spark.read.parquet(outdir)


@query(
    "stream_stream_join",
    oracle="""
    SELECT s.user_id,
           strftime(s.ts, '%Y-%m-%d %H:%M:%S.%f') AS signup_ts,
           strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts,
           ROUND(p.value, 2) AS purchase_value
    FROM events s JOIN events p
      ON s.user_id = p.user_id
     AND s.event_type = 'signup' AND p.event_type = 'purchase'
     AND p.ts > s.ts AND p.ts <= s.ts + INTERVAL 1 HOUR
    """,
)
def stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream inner join with an event-time range condition:
    purchases within 1h after a signup by the same user. Both sides carry
    watermarks so the join state is bounded (each side's rows can be
    evicted once the other side's watermark passes the range bound) —
    the 100-TB requirement for any stream-stream join."""
    signups = (
        read_events_stream(spark, sf_dir)
        .withWatermark("ts", "1 hour")
        .where(F.col("event_type") == "signup")
        .select(
            F.col("user_id").alias("s_user"), F.col("ts").alias("s_ts")
        )
    )
    purchases = (
        read_events_stream(spark, sf_dir)
        .withWatermark("ts", "1 hour")
        .where(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
            F.col("value").alias("p_value"),
        )
    )
    joined = signups.join(
        purchases,
        (F.col("s_user") == F.col("p_user"))
        & (F.col("p_ts") > F.col("s_ts"))
        & (F.col("p_ts") <= F.col("s_ts") + F.expr("INTERVAL 1 HOUR")),
    ).select(
        F.col("s_user").alias("user_id"),
        F.date_format("s_ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("signup_ts"),
        F.date_format("p_ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("purchase_ts"),
        F.round("p_value", 2).alias("purchase_value"),
    )
    return run_to_memory(joined, "append")


@query(
    "stream_foreach_batch_sink",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE)
             AS total
    FROM events
    GROUP BY event_type
    """,
)
def stream_foreach_batch_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """foreachBatch sink: each micro-batch lands as parquet via arbitrary
    batch-DataFrame logic — the escape hatch for sinks Spark lacks
    (JDBC upsert, multi-table writes). Result = re-read of everything
    written, aggregated."""
    import shutil
    import tempfile

    from muurschilderingendatabase_etl_spark.queries.scans import _rm_at_exit

    outdir = _rm_at_exit(tempfile.mkdtemp(prefix="msdb_feb_out_"))
    ev = read_events_stream(spark, sf_dir).select("event_type", "value")

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("append").parquet(outdir)

    from muurschilderingendatabase_etl_spark.streaming.replay import (
        source_bytes_of,
        stream_state_partitions,
    )

    ckpt = tempfile.mkdtemp(prefix="msdb_feb_ckpt_")
    try:
        with stream_state_partitions(spark, source_bytes=source_bytes_of(ev)):
            q = (
                ev.writeStream.foreachBatch(write_batch)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
    finally:
        # run-to-completion replay: checkpoint is dead once terminated
        shutil.rmtree(ckpt, ignore_errors=True)
    return (
        spark.read.parquet(outdir)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            money.sum_money(F.col("value")).alias("total"),
        )
    )


@query(
    "stream_transform_with_state",
    oracle="""
    SELECT user_id,
           CAST(COUNT(*) FILTER (event_type = 'purchase') AS BIGINT)
             AS n_purchases,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(18,2)))
                      FILTER (event_type = 'purchase'), 2) AS DOUBLE)
             AS purchase_value,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM events
    GROUP BY user_id
    HAVING COUNT(*) FILTER (event_type = 'purchase') > 0
    """,
)
def stream_transform_with_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 transformWithStateInPandas (the successor API to
    applyInPandasWithState): a StatefulProcessor with a typed ValueState
    per user tracking (purchase count, purchase value, event count);
    only users with purchases emit. State is a fixed-width summary —
    O(users), never O(rows) — and the operator API adds what GroupState
    lacked: multiple named state variables, TTL, and timers, the pieces
    a production 100 TB streaming job needs for state hygiene.
    Deterministic under availableNow replay, hence oracle-checkable.

    Environment gate: the TWS driver worker requires the `protobuf`
    package (its state server speaks protobuf to the JVM); this
    container doesn't ship it, so when the import is unavailable the
    query runs the SAME per-user summary through
    applyInPandasWithState — identical semantics and state shape, so
    the oracle contract holds either way. The TWS path is the one
    exercised wherever protobuf exists. PERMANENT WAIVER (r6;
    re-probed 2026-08-16/r10 — protobuf still absent): package
    installation is out of scope in this build environment and
    protobuf is absent from the image (re-probed 2026-08-18/r13:
    `import google.protobuf` still ModuleNotFoundError), so the true
    TWS path cannot execute here by construction; the gate itself is
    unit-tested, the
    fallback is batch-equivalence-tested, and the single pytest skip
    (tests/test_streaming.py) is the documented cost until the runtime
    image carries protobuf."""
    import importlib.util

    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class PurchaseStats(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "stats", "n_purchases long, purchase_cents long, n_events long"
            )

        def handleInputRows(self, key, rows, timerValues):
            # integer-cents state: see queries/money.py
            n_p, cents, n_e = (
                self._state.get() if self._state.exists() else (0, 0, 0)
            )
            for pdf in rows:
                purchases = pdf[pdf["event_type"] == "purchase"]
                n_p += len(purchases)
                v = purchases["value"].dropna().to_numpy()
                cents += int(np.rint(v * 100).astype("int64").sum())
                n_e += len(pdf)
            self._state.update((n_p, cents, n_e))
            if n_p > 0:
                yield pd.DataFrame(
                    {
                        "user_id": [key[0]],
                        "n_purchases": [n_p],
                        "purchase_value": [cents / 100.0],
                        "n_events": [n_e],
                    }
                )

        def close(self) -> None:
            pass

    ev = read_events_stream(spark, sf_dir).select("user_id", "event_type", "value")
    out_schema = (
        "user_id long, n_purchases long, purchase_value double, n_events long"
    )
    try:
        # find_spec raises for a missing PARENT package ('google'), so
        # probe rather than test for None.
        has_protobuf = importlib.util.find_spec("google.protobuf") is not None
    except ModuleNotFoundError:
        has_protobuf = False
    if has_protobuf:
        out = ev.groupBy("user_id").transformWithStateInPandas(
            PurchaseStats(),
            outputStructType=out_schema,
            outputMode="update",
            timeMode="none",
        )
    else:
        from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

        def update(key, pdfs, state: GroupState):
            # integer-cents state: see queries/money.py
            n_p, cents, n_e = state.get if state.exists else (0, 0, 0)
            for pdf in pdfs:
                purchases = pdf[pdf["event_type"] == "purchase"]
                n_p += len(purchases)
                v = purchases["value"].dropna().to_numpy()
                cents += int(np.rint(v * 100).astype("int64").sum())
                n_e += len(pdf)
            state.update((n_p, cents, n_e))
            if n_p > 0:
                yield pd.DataFrame(
                    {
                        "user_id": [key[0]],
                        "n_purchases": [n_p],
                        "purchase_value": [cents / 100.0],
                        "n_events": [n_e],
                    }
                )

        out = ev.groupBy("user_id").applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType="n_purchases long, purchase_cents long, n_events long",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    # Single-batch availableNow replay -> exactly one row per qualifying
    # user (update mode would re-emit across batches on a live source).
    return run_to_memory(out, "update")


@query(
    "stream_stream_outer_join",
    oracle="""
    WITH m AS (
      SELECT LEAST(
        max(ts) FILTER (event_type = 'signup'),
        max(ts) FILTER (event_type = 'purchase')
      ) - INTERVAL 1 HOUR AS wm
      FROM events
    ),
    matched AS (
      SELECT s.user_id,
             strftime(s.ts, '%Y-%m-%d %H:%M:%S.%f') AS signup_ts,
             strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts,
             ROUND(p.value, 2) AS purchase_value
      FROM events s JOIN events p
        ON s.user_id = p.user_id
       AND s.event_type = 'signup' AND p.event_type = 'purchase'
       AND p.ts > s.ts AND p.ts <= s.ts + INTERVAL 1 HOUR
    ),
    unmatched AS (
      SELECT s.user_id,
             strftime(s.ts, '%Y-%m-%d %H:%M:%S.%f') AS signup_ts,
             CAST(NULL AS VARCHAR) AS purchase_ts,
             CAST(NULL AS DOUBLE) AS purchase_value
      FROM events s
      WHERE s.event_type = 'signup'
        AND NOT EXISTS (
          SELECT 1 FROM events p
          WHERE p.event_type = 'purchase' AND p.user_id = s.user_id
            AND p.ts > s.ts AND p.ts <= s.ts + INTERVAL 1 HOUR
        )
        AND s.ts < (SELECT wm FROM m) - INTERVAL 1 HOUR
    )
    SELECT * FROM matched UNION ALL SELECT * FROM unmatched
    """,
)
def stream_stream_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream LEFT OUTER interval join: signups left-joined to
    purchases within 1h. Outer (null) rows for a signup emit only when
    the watermark proves no future purchase can match; under
    availableNow the final no-data micro-batch advances the watermark
    and flushes exactly that set, and the remainder stays in state —
    bounded on both sides, identical to the inner variant.

    Eviction rule the oracle reproduces (verified empirically at
    sf0.001/sf0.01): Catalyst pushes each side's event_type filter BELOW
    its EventTimeWatermark node, so the global watermark is
    min(max signup ts, max purchase ts) - 1h (delay), and the left
    side's state watermark subtracts the 1h join interval again —
    null rows appear for unmatched signups with
    s_ts < global_wm - 1h."""
    signups = (
        read_events_stream(spark, sf_dir)
        .withWatermark("ts", "1 hour")
        .where(F.col("event_type") == "signup")
        .select(F.col("user_id").alias("s_user"), F.col("ts").alias("s_ts"))
    )
    purchases = (
        read_events_stream(spark, sf_dir)
        .withWatermark("ts", "1 hour")
        .where(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
            F.col("value").alias("p_value"),
        )
    )
    joined = signups.join(
        purchases,
        (F.col("s_user") == F.col("p_user"))
        & (F.col("p_ts") > F.col("s_ts"))
        & (F.col("p_ts") <= F.col("s_ts") + F.expr("INTERVAL 1 HOUR")),
        "left_outer",
    ).select(
        F.col("s_user").alias("user_id"),
        F.date_format("s_ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("signup_ts"),
        F.date_format("p_ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("purchase_ts"),
        F.round("p_value", 2).alias("purchase_value"),
    )
    return run_to_memory(joined, "append")
