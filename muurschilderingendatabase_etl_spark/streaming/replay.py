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

import atexit
import contextlib
import os
import shutil
import tempfile

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


_STAGED: dict[tuple[str, str], str] = {}
# Bytes of every staged stream-source directory, keyed by its path (set
# by read_events_stream / stage_events_two_phase): sizes the state-store
# partition default below. Keyed by PATH, not "most recently staged" —
# a last-staged global picks the wrong size when staging calls
# interleave with query execution (r10 ADVICE): source_bytes_of()
# resolves the size of the source actually feeding a given stream by
# matching these paths against its analyzed plan.
_STAGED_BYTES: dict[str, int] = {}


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total


def source_bytes_of(stream_df: DataFrame) -> int:
    """Bytes of the staged source(s) feeding ``stream_df``, resolved by
    matching the staged directory paths against the stream's ANALYZED
    plan — so the state-store sizing below follows the stream actually
    being run, not whichever source happened to be staged last (r10
    ADVICE: a last-staged module global mis-sizes interleaved stagings).

    Falls back to the largest staged source this session when no staged
    path appears in the plan (e.g. a rate source): conservative — more
    state partitions, never fewer than the floor."""
    try:
        plan = stream_df._jdf.queryExecution().analyzed().toString()
    except Exception:
        plan = ""
    total = sum(b for path, b in _STAGED_BYTES.items() if path in plan)
    if total:
        return total
    return max(_STAGED_BYTES.values(), default=0)


@contextlib.contextmanager
def stream_state_partitions(
    spark: SparkSession,
    n: int | None = None,
    *,
    source_bytes: int | None = None,
):
    """Temporarily size `spark.sql.shuffle.partitions` for a streaming
    query start.

    The stateful-operator partition count is LOCKED INTO THE CHECKPOINT
    when a streaming query first starts, so it must be sized to the
    query's state cardinality, not inherited from the batch default: each
    state partition is a state-store instance with per-micro-batch
    open/commit/snapshot overhead, which dominates when per-key state is
    small (measured on the stream-stream joins: 32 -> 8 partitions cut
    wall time from 8.0 s to 3.5 s at sf0.1 in r10; the r12 re-measure
    under the parquet replay sink found 8 -> 4 saves a further ~0.3-0.6 s
    per stream across three stateful shapes — tumbling agg 1.65 -> 1.21,
    stream-stream join 3.3 -> 2.7, session window 1.7 -> 1.25 warm —
    while 4 -> 2 is flat, so 4 is the new floor). At 100 TB scale this
    knob goes UP with keyspace — the default scales with the bytes of the
    stream's staged source (~one state partition per 64 MB): at sf100
    (1.9 GB events) that is the difference between a few fat
    single-threaded state stores and one per core. The core-count cap
    DOMINATES the floor (``min(cores, max(4, ...))``): on a small machine
    the count never exceeds the available parallelism — DELIBERATE (r11
    ADVICE confirmed): fewer cores than the floor means the extra state
    stores would just time-slice, and the floor figure was measured on
    the 32-core bench host, which all BASELINE/BENCH numbers assume.
    Pass ``source_bytes``
    (see ``source_bytes_of``) to size for a specific stream; override
    everything via SPARK_GRAFT_STREAM_STATE_PARTITIONS.
    """
    if n is None:
        env = os.environ.get("SPARK_GRAFT_STREAM_STATE_PARTITIONS")
        if env is not None:
            n = int(env)
        else:
            if source_bytes is None:
                source_bytes = max(_STAGED_BYTES.values(), default=0)
            cores = spark.sparkContext.defaultParallelism
            n = min(cores, max(4, source_bytes // (64 << 20)))
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream the events table: Spark's file stream source requires a
    directory, so stage the events parquet into a session-scoped temp
    dir once per sf_dir, then readStream from it.

    Staging is a SYMLINK of the raw fixture file (r13): the r12 shape
    rewrote the timestamp-normalized table through a full Spark write
    (~3.2 s at sf0.1, paid by the first streaming query of every
    session), but the only thing the rewrite added was the ts
    conversion — which is a per-row expression that belongs ON the
    stream (exactly what tables.t applies to the batch frame). A file
    appearing in the watched directory is the file-drop contract
    itself; the source follows the link and reads the same bytes.
    Falls back to the staged write when symlinks are unavailable or
    the fixture is already a directory dataset."""
    key = (spark.sparkContext.applicationId, sf_dir)
    staged = _STAGED.get(key)
    if staged is None:
        staged = tempfile.mkdtemp(prefix="msdb_events_stage_")
        # session-scoped reuse, deleted at interpreter exit (the staged
        # write era measured 184 MB per sf_dir at sf10; a symlink dir
        # is bytes, but the same lifetime discipline applies)
        atexit.register(shutil.rmtree, staged, ignore_errors=True)
        src = os.path.abspath(os.path.join(sf_dir, "events.parquet"))
        try:
            if os.path.isdir(src):
                raise OSError("directory dataset — stage a real copy")
            os.symlink(src, os.path.join(staged, "events.parquet"))
        except OSError:
            from muurschilderingendatabase_etl_spark.tables import t

            t(spark, sf_dir, "events").write.mode("overwrite").parquet(staged)
        _STAGED[key] = staged
    _STAGED_BYTES[staged] = _dir_bytes(staged)
    # Raw fixture ts is TIMESTAMP(NANOS) (read as int64 via the legacy
    # conf) or TIMESTAMP_NTZ depending on fixture era; normalize on the
    # stream with the SAME conversions tables.t applies to the batch
    # frame, so stream and batch frames agree bit-for-bit.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(staged).schema
    stream = spark.readStream.schema(schema).parquet(staged)
    ts_type = dict(stream.dtypes).get("ts")
    if ts_type == "bigint":
        stream = stream.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000"))
        )
    elif ts_type == "timestamp_ntz":
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return stream


def batch_sink(outdir: str):
    """foreachBatch sink: each micro-batch lands in its own ``batch-<id>``
    subdirectory of ``outdir`` with mode=overwrite. Redelivering a batch
    (foreachBatch is at-least-once) rewrites that batch's directory with
    the same rows instead of appending duplicates — idempotent by
    construction. Module-level (not a closure inside run_to_memory) so
    tests can exercise the redelivery path directly."""

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        # zero-padded so lexicographic subdir order == batch order
        batch_df.write.mode("overwrite").parquet(
            os.path.join(outdir, f"batch-{batch_id:09d}")
        )

    return _sink


def read_sink(
    spark: SparkSession, outdir: str, output_mode: str, schema
) -> DataFrame:
    """Read back what ``batch_sink`` wrote, reproducing the memory sink's
    contents: complete mode re-emits the full state each batch (memory
    sink REPLACES) -> last batch only; append/update emit deltas (memory
    sink ACCUMULATES) -> union of all batches."""
    batch_dirs = sorted(d for d in os.listdir(outdir) if d.startswith("batch-"))
    if not batch_dirs:
        # No batch ever emitted (empty source / everything late): parquet
        # can't infer a schema from an empty dir — empty frame with the
        # stream's schema instead.
        return spark.createDataFrame([], schema)
    if output_mode == "complete":
        batch_dirs = batch_dirs[-1:]
    return spark.read.parquet(*(os.path.join(outdir, d) for d in batch_dirs))


def run_to_memory(result: DataFrame, output_mode: str = "complete") -> DataFrame:
    """Execute a streaming DataFrame to completion and return the
    materialized result as a batch DataFrame.

    Sink: foreachBatch -> parquet, NOT format("memory"). The memory sink
    buffers every emitted row as JVM objects in the driver-side
    ArrayBuffer (plus a full clone at commit) — at sf100 the
    session-window replay's ~30M-row result OOMed a 48 GB heap inside
    MemoryDataWriter.commit (r10 mid-tier sweep). foreachBatch keeps the
    write DISTRIBUTED and disk-backed at any scale while reproducing the
    memory sink's contents exactly under availableNow replay:

    - complete mode re-emits the FULL state every micro-batch and the
      memory sink replaces its contents -> only the LAST batch is read
      back (the final state);
    - append/update emit deltas and the memory sink accumulates -> the
      union of all batches is read back.

    Each micro-batch writes to its own ``batch-<id>`` subdirectory with
    mode=overwrite, which makes the sink IDEMPOTENT under foreachBatch's
    at-least-once contract (r10 VERDICT item 2): a batch redelivered
    after a partial write rewrites ITS OWN directory instead of
    appending duplicate rows — the memory sink's once-per-batch
    semantics (latestBatchId dedup) preserved by construction.
    """
    spark = result.sparkSession
    ckpt = tempfile.mkdtemp(prefix="msdb_ckpt_")
    # The returned DataFrame reads from this dir lazily, so it must
    # outlive the call — session-scoped like the staging dirs (removed at
    # interpreter exit), NOT per-run like the checkpoint.
    outdir = tempfile.mkdtemp(prefix="msdb_sink_")
    atexit.register(shutil.rmtree, outdir, ignore_errors=True)
    try:
        with stream_state_partitions(
            spark, source_bytes=source_bytes_of(result)
        ):
            query = (
                result.writeStream.foreachBatch(batch_sink(outdir))
                .outputMode(output_mode)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            query.awaitTermination()
    finally:
        # The checkpoint exists only for THIS availableNow run — the
        # parquet sink holds the materialized rows once the query
        # terminates, so the state-store snapshots are dead weight.
        # Without this a long-lived session (bench: 13 streaming
        # queries per run; the round driver: hundreds) leaks one
        # checkpoint dir per execution — measured 318 MB each at sf10.
        # A RESUMABLE production stream keeps its checkpoint; this
        # helper is by contract a run-to-completion replay.
        shutil.rmtree(ckpt, ignore_errors=True)
    return read_sink(spark, outdir, output_mode, result.schema)


_STAGED2: dict[tuple[str, str], tuple[str, str]] = {}


def stage_events_two_phase(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Stage events as a bulk file (in the stream source dir) plus a
    stragglers file (parked OUTSIDE it, to be dropped in between two
    availableNow runs):

    - bulk: events with ts <= max(ts) - 2 days, except a deterministic
      sample (event_id % 50 == 0) withheld;
    - stragglers: the withheld OLD rows (genuinely late once the first
      run's watermark is persisted) plus the final 2 days.

    Returns (source_dir, parked_stragglers_path).
    """
    import os

    from muurschilderingendatabase_etl_spark.tables import t

    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _STAGED2:
        staged = tempfile.mkdtemp(prefix="msdb_events_2phase_")
        atexit.register(shutil.rmtree, staged, ignore_errors=True)
        srcdir = os.path.join(staged, "source")
        os.makedirs(srcdir)
        ev = t(spark, sf_dir, "events")
        split = ev.selectExpr(
            "max(ts) - INTERVAL 2 DAYS AS tsplit"
        ).collect()[0]["tsplit"]
        # ONE pass splits both phases (r13, guide §1.2): the r12 shape
        # ran two filtered coalesce(1) writes — two full scans of the
        # events pipeline for complementary predicates. A partitioned
        # write of the phase flag emits both files from a single
        # coalesce(1) task (no shuffle; partitionBy drops the flag
        # column, so file schemas are unchanged). Row order within a
        # file is irrelevant downstream: the consumer aggregates
        # windowed counts and the per-run watermark is a batch-level
        # max. Staging cost 4.3 s → 3.3 s cold at sf0.1 (the remaining
        # cost is the split collect's first events scan + the write).
        is_straggler = (F.col("ts") > F.lit(split)) | (
            F.col("event_id") % 50 == 0
        )
        stage = staged + "/stage"
        (
            ev.withColumn(
                "phase", F.when(is_straggler, "b").otherwise("a")
            )
            .coalesce(1)
            .write.mode("overwrite")
            .partitionBy("phase")
            .parquet(stage)
        )

        def _one_part(phase: str) -> str:
            d = f"{stage}/phase={phase}"
            if not os.path.isdir(d):
                # a phase with zero rows (empty fixture) writes no dir;
                # materialize an empty file with the events schema so
                # both paths always exist
                ev.limit(0).coalesce(1).write.mode("overwrite").parquet(d)
            return os.path.join(
                d, next(p for p in os.listdir(d) if p.endswith(".parquet"))
            )

        os.rename(_one_part("a"), f"{srcdir}/a_bulk.parquet")
        parked = f"{staged}/b_stragglers.parquet"
        os.rename(_one_part("b"), parked)
        _STAGED2[key] = (srcdir, parked)
    _STAGED_BYTES[_STAGED2[key][0]] = _dir_bytes(_STAGED2[key][0])
    return _STAGED2[key]
