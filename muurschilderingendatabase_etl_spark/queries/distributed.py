"""Distributed exact global ranking — the scale-safe replacement for an
unpartitioned ``Window.orderBy`` (which Spark executes as an Exchange
SinglePartition + one-task sort: every row moves to one partition, the
one plan shape that cannot survive a 100× scale-up).

Two-phase ranking (the DataFrame analog of the classic RDD
``sortByKey`` + ``zipWithIndex`` bookkeeping), fully lazy — one job,
no driver-side counts pass:

1. ``repartitionByRange`` on the sort keys gives each partition one
   contiguous key range, with partition id increasing in key order
   (RangePartitioner invariant). The ranged frame is then
   ``localCheckpoint``-ed (lazily) BEFORE the plan forks: both the
   counts branch and the main branch read the same materialized
   partitions, so identical partition assignment is guaranteed by
   construction — it does NOT depend on ``spark.sql.exchange.reuse``
   or on RangePartitioner's boundary sampling being deterministic
   across two executions (r5 ADVICE: with reuse disabled and a
   nondeterministic upstream, two independent exchanges could sample
   different boundaries and silently mis-number rows). The partition
   count is passed explicitly so AQE never re-plans it.
2. Main branch: ``sortWithinPartitions`` + ``monotonically_increasing_
   id`` assign each row ``pid * 2^33 + local_index`` in sort order —
   fully parallel, same stage, no extra shuffle and no global sort.
3. Counts branch: per-partition row counts (≤ num_partitions rows —
   bounded by cluster fan-out, NOT by data size) are coalesced to one
   task and prefix-summed with a window — O(number of partitions)
   bookkeeping, the same bounded single-task segment every distributed
   sort performs, and coalesce(1) satisfies the window's distribution
   requirement so no Exchange SinglePartition is ever planned. The
   offsets come back as a broadcast join.
   global row_number = offset + local_index + 1.

The result is byte-identical to ``row_number() OVER (ORDER BY …)``
provided the sort keys form a TOTAL order (callers append a unique
tiebreaker column), so exact small-SF oracles keep matching while the
plan stays shuffle-parallel end to end (asserted in tests/test_plans
.py::test_global_rank_queries_have_no_single_partition_exchange).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# monotonically_increasing_id() = partition_id * 2^33 + row_index
_MID_PARTITION_SHIFT = 33


def with_global_row_number(
    df: DataFrame,
    order_by: list[Column],
    out_col: str = "rn",
    total_col: Optional[str] = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Add 1-based exact global ``row_number`` over ``order_by``.

    ``order_by`` must be a total order (append a unique tiebreaker).
    When ``total_col`` is given, the total row count is attached as a
    constant column (broadcast single-row join) — consumers like exact
    NTILE need (rank, total) and this keeps the whole plan lazy.
    """
    spark = df.sparkSession
    n_parts = num_partitions or spark.sparkContext.defaultParallelism
    # Lazy localCheckpoint: the range shuffle's output is materialized
    # once (on first action) and BOTH branches below read those stored
    # partitions — partition assignment is provably identical across the
    # fork regardless of exchange-reuse or boundary-sampling behavior.
    base = df.repartitionByRange(n_parts, *order_by).localCheckpoint(eager=False)

    counts = (
        base.select(F.spark_partition_id().alias("_pid"))
        .groupBy("_pid")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    # Prefix-sum the ≤ n_parts count rows in ONE coalesced task — the
    # single-task segment is O(number of partitions), never O(data), the
    # same bounded bookkeeping every distributed sort does. coalesce(1)
    # already satisfies the window's all-tuples requirement, so no
    # Exchange is inserted for it.
    from pyspark.sql import Window

    w_prefix = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    w_all = Window.orderBy("_pid").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    offsets = counts.coalesce(1).select(
        "_pid",
        F.coalesce(F.sum("_c").over(w_prefix), F.lit(0)).alias("_offset"),
        F.sum("_c").over(w_all).alias("_total"),
    )

    local_index = F.col("_mid").bitwiseAND(
        F.lit((1 << _MID_PARTITION_SHIFT) - 1)
    )
    out = (
        base.sortWithinPartitions(*order_by)
        .withColumn("_mid", F.monotonically_increasing_id())
        .withColumn("_pid", F.shiftright("_mid", _MID_PARTITION_SHIFT).cast("int"))
        .join(F.broadcast(offsets), "_pid")
        .withColumn(out_col, F.col("_offset") + local_index + 1)
    )
    if total_col is not None:
        out = out.withColumnRenamed("_total", total_col)
        return out.drop("_pid", "_offset", "_mid")
    return out.drop("_pid", "_offset", "_mid", "_total")
