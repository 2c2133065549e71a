#!/usr/bin/env python
"""Phase-level wall-clock profile of graph_pagerank_fixed at any fixture.

The sf100 residual question (r9 VERDICT item 2) needs the 800-second
wall split into named phases — source scan + distinct, edge cache
build, degree build, and the 8 iterations individually — to tell
whether the super-linear component is the build, the per-iteration
rank shuffle, or the final aggregation. The query function is one lazy
plan by design, so this script re-states the SAME physical recipe with
a timer around each materialization barrier. Keep in sync with
queries/graph.py (shuffle path); this is a probe, not a product path.

Usage: python scripts/pagerank_profile.py SF_DIR
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F
from pyspark.storagelevel import StorageLevel

from muurschilderingendatabase_etl_spark.queries.graph import (
    DAMPING,
    N_ITER,
    PART_OFFSET,
)
from muurschilderingendatabase_etl_spark.session import get_spark
from muurschilderingendatabase_etl_spark.tables import t


def main() -> None:
    if len(sys.argv) != 2 or not os.path.isdir(sys.argv[1]):
        sys.exit("usage: python scripts/pagerank_profile.py SF_DIR")
    sf_dir = sys.argv[1]
    spark = get_spark(app_name="pagerank-profile")
    spark.sparkContext.setLogLevel("ERROR")
    phases: dict[str, float] = {}

    def mark(name: str, t0: float) -> float:
        now = time.perf_counter()
        phases[name] = round(now - t0, 2)
        print(f"{name:28s} {phases[name]:8.2f}s", flush=True)
        return now

    t0 = time.perf_counter()
    src_li = t(spark, sf_dir, "lineitem")
    n_li = src_li.count()
    t0 = mark("metadata_count", t0)

    pairs = src_li.select(
        F.col("l_suppkey").alias("s"),
        (F.col("l_partkey") + PART_OFFSET).alias("p"),
    ).distinct()
    edges = pairs.selectExpr("s AS src", "p AS dst").union(
        pairs.selectExpr("p AS src", "s AS dst")
    )
    par = spark.sparkContext.defaultParallelism
    est_edge_bytes = 2 * n_li * 16
    e_par = max(par, est_edge_bytes // (128 << 20) + 1)
    e = (
        edges.repartition(e_par, "dst")
        .sortWithinPartitions("dst")
        .persist(StorageLevel.DISK_ONLY)
    )
    e.count()
    t0 = mark("edge_cache_build", t0)

    degN = (
        e.groupBy("src")
        .agg(F.count(F.lit(1)).alias("deg"))
        .sortWithinPartitions("src")
        .persist(StorageLevel.DISK_ONLY)
    )
    n_nodes = float(degN.count())
    t0 = mark("degree_build", t0)
    print(f"  n_li={n_li} e_par={e_par} n_nodes={int(n_nodes)}", flush=True)

    ranks = degN.select(
        F.col("src").alias("node"), F.lit(1.0 / n_nodes).alias("pr")
    )
    for i in range(1, N_ITER + 1):
        scaled = ranks.join(degN, ranks.node == degN.src).select(
            "node", (F.col("pr") / F.col("deg")).alias("prd")
        )
        # Split the iteration into its two halves: the node-cardinality
        # scale join + broadcast build (checkpointed so its cost is
        # observable), then the edge-cardinality probe + exchange-free
        # aggregation.
        scaled = scaled.localCheckpoint()
        t0 = mark(f"iteration_{i}_scale_join", t0)
        contrib = (
            e.join(F.broadcast(scaled), e.src == scaled.node)
            .groupBy("dst")
            .agg(F.sum(F.col("prd")).alias("c"))
        )
        ranks = contrib.select(
            F.col("dst").alias("node"),
            (F.lit((1 - DAMPING) / n_nodes) + F.lit(DAMPING) * F.col("c")).alias(
                "pr"
            ),
        ).localCheckpoint()
        t0 = mark(f"iteration_{i}_probe_agg", t0)

    out = ranks.select("node", F.round("pr", 6).alias("pr"))
    out.write.format("noop").mode("overwrite").save()
    mark("final_round_write", t0)
    phases["total"] = round(sum(phases.values()), 2)
    print(json.dumps(phases, indent=1))


if __name__ == "__main__":
    main()
