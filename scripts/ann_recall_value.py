#!/usr/bin/env python
"""Measured recall@5 (the VALUE, not just the floor boolean) for both
ANN indexes at an arbitrary fixture dir.

The registered queries emit an in-band `floor_met` boolean so the
driver can hash-compare it; the scale program (SCALE.md) additionally
wants the measured number at each probed decade (200k vectors at sf10,
2M at sf100) so the nprobe/table-count curves stay anchored to data.

Usage: python scripts/ann_recall_value.py SF_DIR [lsh|ivf ...]
Prints one line per index: name, n_vectors, recall@5, wall seconds.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F


def main() -> None:
    # Validate BEFORE any Spark work: a missing SF_DIR or a typo'd index
    # name should fail with usage here, not with a bare IndexError /
    # KeyError after the expensive brute-force pass already ran.
    usage = "usage: python scripts/ann_recall_value.py SF_DIR [lsh|ivf ...]"
    if len(sys.argv) < 2 or not os.path.isdir(sys.argv[1]):
        sys.exit(f"{usage}\n  SF_DIR must be an existing fixture directory")
    sf_dir = sys.argv[1]
    which = sys.argv[2:] or ["lsh", "ivf"]
    bad = [w for w in which if w not in ("lsh", "ivf")]
    if bad:
        sys.exit(f"{usage}\n  unknown index name(s): {', '.join(bad)}")

    from muurschilderingendatabase_etl_spark.queries.similarity import (
        _ivf_topk,
        _lsh_ann,
        similarity_topk_bruteforce,
    )
    from muurschilderingendatabase_etl_spark.session import get_spark
    from muurschilderingendatabase_etl_spark.tables import t

    spark = get_spark(app_name="ann-recall-value")
    spark.sparkContext.setLogLevel("ERROR")

    n_vec = t(spark, sf_dir, "embeddings").count()
    exact = (
        similarity_topk_bruteforce(spark, sf_dir)
        .select("q_id", "vec_id")
        .localCheckpoint()  # one brute-force pass shared by both indexes
    )
    probes = {"lsh": _lsh_ann, "ivf": _ivf_topk}
    for name in which:
        t0 = time.time()
        # distinct(): both helpers currently emit unique (q_id, vec_id)
        # pairs, but the left-join recall metric would silently inflate
        # n_exact AND n_hit if a future change introduced duplicates —
        # make the metric robust by construction (r9 ADVICE).
        approx = probes[name](spark, sf_dir).select("q_id", "vec_id").distinct()
        row = (
            exact.join(approx.withColumn("hit", F.lit(1)), ["q_id", "vec_id"], "left")
            .agg(
                F.count(F.lit(1)).alias("n_exact"),
                F.sum(F.coalesce(F.col("hit"), F.lit(0))).alias("n_hit"),
            )
            .collect()[0]
        )
        recall = row["n_hit"] / row["n_exact"] if row["n_exact"] else float("nan")
        print(
            f"{name}: n_vectors={n_vec} recall@5={recall:.3f} "
            f"({row['n_hit']}/{row['n_exact']}) wall={time.time() - t0:.1f}s",
            flush=True,
        )


if __name__ == "__main__":
    main()
