"""One-off sweep: hyperplane-LSH recall vs (n_tables, probe radius).

Run: python scripts/exp_lsh_recall.py [sf_dir ...]
Prints recall@5 vs the exact brute-force top-k plus wall time per config.
"""
from __future__ import annotations

import sys
import time

from pyspark.sql import SparkSession

sys.path.insert(0, ".")
from muurschilderingendatabase_etl_spark.queries.similarity import (  # noqa: E402
    _lsh_ann,
    similarity_topk_bruteforce,
)


def topk_sets(df):
    out: dict[int, set[int]] = {}
    for r in df.collect():
        out.setdefault(r["q_id"], set()).add(r["vec_id"])
    return out


def main() -> None:
    sf_dirs = sys.argv[1:] or ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .appName("lsh-recall-sweep")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    configs = [
        ((42, 43, 44), 2),
        ((42, 43, 44, 45), 2),
        ((42, 43, 44, 45, 46), 2),
        ((42, 43, 44), 3),
        ((42, 43, 44, 45), 3),
        ((42, 43, 44, 45, 46), 3),
    ]
    for sf_dir in sf_dirs:
        exact = topk_sets(similarity_topk_bruteforce(spark, sf_dir))
        total = sum(len(v) for v in exact.values())
        for seeds, radius in configs:
            t0 = time.time()
            approx = topk_sets(_lsh_ann(spark, sf_dir, seeds=seeds, radius=radius))
            dt = time.time() - t0
            hits = sum(len(exact[q] & approx.get(q, set())) for q in exact)
            print(
                f"{sf_dir}  tables={len(seeds)} radius={radius}  "
                f"recall={hits / total:.3f}  wall={dt:.2f}s",
                flush=True,
            )
    spark.stop()


if __name__ == "__main__":
    main()
