"""Partition-count invariance: query results must not depend on
``spark.sql.shuffle.partitions``.

This is the distributed-correctness axis a single-config test suite
never exercises: an operator that leaks partition structure into its
output (a partition-local candidate phase whose reconciliation is
incomplete, a ranker that assumes a partition count, an iterative
algorithm whose convergence check samples per-partition state) produces
*plausible* wrong answers that stay stable within one config. Each
query here runs under 4 / 7 / 13 shuffle partitions and must produce
identical rows.

Deliberately excluded: ``sample_seeded`` — Spark's seeded Bernoulli
sample is partition-dependent by definition (documented rows-only for
the same reason).
"""

from __future__ import annotations

import pytest

from muurschilderingendatabase_etl_spark import registry

SF_DIR = "/root/testdata/sf0.001"

# The partition-sensitive machinery classes:
QUERIES = [
    "pack_sequence_bins",        # two-phase distributed ranker
    "window_ntile_buckets",      # same ranker, ntile arithmetic
    "dedup_connected_components",  # partition-local union-find + global loop
    "dedup_minhash_lsh",         # banded inverted-index self-join
    "heavy_hitters_two_pass",    # partition-local Misra-Gries candidates
    "agg_two_stage_salted",      # salt + reaggregate
    "sample_hash_stratified",    # hash-bucket sampling
    "sort_global_topk",          # range-partitioned global sort + limit
    "window_sessionize_gaps",    # per-key ordered window
    # Exact money sums (queries/money.py): summation-order independence
    # IS the contract — partial-aggregate boundaries move with the
    # partition count, so any order-dependent accumulation (the double
    # sums these replaced) could flip a rounded cent between configs.
    "agg_pricing_summary",
    "join_broadcast_dim",
]


def _rows(spark, name):
    df = registry.all_queries()[name](spark, SF_DIR)
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("name", QUERIES)
def test_result_invariant_to_shuffle_partition_count(spark, name):
    key = "spark.sql.shuffle.partitions"
    baseline_conf = spark.conf.get(key)
    try:
        results = {}
        for n in (4, 7, 13):
            spark.conf.set(key, str(n))
            results[n] = _rows(spark, name)
    finally:
        spark.conf.set(key, baseline_conf)
    assert results[4] == results[7] == results[13], (
        f"{name} output depends on shuffle partition count "
        f"(rows: { {n: len(r) for n, r in results.items()} })"
    )
