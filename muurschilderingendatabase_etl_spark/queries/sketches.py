"""Bounded-memory sketch operators: two-pass exact heavy hitters.

The classic way to find frequent items over data too large to groupBy
in one shot with bounded reducer memory:

Pass 1 — a Misra-Gries summary per partition (K counters carried
between Arrow batches; transiently K + batch-distinct during a merge,
still bounded by the Arrow batch size). MG guarantees any item with partition
frequency > n_p/(K+1) survives its partition's summary; by averaging,
any item with GLOBAL frequency > n/(K+1) must exceed the local
threshold in at least one partition, so the union of survivors is a
guaranteed superset of the global heavy hitters.

Pass 2 — exact counts for the candidate set only (a broadcast semi
join — the candidate set is at most K rows per partition), filtered to
the final threshold. Because the threshold (3%) is above the MG
guarantee line (1/(K+1) with K=200), the result is EXACT — identical
to a full groupBy — which is what makes the operator oracle-checkable
while pass 1 never holds more than K counters in memory.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from muurschilderingendatabase_etl_spark.registry import query
from muurschilderingendatabase_etl_spark.tables import t

MG_K = 200  # counters per partition summary
HH_FRAC = 0.03  # report items above 3% of total occurrences


def _mg_candidates(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Weighted Misra-Gries over one partition's word stream.

    Vectorized: each Arrow batch is pre-aggregated with ``value_counts``
    (C speed) and merged into the summary as weighted increments; when
    the summary exceeds K entries, one batched decrement subtracts
    delta = the (K+1)-th largest count from every counter and drops the
    non-positive ones. Each such decrement destroys >= (K+1)*delta of
    total counted mass (the top K+1 counters each lose a full delta),
    so sum(delta) <= n_p/(K+1) — the classic MG undercount bound — and
    any item with partition frequency > n_p/(K+1) still survives.
    Work per batch is O(U log U) in the number of distinct words,
    instead of a Python-level O(K) sweep per evicting occurrence.
    """
    counters: dict[str, int] = {}
    for pdf in batches:
        for w, c in pdf["word"].value_counts().items():
            counters[w] = counters.get(w, 0) + int(c)
        if len(counters) > MG_K:
            delta = sorted(counters.values(), reverse=True)[MG_K]
            counters = {w: c - delta for w, c in counters.items() if c > delta}
    yield pd.DataFrame({"word": list(counters.keys())})


@query(
    "heavy_hitters_two_pass",
    oracle=f"""
    WITH w AS (
      SELECT unnest(string_split(text, ' ')) AS word FROM documents
    ),
    nz AS (SELECT word FROM w WHERE word <> '')
    SELECT word, CAST(COUNT(*) AS BIGINT) AS n_occurrences
    FROM nz
    GROUP BY word
    HAVING COUNT(*) > {HH_FRAC} * (SELECT COUNT(*) FROM nz)
    """,
)
def heavy_hitters_two_pass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact heavy hitters (words above 3% of all occurrences) without
    an unbounded groupBy: MG candidate sketch per partition, then exact
    counts for candidates only. The oracle is the plain GROUP BY
    HAVING — the two-pass plan must reproduce it exactly."""
    words = (
        t(spark, sf_dir, "documents")
        .select(F.explode(F.split("text", " ")).alias("word"))
        .where(F.col("word") != "")
    )
    candidates = (
        words.mapInPandas(_mg_candidates, "word string").distinct()
    )
    total = words.agg(F.count(F.lit(1)).alias("tot"))
    return (
        words.join(F.broadcast(candidates), "word", "left_semi")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .crossJoin(F.broadcast(total))
        .where(F.col("n_occurrences") > F.lit(HH_FRAC) * F.col("tot"))
        .select("word", "n_occurrences")
    )
