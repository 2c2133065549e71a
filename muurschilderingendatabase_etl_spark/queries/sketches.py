"""Bounded-memory sketch operators: two-pass exact heavy hitters.

The classic way to find frequent items over data too large to groupBy
in one shot with bounded reducer memory:

Pass 1 — a Misra-Gries summary per partition (fixed K counters,
Arrow-batched ``mapInPandas``). MG guarantees any item with partition
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
    """Misra-Gries over one partition's word stream: K counters max."""
    counters: dict[str, int] = {}
    for pdf in batches:
        for w in pdf["word"]:
            if w in counters:
                counters[w] += 1
            elif len(counters) < MG_K:
                counters[w] = 1
            else:
                dead = []
                for k in counters:
                    counters[k] -= 1
                    if counters[k] == 0:
                        dead.append(k)
                for k in dead:
                    del counters[k]
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
