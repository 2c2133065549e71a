"""Direct equivalence tests for the two-phase distributed ranker and the
rank-based exact percentiles (`queries/distributed.py`).

The queries built on these helpers hash-match their DuckDB oracles, but
that only exercises the fixture's data shape. These tests drive the
helpers against Spark's own single-task forms (`row_number() OVER` and
the builtin `percentile()`) on seeded adversarial datasets — heavy key
skew, all-equal keys, singleton groups, degenerate partition counts —
where an off-by-one in the offset bookkeeping or the bracketing-rank
pick would actually bite.
"""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F
import pytest
from pyspark.sql import Window

from muurschilderingendatabase_etl_spark.queries.distributed import (
    exact_group_percentiles,
    with_global_row_number,
)

SEED = 20260815


def _datasets(spark):
    rng = np.random.default_rng(SEED)
    n = 20_000
    # skewed: a few hot keys dominate; values duplicated heavily
    skewed = spark.createDataFrame(
        [
            (int(k), int(v), i)
            for i, (k, v) in enumerate(
                zip(
                    rng.zipf(1.5, n) % 50,
                    rng.integers(0, 100, n),
                )
            )
        ],
        "k long, v long, uid long",
    )
    # constant: every sort key equal — ordering carried by the tiebreaker
    const = spark.createDataFrame(
        [(1, 7, i) for i in range(500)], "k long, v long, uid long"
    )
    # unique: strictly increasing, already sorted
    unique = spark.createDataFrame(
        [(int(x), int(x), int(x)) for x in range(1000)],
        "k long, v long, uid long",
    )
    return {"skewed": skewed, "const": const, "unique": unique}


@pytest.mark.parametrize("nparts", [1, 5, 32])
def test_global_row_number_matches_window(spark, nparts):
    for name, df in _datasets(spark).items():
        order = [F.col("k"), F.col("v"), F.col("uid")]  # total order
        got = with_global_row_number(
            df, order, out_col="rn", num_partitions=nparts
        )
        want = df.withColumn(
            "rn", F.row_number().over(Window.orderBy("k", "v", "uid"))
        )
        diff = got.join(want, ["k", "v", "uid"]).where(
            got["rn"] != want["rn"]
        )
        assert diff.count() == 0, f"{name} @ {nparts} partitions"
        assert got.count() == df.count()


def test_global_row_number_total_col(spark):
    df = _datasets(spark)["skewed"]
    got = with_global_row_number(
        df, [F.col("v"), F.col("uid")], out_col="rn", total_col="n_total"
    )
    row = got.agg(
        F.max("rn").alias("mx"),
        F.min("rn").alias("mn"),
        F.max("n_total").alias("t"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    assert (row.mn, row.mx, row.t) == (1, row.n, row.n)


def test_exact_group_percentiles_match_builtin(spark):
    """Integer-cent values + dyadic and boundary probes: every term of
    the ANSI interpolation is exact in IEEE double, so the rank-based
    form must be BIT-identical to the builtin percentile()."""
    rng = np.random.default_rng(SEED + 1)
    rows = [
        (int(k), int(v))
        for k, v in zip(rng.integers(0, 7, 30_000), rng.integers(0, 10_000, 30_000))
    ]
    rows += [(99, 42)]  # singleton group: every probe must return 42
    df = spark.createDataFrame(rows, "g long, cents long")
    ps = [0.0, 0.25, 0.5, 0.99, 1.0]
    got = {
        r["g"]: r["qs"]
        for r in exact_group_percentiles(df, "g", "cents", ps).collect()
    }
    want = {
        r["g"]: r["qs"]
        for r in df.groupBy("g")
        .agg(
            F.expr(
                "percentile(cents, array(0.0D, 0.25D, 0.5D, 0.99D, 1.0D))"
            ).alias("qs")
        )
        .collect()
    }
    assert set(got) == set(want)
    for g in want:
        assert got[g] == want[g], f"group {g}: {got[g]} != {want[g]}"
    assert got[99] == [42.0] * len(ps)
