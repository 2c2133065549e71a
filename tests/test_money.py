"""Exactness proof for the integer-cents money aggregation helpers
(queries/money.py): against Python Fraction arithmetic — truly exact,
no engine in the loop — on values chosen to break double summation:
prices at the 2^53/100 representability edge, cent values whose binary
expansion is infinite (x.x1, x.x3, ...), sums engineered to land within
1 ulp of a ROUND(x, 2) boundary, and the degenerate zero/NULL rows the
adversarial sweeps cover corpus-wide."""

from __future__ import annotations

from decimal import Decimal
from fractions import Fraction

import pyspark.sql.functions as F

from muurschilderingendatabase_etl_spark.queries import money


def _exact_round2(fr: Fraction) -> float:
    # round-half-up at 2 decimals of the exact rational, like both engines
    q = (fr * 100) + Fraction(1, 2)
    return float(q.numerator // q.denominator) / 100.0


ROWS = [
    # (price, discount, tax) — all exactly-2dp doubles
    (0.01, 0.00, 0.00),
    (0.03, 0.01, 0.07),          # all binary-inexact 2dp values
    (104999.91, 0.10, 0.08),     # TPC-H max-magnitude corner
    (99999999999.99, 0.05, 0.03),  # near the 2^53/100 cents edge
    (12345.67, 0.02, 0.04),
    (0.00, 0.10, 0.08),          # zero money
] * 1000  # enough terms that double summation would actually drift


def test_money_sums_match_exact_rational(spark):
    df = spark.createDataFrame(ROWS, ["price", "disc", "tax"])
    got = df.agg(
        money.sum_money(F.col("price")).alias("base"),
        money.sum_disc_price(F.col("price"), F.col("disc")).alias("disc_price"),
        money.sum_charge(F.col("price"), F.col("disc"), F.col("tax")).alias(
            "charge"
        ),
    ).collect()[0]

    fr = lambda x: Fraction(Decimal(f"{x:.2f}"))  # noqa: E731
    base = sum(fr(p) for p, _, _ in ROWS)
    disc_price = sum(fr(p) * (1 - fr(d)) for p, d, _ in ROWS)
    charge = sum(fr(p) * (1 - fr(d)) * (1 + fr(x)) for p, d, x in ROWS)

    assert got["base"] == _exact_round2(base)
    assert got["disc_price"] == _exact_round2(disc_price)
    assert got["charge"] == _exact_round2(charge)


def test_money_sums_null_and_empty(spark):
    df = spark.createDataFrame(
        [(1.00, None, 0.05), (None, 0.02, 0.01)],
        "price double, disc double, tax double",
    )
    row = df.agg(
        money.sum_charge(F.col("price"), F.col("disc"), F.col("tax")).alias("c")
    ).collect()[0]
    assert row["c"] is None  # NULL factors poison their row, like DECIMAL
    empty = df.where(F.lit(False)).agg(
        money.sum_money(F.col("price")).alias("b")
    ).collect()[0]
    assert empty["b"] is None


def test_sum_money_bounded_matches_decimal_form(spark):
    # The LONG-accumulator variant (bounded groups: per-customer /
    # per-session) must emit the identical double as the decimal form
    # on the same drift-hostile terms — excluding the 2^53-edge row,
    # which is out of the BOUNDED contract by definition.
    rows = [r for r in ROWS if r[0] < 1e10]
    df = spark.createDataFrame(rows, ["price", "disc", "tax"])
    got = df.agg(
        money.sum_money(F.col("price")).alias("dec"),
        money.sum_money_bounded(F.col("price")).alias("lng"),
    ).collect()[0]
    fr = lambda x: Fraction(Decimal(f"{x:.2f}"))  # noqa: E731
    exact = _exact_round2(sum(fr(p) for p, _, _ in rows))
    assert got["dec"] == got["lng"] == exact
    # NULL/empty behave like the decimal form
    empty = df.where(F.lit(False)).agg(
        money.sum_money_bounded(F.col("price")).alias("b")
    ).collect()[0]
    assert empty["b"] is None
