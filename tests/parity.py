"""Shared Spark-vs-DuckDB comparison, mirroring the driver's check:
row count + column names + order-insensitive value comparison."""

from __future__ import annotations

import math

import pandas as pd


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df = df[sorted(df.columns)]
    for col in df.columns:
        s = df[col]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[col] = s.dt.strftime("%Y-%m-%d %H:%M:%S.%f")
        elif pd.api.types.is_float_dtype(s):
            # tolerate last-ulp noise; queries already round to 2dp
            df[col] = s.round(6)
        elif s.dtype == object:
            df[col] = s.map(_norm_value)
    df = df.sort_values(by=list(df.columns), kind="mergesort", na_position="last")
    return df.reset_index(drop=True)


def _norm_value(v):
    import numpy as np

    if isinstance(v, float):
        return round(v, 6)
    if isinstance(v, np.ndarray):
        v = v.tolist()
    if isinstance(v, (list, tuple)):
        return tuple(_norm_value(x) for x in v)
    if isinstance(v, np.generic):
        return v.item()
    return v


def assert_parity(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, name: str = "") -> None:
    assert sorted(spark_pdf.columns) == sorted(oracle_pdf.columns), (
        f"{name}: column mismatch spark={sorted(spark_pdf.columns)} "
        f"oracle={sorted(oracle_pdf.columns)}"
    )
    assert len(spark_pdf) == len(oracle_pdf), (
        f"{name}: row count spark={len(spark_pdf)} oracle={len(oracle_pdf)}"
    )
    # dtype-kind parity (int vs float vs other) — the driver compares
    # schemas, so Spark LONG vs DuckDB DOUBLE is a real mismatch even
    # when values are numerically equal.
    for col in sorted(spark_pdf.columns):
        sk = spark_pdf[col].dtype.kind
        ok_ = oracle_pdf[col].dtype.kind
        if {sk, ok_} <= {"i", "u"}:
            continue
        assert sk == ok_ or "O" in (sk, ok_) or {sk, ok_} == {"M", "O"}, (
            f"{name}: col {col} dtype kind spark={sk} oracle={ok_}"
        )
    a, b = _normalize(spark_pdf), _normalize(oracle_pdf)
    for col in a.columns:
        av, bv = a[col].tolist(), b[col].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            if x is None and y is None:
                continue
            if isinstance(x, float) and isinstance(y, float):
                if math.isnan(x) and math.isnan(y):
                    continue
                assert math.isclose(x, y, rel_tol=1e-9, abs_tol=1e-6), (
                    f"{name}: col {col} row {i}: spark={x!r} oracle={y!r}"
                )
            else:
                assert _eq(x, y), f"{name}: col {col} row {i}: spark={x!r} oracle={y!r}"


def _eq(x, y) -> bool:
    if isinstance(x, (list, tuple)) and isinstance(y, (list, tuple)):
        return len(x) == len(y) and all(_eq(a, b) for a, b in zip(x, y))
    if isinstance(x, float) and isinstance(y, float):
        return math.isclose(x, y, rel_tol=1e-9, abs_tol=1e-6)
    try:
        if pd.isna(x) and pd.isna(y):
            return True
    except (TypeError, ValueError):
        pass
    return x == y
