"""Adversarial-values sweep: every registered query must survive a tiny
fixture of degenerate-but-legal values (scripts/adversarial_sweep.py):
total ties (all-equal prices, one shared timestamp), extreme key skew,
empty / whitespace-only / single-word / unicode text, zero and
duplicated embedding vectors, malformed JSON props, orphan foreign keys.

The round-7 sweep caught nine crashes, all ANSI-mode edges no sampled
fixture reaches: divide-by-zero through zero-norm cosines (4 similarity
queries), zero-variance builtin corr (2 stats queries), zero-range
histogram span, zero-length text ratios, and strict VARIANT parsing on
malformed JSON. Each is now a NULL-propagating try_ form matching
DuckDB's x/0 = NULL; this test pins all 186 queries against the
fixture so the class can't regress.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
from adversarial_sweep import make_fixture, make_null_fixture  # noqa: E402


@pytest.fixture(scope="module")
def adv_sf_dir():
    dst = tempfile.mkdtemp(prefix="msdb_adv_sf_")
    make_fixture(dst)
    yield dst
    shutil.rmtree(dst, ignore_errors=True)


@pytest.fixture(scope="module")
def null_sf_dir():
    dst = tempfile.mkdtemp(prefix="msdb_null_sf_")
    make_null_fixture(dst)
    yield dst
    shutil.rmtree(dst, ignore_errors=True)


def _sweep(spark, sf_dir) -> dict[str, str]:
    import __spark_entry__ as mod

    failures: dict[str, str] = {}
    for name, fn in mod.queries().items():
        try:
            fn(spark, sf_dir).collect()
        except Exception as e:  # noqa: BLE001 — collecting all failures
            failures[name] = f"{type(e).__name__}: {str(e).splitlines()[0][:200]}"
    return failures


def test_every_query_survives_adversarial_values(spark, adv_sf_dir):
    failures = _sweep(spark, adv_sf_dir)
    assert not failures, f"{len(failures)} queries crash on adversarial values: {failures}"


def test_every_query_survives_null_values(spark, null_sf_dir):
    """Every parquet column is nullable, so NULL-laden rows are legal
    input. The round-7 sweep caught three crashes: the Turtle writers
    formatting a NULL term (now filtered — an RDF triple has no NULL
    terms), IVF training on a NULL/NULL-component vector (now excluded
    from the index), and the stateful-stream aggregator sorting a None
    event_type into its state encoding (now dropna'd)."""
    failures = _sweep(spark, null_sf_dir)
    assert not failures, f"{len(failures)} queries crash on NULL values: {failures}"
