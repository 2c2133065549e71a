"""Skewed-fixture stress (VERDICT r3 item 4): the salted/AQE code paths must
stay CORRECT — not just plan-pretty — when one key owns 30% of the rows.

The inline-skew plan test (test_plans.py::test_aqe_splits_skewed_join) proves
AQE *engages*; these tests prove the skew-relevant queries keep oracle parity
on a persistent hot-keyed fixture: events.user_id=0 gets 30% of events (the
sessionize window's partition key) and documents.source='src0' gets 30% of
docs (the n-gram-jaccard blocking key). Fixture comes from scripts/gen_sf.py
--skew 0.3, generated deterministically into a per-session tmp dir.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
from gen_sf import gen  # noqa: E402

from muurschilderingendatabase_etl_spark import registry
from tests.parity import assert_parity

SKEW_QUERIES = [
    "agg_two_stage_salted",
    "window_sessionize_gaps",
    "dedup_ngram_jaccard",
    # Skew-adjacent: heavy groupBy on the hot key and the exact-dup path.
    "funnel_signup_purchase",
    "dedup_exact_hash",
]


@pytest.fixture(scope="module")
def skew_dir(tmp_path_factory) -> str:
    d = str(tmp_path_factory.mktemp("skewfix") / "sf0.01-skew")
    gen(0.01, d, skew=0.3)
    return d


@pytest.fixture(scope="module")
def skew_ddb(skew_dir):
    from muurschilderingendatabase_etl_spark.tables import TABLES

    con = duckdb.connect()
    for name in TABLES:
        con.sql(
            f"CREATE VIEW {name} AS SELECT * FROM '{skew_dir}/{name}.parquet'"
        )
    yield con
    con.close()


def test_fixture_is_actually_skewed(skew_ddb):
    top = skew_ddb.sql(
        "SELECT count(*) FILTER (user_id = 0) * 1.0 / count(*) FROM events"
    ).fetchone()[0]
    assert top > 0.25, f"hot user owns only {top:.1%} of events"
    hot_src = skew_ddb.sql(
        "SELECT count(*) FILTER (source = 'src0') * 1.0 / count(*) FROM documents"
    ).fetchone()[0]
    assert hot_src > 0.25, f"hot source owns only {hot_src:.1%} of documents"


@pytest.mark.parametrize("name", SKEW_QUERIES)
def test_skewed_parity(name, spark, skew_dir, skew_ddb):
    oracles = registry.all_oracles()
    spark_pdf = registry.all_queries()[name](spark, skew_dir).toPandas()
    oracle_pdf = skew_ddb.sql(oracles[name]).df()
    assert_parity(spark_pdf, oracle_pdf, name=f"{name}@skew0.3")


def test_salted_agg_plan_two_stage_on_skew(spark, skew_dir):
    """The salt must survive into the physical plan: a partial aggregate
    grouped by (flag, salt) feeding a final aggregate grouped by flag."""
    import contextlib
    import io

    df = registry.all_queries()["agg_two_stage_salted"](spark, skew_dir)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("extended")
    p = buf.getvalue()
    assert "salt" in p, "salt column eliminated from the physical plan"
    # Two separate exchanges: one keyed on (flag, salt), one on flag alone.
    assert p.count("Exchange hashpartitioning") >= 2, p
    assert "pmod" in p
