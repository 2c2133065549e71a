"""Large-large join posture (the 100-TB fact-x-fact situation).

PLANS.md shows every headline join broadcasting at sf0.1 — correct for
small dims, but at 100 TB both sides of a fact-x-fact join exceed any
broadcast threshold and Spark MUST fall back to a shuffle join. This
test forces that posture (``spark.sql.autoBroadcastJoinThreshold=-1``,
AQE stays on) across the whole joins.py oracle suite and asserts:

1. the compile-time plan picks a shuffle join (SortMergeJoin or
   ShuffledHashJoin) for the un-hinted equi-joins — no silent
   dependence on small-side broadcast; and
2. the RESULTS still match the DuckDB oracle exactly — the SMJ path is
   executed, not just planned (AQE cannot re-broadcast: with the
   threshold at -1 its dynamic-broadcast rule is disabled too).

Explicit ``F.broadcast()`` hints (deliberate tiny-dim broadcasts in
join_inner_three_way / join_broadcast_dim / join_theta_range) survive
the conf by design; hint-only and join-free queries are listed
separately below so every joins.py query still gets the parity half of
the check under the forced posture.
"""

from __future__ import annotations

import contextlib
import io

import pytest

from muurschilderingendatabase_etl_spark import registry
from tests.conftest import SF_DIR
from tests.parity import assert_parity

# Un-hinted equi-joins: must plan AND execute a shuffle join.
SHUFFLE_JOIN_QUERIES = [
    "join_left_outer",
    "join_right_outer",
    "join_full_outer",
    "join_left_semi",
    "join_left_anti",
    "join_fuzzy_levenshtein",  # equi on block key
    "join_interval_bucketed",  # equi on (user, bucket)
    "join_interval_overlap",  # equi on user_id
]

# Hinted-broadcast or join-free formulations: posture parity only.
#   join_inner_three_way / join_broadcast_dim / join_theta_range —
#     explicit F.broadcast hints (nation=25 rows / part dim / band dim:
#     fixed-size dimensions a 100 TB cluster still broadcasts);
#   join_asof_* — union + window carry, no join node at all (the point);
#   join_cross — bounded cartesian, BNLJ is the only physical choice.
PARITY_ONLY_QUERIES = [
    "join_inner_three_way",
    "join_broadcast_dim",
    "join_theta_range",
    "join_asof_event_order",
    "join_asof_forward_tolerance",
    "join_cross",
]


@pytest.fixture()
def no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        yield spark
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def _plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.mark.parametrize("name", SHUFFLE_JOIN_QUERIES)
def test_shuffle_join_posture(name, no_broadcast, ddb):
    spark = no_broadcast
    df = registry.all_queries()[name](spark, SF_DIR)
    plan = _plan_of(df)
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, (
        f"{name}: no shuffle join with broadcast disabled:\n{plan}"
    )
    assert_parity(
        df.toPandas(), ddb.sql(registry.all_oracles()[name]).df(), name=name
    )


@pytest.mark.parametrize("name", PARITY_ONLY_QUERIES)
def test_posture_parity_only(name, no_broadcast, ddb):
    spark = no_broadcast
    df = registry.all_queries()[name](spark, SF_DIR)
    assert_parity(
        df.toPandas(), ddb.sql(registry.all_oracles()[name]).df(), name=name
    )


def test_posture_lists_cover_joins_module():
    """Every oracle-backed joins.py query is in exactly one list, so a
    future join query can't silently skip the posture check."""
    import muurschilderingendatabase_etl_spark.queries.joins as joins_mod

    join_queries = {
        name
        for name, fn in registry.all_queries().items()
        if fn.__module__ == joins_mod.__name__
        and name in registry.all_oracles()
    }
    listed = set(SHUFFLE_JOIN_QUERIES) | set(PARITY_ONLY_QUERIES)
    assert join_queries == listed, (
        f"unlisted={join_queries - listed} stale={listed - join_queries}"
    )
