"""Unit tests for the derived external-verification ordering
(registry._last_verified_round / _module_round_robin_order).

This ordering directs the round driver's fixed-size prefix window, so a
silent regression here wastes an entire round of external verification.
No SparkSession needed: the artifact parser is pure file/JSON code,
driven here with synthetic CORRECTNESS_r*.json files.
"""

from __future__ import annotations

import json

import pytest

from muurschilderingendatabase_etl_spark import registry


@pytest.fixture()
def fake_artifacts(tmp_path, monkeypatch):
    """Redirect the artifact glob at a temp dir; returns a writer."""

    def write(round_no: int, records: dict | list | str) -> None:
        p = tmp_path / f"CORRECTNESS_r{round_no:02d}.json"
        p.write_text(
            records if isinstance(records, str) else json.dumps(records)
        )

    real_glob = __import__("glob").glob

    def fake_glob(pattern):
        if "CORRECTNESS_r" in pattern:
            return sorted(str(p) for p in tmp_path.glob("CORRECTNESS_r*.json"))
        return real_glob(pattern)

    monkeypatch.setattr("glob.glob", fake_glob)
    return write


def test_never_checked_defaults_to_tier0(fake_artifacts):
    last = registry._last_verified_round()
    assert last.get("some_unknown_query", (0, 0)) == (0, 0)


def test_hash_match_is_verified_tier_with_round(fake_artifacts):
    fake_artifacts(3, {"q": {"hash_match": True}})
    assert registry._last_verified_round()["q"] == (3, 3)


def test_latest_failure_overrides_earlier_pass(fake_artifacts):
    fake_artifacts(2, {"q": {"hash_match": True}})
    fake_artifacts(5, {"q": {"hash_match": False, "err": "mismatch"}})
    # last write wins: a rewritten-and-now-failing query re-queues first
    assert registry._last_verified_round()["q"] == (0, 0)


def test_rows_only_with_oracle_today_is_tier1(fake_artifacts, monkeypatch):
    fake_artifacts(4, {"q": {"err": "no_oracle", "spark_rows": 42}})
    monkeypatch.setitem(registry._ORACLES, "q", "SELECT 1")
    try:
        assert registry._last_verified_round()["q"] == (1, 4)
    finally:
        registry._ORACLES.pop("q", None)


def test_rows_only_without_oracle_is_verified_tier(fake_artifacts):
    fake_artifacts(4, {"q": {"err": "no_oracle", "spark_rows": 42}})
    assert registry._last_verified_round()["q"] == (3, 4)


def test_rows_only_that_never_ran_is_tier0(fake_artifacts):
    fake_artifacts(4, {"q": {"err": "no_oracle", "spark_rows": None}})
    assert registry._last_verified_round()["q"] == (0, 0)


def test_older_pass_sorts_before_newer_within_verified_tier(fake_artifacts):
    fake_artifacts(2, {"old": {"hash_match": True}})
    fake_artifacts(5, {"new": {"hash_match": True}})
    last = registry._last_verified_round()
    # re-verification rotation: least-recently-verified first
    assert last["old"] < last["new"]


def test_tier_order_is_fail_then_upgrade_then_verified(fake_artifacts, monkeypatch):
    fake_artifacts(
        5,
        {
            "failed": {"hash_match": False, "err": "boom"},
            "upgraded": {"err": "no_oracle", "spark_rows": 10},
            "verified": {"hash_match": True},
        },
    )
    monkeypatch.setitem(registry._ORACLES, "upgraded", "SELECT 1")
    try:
        last = registry._last_verified_round()
        assert last["failed"] < last["upgraded"] < last["verified"]
    finally:
        registry._ORACLES.pop("upgraded", None)


def test_corrupt_artifacts_are_skipped_not_fatal(fake_artifacts):
    fake_artifacts(1, "{this is not json")
    fake_artifacts(2, ["not", "a", "dict"])
    fake_artifacts(3, {"q": "not a record dict", "ok": {"hash_match": True}})
    last = registry._last_verified_round()  # must not raise
    assert last["ok"] == (3, 3)
    assert "q" not in last


def test_rewritten_after_pass_demotes_to_rewritten_tier(fake_artifacts, monkeypatch):
    """A hash pass from round R verifies the code as of round R; a rewrite
    in round > R means the current implementation has never been externally
    checked — it must outrank plain re-verification rotation (r8 VERDICT
    item 1), but still sit behind never-verified and contract-upgraded."""
    fake_artifacts(
        7,
        {
            "rewritten": {"hash_match": True},
            "verified": {"hash_match": True},
            "upgraded": {"err": "no_oracle", "spark_rows": 10},
            "failed": {"hash_match": False, "err": "boom"},
        },
    )
    monkeypatch.setitem(registry._ORACLES, "upgraded", "SELECT 1")
    monkeypatch.setitem(registry._REWRITTEN_IN_ROUND, "rewritten", 8)
    try:
        last = registry._last_verified_round()
        assert last["rewritten"] == (2, 7)
        assert (
            last["failed"] < last["upgraded"] < last["rewritten"] < last["verified"]
        )
    finally:
        registry._ORACLES.pop("upgraded", None)


def test_reverification_after_rewrite_restores_verified_tier(fake_artifacts, monkeypatch):
    """Once the driver re-checks the rewritten code (record round >= the
    rewrite round), the query returns to the verified tier — the demotion
    is self-healing, not a permanent flag."""
    fake_artifacts(7, {"q": {"hash_match": True}})
    fake_artifacts(9, {"q": {"hash_match": True}})
    monkeypatch.setitem(registry._REWRITTEN_IN_ROUND, "q", 8)
    assert registry._last_verified_round()["q"] == (3, 9)


def test_rewritten_names_exist_in_registry():
    """The hand-curated rewrite map can go stale on a rename; every key
    must be a registered query."""
    registry.load_all()
    unknown = set(registry._REWRITTEN_IN_ROUND) - set(registry._QUERIES)
    assert not unknown, f"stale _REWRITTEN_IN_ROUND entries: {sorted(unknown)}"


def test_full_ordering_tiers_are_monotonic():
    """On the real committed artifacts: the ordering never places a
    more-verified query before a less-verified one."""
    registry.load_all()
    order = registry._module_round_robin_order()
    last = registry._last_verified_round()
    keys = [last.get(n, (0, 0)) for n in order]
    assert keys == sorted(keys)
    assert len(order) == len(set(order)) == len(registry._QUERIES)
