"""bench.py contention guard (r13): a timed loop whose telemetry
crosses the steal/other bounds is re-run once and the less-contended
attempt reported — selection by contention, never by speed, with both
attempts preserved in the detail sidecar. These tests pin the decision
function and the retry path's output contract (one final JSON line,
same fields, queries dict intact) without paying a real suite run:
the registry is monkeypatched down to two trivial queries."""

from __future__ import annotations

import io
import json
import os

import pytest


def test_contaminated_thresholds():
    import bench

    assert not bench._contaminated({})
    assert not bench._contaminated(
        {"steal_cpu_cores": 1.0, "other_cpu_cores": 3.0}
    )
    assert bench._contaminated({"steal_cpu_cores": 1.01})
    assert bench._contaminated({"other_cpu_cores": 3.01})


def test_forced_retry_keeps_contract(spark, monkeypatch, tmp_path, capsys):
    import bench
    from muurschilderingendatabase_etl_spark import registry

    def q(s, sf_dir):
        return s.range(10).selectExpr("id", "id * 2 AS v")

    monkeypatch.setattr(
        registry,
        "all_queries",
        lambda: {"flagship_revenue_by_nation": q, "zz_other": q},
    )
    # reuse the session fixture instead of building a new JVM
    monkeypatch.setattr(bench, "get_spark", lambda app_name: spark)
    monkeypatch.setattr(spark, "stop", lambda: None)
    # force the retry branch regardless of real host state
    monkeypatch.setattr(bench, "_RETRY_STEAL_CORES", -1.0)
    monkeypatch.chdir(tmp_path)

    bench.main()
    out = capsys.readouterr().out.strip().splitlines()
    final = json.loads(out[-1])
    # contract: final line shape unchanged
    assert final["metric"] == "suite_wall_clock"
    assert final["n_queries"] == 2 and final["n_errors"] == 0
    detail = json.load(open(tmp_path / "BENCH_DETAIL.json"))
    assert set(detail["queries"]) == {"flagship_revenue_by_nation", "zz_other"}
    # the rejected attempt is preserved with its own telemetry
    assert "rejected_attempt" in detail
    assert set(detail["rejected_attempt"]["queries"]) == set(detail["queries"])
    assert detail["rejected_attempt"]["attempt"] in (1, 2)
