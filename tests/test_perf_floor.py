"""Performance floor — a cheap CI tripwire for plan-shape regressions.

Round 5 shipped two silent slowdowns (similarity_ivf_ann rebuilt its
assignment expression per Lloyd iteration; pack_sequence_bins traded a
one-task sort for a two-job ranker) that only surfaced in the official
per-round bench artifact, after the fact. This test runs the historically
slowest / most-regression-prone queries once at sf0.01 and fails hard when
one exceeds 3x its pinned cold-run envelope (measured on the round-6 code,
one JVM warm-up, local[32]) — loose enough to shrug off CI contention,
tight enough that a re-planned shuffle, a lost broadcast, a codegen blowup
or an accidental O(n^2) (the failure classes that produce integer-multiple
slowdowns) trips it before a driver round records it.
"""

from __future__ import annotations

import time

import pytest

from muurschilderingendatabase_etl_spark import registry

SF_DIR = "/root/testdata/sf0.01"

# query -> cold-run envelope seconds at sf0.01 (r6 measurement). The gate
# is 3x this number. Re-pin when a deliberate, documented cost change
# lands (cite the commit in the new pin).
ENVELOPES = {
    "similarity_ivf_ann": 4.0,
    "pack_sequence_bins": 1.5,
    "contamination_bloom_prefilter": 5.0,
    "graph_pagerank_fixed": 5.0,
    "dedup_connected_components": 4.0,
    # r6 official-bench outliers on UNCHANGED code (text_lang_id 5.13x,
    # text_quality_score 1.69x, window_share_of_group 1.56x) — committed
    # clean runs sit at baseline, so those were measurement blips; these
    # pins make a REAL regression in the same queries trip in CI instead
    # of surfacing in a driver artifact (r6 VERDICT item 2).
    "text_lang_id": 1.0,
    "text_quality_score": 1.0,
    "window_share_of_group": 1.0,
    # r7: exact percentiles rebuilt on the rank-based distributed form
    # (babf8c7 + the DISK_ONLY fork checkpoint) — BASELINE.md rows
    # re-anchored; these pins hold the new plan's cost envelope.
    # agg_percentiles sorts first of the pins, so its envelope is a
    # fully-cold measurement (9.8 s: codegen + broadcast warm-up for
    # the whole session rides on it); stats_percentiles_exact runs
    # warm on the same plan shape.
    "agg_percentiles": 4.0,
    "stats_percentiles_exact": 2.0,
}
FACTOR = 3.0


@pytest.mark.parametrize("name", sorted(ENVELOPES))
def test_perf_floor(spark, name):
    fn = registry.all_queries()[name]
    # MIN of two runs: a host stall (GC pause, hypervisor steal — see
    # BENCH_PROTOCOL.md) can inflate one cold run past the gate on
    # unchanged code (observed r7: bloom prefilter 35.4 s in-suite,
    # 4.6 s solo). A real plan regression — the thing this gate exists
    # for — inflates BOTH runs, so min keeps the tripwire while
    # shedding single-run transients.
    elapsed = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        elapsed = min(elapsed, time.perf_counter() - t0)
    limit = ENVELOPES[name] * FACTOR
    assert elapsed <= limit, (
        f"{name} took {elapsed:.1f}s at sf0.01 — over {FACTOR}x its pinned "
        f"{ENVELOPES[name]}s envelope. A plan-shape regression (lost "
        f"broadcast, re-planned shuffle, codegen fallback, O(n^2) blowup) "
        f"is the usual cause; .explain('formatted') the plan and compare "
        f"against PLANS.md before re-pinning."
    )
