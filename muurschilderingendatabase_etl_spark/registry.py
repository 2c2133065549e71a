"""Query registry — the single source of truth for the driver contract.

Every implemented operator from SURVEY.md §2 registers here as a named
callable ``(spark, sf_dir) -> DataFrame`` plus (when SQL-expressible) an
equivalent DuckDB oracle SQL string. ``__spark_entry__.queries()`` /
``oracle_sql()`` simply re-export these dicts.

Conventions (driver contract, see repo README):
- every computed/aggregate column is aliased identically in the Spark code
  and the oracle SQL (the driver hash sorts columns by NAME);
- double-typed aggregates are rounded to 2 decimals on BOTH sides so that
  floating-point summation order can't flip the hash;
- timestamps in output are cast to DATE or formatted strings on both sides
  (Spark µs vs DuckDB ns precision would otherwise diverge).
"""

from __future__ import annotations

import re
from collections.abc import Callable
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def query(name: str, oracle: Optional[str] = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query; ``oracle=None`` marks it rows-only (non-SQL op)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every query module so registration side effects run."""
    from muurschilderingendatabase_etl_spark import queries as _  # noqa: F401


# Queries whose IMPLEMENTATION materially changed in round N (hand-curated
# at round close — the cheapest honest signal; a git-derived per-module
# variant would requeue a whole module on any edit). If N is later than the
# round of a query's latest external pass, that pass verified the OLD code:
# the query is demoted from the verified tier to the rewritten tier so it
# leads the next driver window instead of waiting out the full
# least-recently-verified rotation (r8 VERDICT item 1 — five r7-vintage
# records on r8-rewritten code would otherwise sit behind 87 older names
# until ~r10).
_REWRITTEN_IN_ROUND: dict[str, int] = {
    # r8 rewrites (money exact-cents migration, bounded-group LONG state,
    # geo prefilter, WoW rewrite) — latest external records r5–r7.
    # (stream_session_window / stream_stateful_user_stats /
    # stream_sliding_window were also r8-rewritten; their entries live in
    # the r10 block below — exactly ONE entry per query, latest round
    # wins, enforced by tests/test_check_rewrites.py::test_no_duplicate_keys.)
    "trend_week_over_week": 8,
    "window_running_sum": 8,
    "agg_two_stage_salted": 8,
    "sink_merge_upsert": 8,
    "agg_having": 8,
    "subq_scalar_correlated": 8,
    "geo_distance_join_grid": 8,
    "agg_min_by_max_by": 8,
    # r9 rewrites (ADVICE fixes): simhash contract column dropped (schema
    # change), fingerprint verification-form pre-filter, cogroup NaN guard.
    # (dedup_simhash's r9 entry is superseded by its r12 one below —
    # single entry per query, latest round wins.)
    "text_fingerprint": 9,
    "udf_cogroup_apply_in_pandas": 9,
    # r10 backfill — found mechanically by scripts/check_rewrites.py
    # (r9 VERDICT item 4): queries whose code slice (registered function
    # + same-module helper closure) changed in r7/r8 while their latest
    # external record predates the change. The hand-curated list had only
    # backfilled the r8 money-migration set; these verified rounds were
    # dated with `check_rewrites.py --when`.
    # (stream_late_data_drop r7 and stream_foreach_batch_sink /
    # stream_static_join / stream_transform_with_state r8 were superseded
    # by the r10 replay-sink rewrite — single entries in the r10 block.)
    "agg_corr_covar": 7,
    "agg_hll_rolling_uniques": 7,
    "array_hof_vector_norm": 7,
    "sink_partitioned_pruning": 7,
    "join_dynamic_partition_pruning": 8,
    "pipeline_incremental_upsert": 8,
    "scan_orc_roundtrip": 8,
    "sink_sorted_data_skipping": 8,
    "sink_zorder_2d_skipping": 8,
    # r11 backfill — found by the CROSS-MODULE slicer (r10 VERDICT item
    # 4): these queries' out-of-module dependencies (money.py exact-cents
    # migration, textutil.py) changed in r8 while their latest records
    # are r7; the module-local r10 slicer couldn't see it. Dated with
    # the cross-module `check_rewrites.py --when`.
    "agg_pricing_summary": 8,
    "flagship_revenue_by_nation": 8,
    "join_broadcast_dim": 8,
    "text_quality_score": 8,
    # r10 scale rewrite: pagerank build phase now pins the distinct
    # pairs ONCE (DISK_ONLY) and derives edges/counts/degrees from that
    # cache — the pre-r10 shape re-ran the source scan + distinct
    # shuffle up to 3x at build (r9 ADVICE + the sf100 14.3x residual).
    # Supersedes the r9 entry for the same query.
    "graph_pagerank_fixed": 10,
    # r10 scale rewrite: two-stage top-k in the brute-force cosine
    # (local (q_id, partition) window bounds the global q_id window's
    # input to k rows per group — the r9 sf100 12.5x/decade tail). The
    # ANN queries' in-band recall contracts call the bruteforce, so
    # their slices changed with it (flagged by check_rewrites.py).
    "similarity_topk_bruteforce": 10,
    "similarity_lsh_ann": 10,
    "similarity_ivf_ann": 10,
    # r10 scale rewrite: run_to_memory (streaming/replay.py) moved from
    # the memory sink to a foreachBatch parquet sink after the sf100
    # mid-tier sweep OOMed two replays in MemoryDataWriter.commit /
    # driver maxResultSize. Output contents are reproduced exactly, but
    # every replay-backed streaming query's execution path changed —
    # replay.py is OUTSIDE their defining module, so check_rewrites.py's
    # slice can't see it (documented limitation): listed by hand.
    # (stream_late_data_drop / stream_foreach_batch_sink drive their own
    # sinks but share stream_state_partitions, whose default became
    # staged-bytes-scaled in r10 — same out-of-module reason.)
    # r12 rewrite (r11 ADVICE): the bloom bitmap literal moved from
    # F.lit(list) — which classic PySpark 4 desugars right back into a
    # 1024-child CreateArray — to F.lit(np.int64 ndarray), the path
    # that builds ONE JVM Literal node per array and pins the element
    # type to bigint. (The r11 win was real but mis-attributed: it
    # dropped the 1024 per-element Casts, not the CreateArray.)
    # Supersedes the r11 entry for the same query.
    "contamination_bloom_prefilter": 12,
    # r12 rewrite (r11 VERDICT item 2): explicit broadcast hint on the
    # bounded brute-force slice inside dedup_simhash's in-band agreement
    # check — the non-equi self-join was BNLJ only by lineage accident
    # (localCheckpoint stats); the hint pins it structurally, matching
    # the cohesion fix. Supersedes the r9 entry for the same query.
    "dedup_simhash": 12,
    # r11 perf rewrite: broadcast hint on the bounded (<=60 vec) side of
    # the cohesion self-join — Catalyst costed the filtered scan at full
    # file size and fell back to CartesianProduct (1024 tasks re-opening
    # the source; 22.8x/decade in the r11 tail sweep -> 2.7x post-fix).
    "similarity_label_cohesion": 11,
    # r11 rewrite: the replay sink became idempotent under batch
    # redelivery (batch_id-keyed subdirectories, r10 VERDICT item 2) and
    # state-store sizing now resolves the stream's OWN staged source via
    # its analyzed plan (r10 ADVICE) — streaming/replay.py again, this
    # time flagged MECHANICALLY by the cross-module slicer, not by hand.
    # Supersedes the r10 entries for the same 13 queries.
    "stream_late_data_drop": 11,
    "stream_foreach_batch_sink": 11,
    "stream_tumbling_window": 11,
    "stream_sliding_window": 11,
    "stream_session_window": 11,
    "stream_watermark_append": 11,
    "stream_dedup_stateful": 11,
    "stream_dedup_within_watermark": 11,
    "stream_static_join": 11,
    "stream_stateful_user_stats": 11,
    "stream_stream_join": 11,
    "stream_transform_with_state": 11,
    "stream_stream_outer_join": 11,
}


def _last_verified_round() -> dict[str, tuple[int, int]]:
    """Per-query round of the most recent SUCCESSFUL external verification,
    parsed from the committed ``CORRECTNESS_r*.json`` driver artifacts.

    A query counts as verified in round N if its record there is a hash
    match, or — for rows-only queries (no oracle by driver contract) — it
    ran and produced rows. A query whose LATEST record is a failure is
    treated as never-verified (round 0), so rewritten or previously
    crashing implementations are always re-queued for external checking.
    Queries absent from every artifact are round 0 too.

    This replaces the hand-maintained ``_DRIVER_CHECKED`` frozenset (stale
    at r5 close — VERDICT r5 item 1) with a set that can't go stale, and
    it addresses the r5 ADVICE objection that a one-way fresh/seen split
    permanently shields already-checked queries from re-verification:
    ordering is least-recently-verified FIRST, so once every query has
    been covered the driver's prefix window rotates back over the oldest
    verifications — every implementation gets periodically re-checked.
    """
    import glob
    import json
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    last: dict[str, tuple[int, int]] = {}
    # Sort by the PARSED round number, not the filename: last-write-wins
    # below assumes round order, and lexicographic order only matches it
    # for zero-padded 2-digit rounds (an unpadded CORRECTNESS_r7.json or
    # round >= 100 would let an older record overwrite a newer one).
    found: list[tuple[int, str]] = []
    for path in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if m:
            found.append((int(m.group(1)), path))
    for rnd, path in sorted(found):
        try:
            with open(path) as fh:
                records = json.load(fh)
        except (OSError, ValueError):
            continue
        if not isinstance(records, dict):
            continue
        for name, rec in records.items():
            if not isinstance(rec, dict):
                continue
            hash_ok = rec.get("hash_match") is True
            rows_only_ran = (
                rec.get("err") == "no_oracle" and rec.get("spark_rows") is not None
            )
            # Tiers (files are processed in round order: last write wins):
            #   0 — latest record is a failure (or never checked at all):
            #       full never-verified priority;
            #   1 — ran rows-only but the query HAS an oracle today, i.e.
            #       the value contract was added after the last external
            #       check and has never been externally run: first in
            #       line AFTER the never-verified set (it has at least a
            #       rows-level external pass, a true zero has nothing);
            #   2 — (assigned below) implementation rewritten AFTER the
            #       latest external pass: that pass verified old code;
            #   3 — externally verified at its current contract level
            #       and implementation.
            if not (hash_ok or rows_only_ran):
                last[name] = (0, 0)
            elif rows_only_ran and name in _ORACLES:
                last[name] = (1, rnd)
            else:
                last[name] = (3, rnd)
    # Demote verified records that predate a rewrite of the query's
    # implementation (see _REWRITTEN_IN_ROUND). Once the driver re-checks
    # the rewritten code, the new record's round >= the rewrite round and
    # the query returns to the verified tier automatically.
    for name, (tier, rnd) in list(last.items()):
        if tier == 3 and _REWRITTEN_IN_ROUND.get(name, 0) > rnd:
            last[name] = (2, rnd)
    return last


def _module_round_robin_order() -> list[str]:
    """Query names interleaved round-robin across their defining modules.

    The round driver checks a prefix of the registry in dict order; plain
    registration order front-loads whole modules and starves the rest
    (round 1: the driver's 50-query window never reached 11 of 20
    modules). Interleaving puts the first query of every module in the
    first len(modules) entries, so any prefix window samples every
    operator category.
    """
    groups: dict[str, list[str]] = {}
    for name, fn in _QUERIES.items():
        groups.setdefault(fn.__module__, []).append(name)
    order: list[str] = []
    buckets = list(groups.values())
    i = 0
    while buckets:
        buckets = [b for b in buckets if b]
        for b in buckets:
            if i < len(b):
                order.append(b[i])
        buckets = [b for b in buckets if len(b) > i + 1]
        i += 1
    # Least-recently-verified first (see _last_verified_round): the driver
    # checks a prefix window, so this maximizes fresh external coverage
    # while still cycling re-verification over old passes once coverage is
    # complete. Ties (same round, incl. never-verified) keep the
    # module-interleaved order so any window samples every category.
    last = _last_verified_round()
    pos = {n: i for i, n in enumerate(order)}
    return sorted(order, key=lambda n: (*last.get(n, (0, 0)), pos[n]))


def all_queries() -> dict[str, QueryFn]:
    load_all()
    return {name: _QUERIES[name] for name in _module_round_robin_order()}


def all_oracles() -> dict[str, str]:
    load_all()
    order = _module_round_robin_order()
    return {name: _ORACLES[name] for name in order if name in _ORACLES}
