"""Algebraic invariants of the pipeline operators (SURVEY §5.2 item 3
extended to the LLM-data surface). These catch a class of bug the
value-parity oracle can't: a query whose output is plausible but whose
operator violates the property users build pipelines on.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from muurschilderingendatabase_etl_spark import registry
from muurschilderingendatabase_etl_spark.tables import t
from tests.conftest import SF_DIR


def test_exact_dedup_idempotent(spark):
    # dedup(dedup(x)) == dedup(x): the keep-first content-hash pass over
    # its own output must be a fixed point (same operation as
    # dedup_exact_hash before its reporting rollup).
    docs = t(spark, SF_DIR, "documents").withColumn("h", F.sha2("text", 256))
    once = docs.dropDuplicates(["h"])
    again = once.dropDuplicates(["h"])
    assert once.count() == again.count() == docs.select("h").distinct().count()
    assert once.select("h").exceptAll(again.select("h")).count() == 0


def test_quality_gates_partition_documents(spark):
    # Every document lands in exactly one pass/fail bucket: n_pass <=
    # n_docs per source and totals reconcile with the table.
    rows = registry.all_queries()["quality_gopher_gates"](spark, SF_DIR).collect()
    n_total = t(spark, SF_DIR, "documents").count()
    assert sum(r["n_docs"] for r in rows) == n_total
    assert all(0 <= r["n_pass"] <= r["n_docs"] for r in rows)


def test_length_band_keeps_interior(spark):
    # The percentile band filter must keep a strict subset per language
    # and never widen the min/max envelope.
    kept = {
        r["lang"]: r
        for r in registry.all_queries()["quality_length_band_filter"](
            spark, SF_DIR
        ).collect()
    }
    full = {
        r["lang"]: r
        for r in t(spark, SF_DIR, "documents")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("n_chars").alias("mn"),
            F.max("n_chars").alias("mx"),
        )
        .collect()
    }
    for lang, k in kept.items():
        f = full[lang]
        assert k["n_kept"] <= f["n"]
        assert k["min_chars"] >= f["mn"]
        assert k["max_chars"] <= f["mx"]


def test_hash_sample_is_subset_and_stable(spark):
    # Deterministic sampling: same selection on re-run, and the sampled
    # token mass never exceeds the stratum's.
    q = registry.all_queries()["sample_hash_stratified"]
    a = {r["lang"]: (r["n_sampled"], r["sum_chars"]) for r in q(spark, SF_DIR).collect()}
    b = {r["lang"]: (r["n_sampled"], r["sum_chars"]) for r in q(spark, SF_DIR).collect()}
    assert a == b
    full = {
        r["lang"]: (r["n"], r["sc"])
        for r in t(spark, SF_DIR, "documents")
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("n_chars").alias("sc"))
        .collect()
    }
    for lang, (n, sc) in a.items():
        assert n <= full[lang][0] and sc <= full[lang][1]


def test_upsert_latest_wins_bounds(spark):
    # The merged view never contains more rows per key than 1: total
    # reconciled count == distinct upsert keys of the unioned input.
    ev = t(spark, SF_DIR, "events")
    base_keys = ev.where(F.col("event_id") % 3 != 0).select("event_id")
    delta_keys = ev.where(F.col("event_id") % 5 == 0).select("event_id")
    n_keys = base_keys.union(delta_keys).distinct().count()
    rows = registry.all_queries()["pipeline_incremental_upsert"](
        spark, SF_DIR
    ).collect()
    assert sum(r["n"] for r in rows) == n_keys


def test_sessionize_conservation(spark):
    # Sessionization conserves events: histogram mass equals the events
    # row count, and no session can span more rows than its user has.
    rows = registry.all_queries()["window_sessionize_gaps"](spark, SF_DIR).collect()
    n_events = t(spark, SF_DIR, "events").count()
    assert sum(r["n_events"] * r["n_sessions"] for r in rows) == n_events


def test_contamination_subset_of_other_sources(spark):
    # Contaminated docs are a subset of non-benchmark docs per source.
    rows = registry.all_queries()["contamination_ngram_overlap"](
        spark, SF_DIR
    ).collect()
    per_source = {
        r["source"]: r["n"]
        for r in t(spark, SF_DIR, "documents")
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for r in rows:
        assert r["source"] != "src0"
        assert 0 < r["n_contaminated_docs"] <= per_source[r["source"]]
