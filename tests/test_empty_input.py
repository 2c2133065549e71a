"""Degenerate-input sweep: every registered query must run on a 0-row
fixture (same schemas, no data) without crashing.

At 100 TB an empty slice is routine — a day with no events, a source
with no documents, an ingest batch with no embeddings yet. The failure
modes are exactly the paths no oracle fixture exercises: ANSI
DIVIDE_BY_ZERO on empty global aggregates, driver-side scalars (1/n
rank seed, k-means training sample) computed from an empty collect,
and schema inference on a parquet read-back that wrote zero files.
The round-7 sweep caught five of these (funnel_signup_purchase,
graph_pagerank_fixed, similarity_ivf_ann, sink_partitioned_pruning,
join_dynamic_partition_pruning); this test pins all 186.
"""

from __future__ import annotations

import os
import shutil
import tempfile

import pyarrow.parquet as pq
import pytest

from muurschilderingendatabase_etl_spark.tables import TABLES

SRC = os.environ.get("PARITY_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def empty_sf_dir():
    dst = tempfile.mkdtemp(prefix="msdb_empty_sf_")
    for name in TABLES:
        schema = pq.read_schema(f"{SRC}/{name}.parquet")
        pq.write_table(schema.empty_table(), f"{dst}/{name}.parquet")
    yield dst
    shutil.rmtree(dst, ignore_errors=True)


def test_every_query_survives_empty_input(spark, empty_sf_dir):
    import __spark_entry__ as mod

    failures: dict[str, str] = {}
    for name, fn in mod.queries().items():
        try:
            fn(spark, empty_sf_dir).collect()
        except Exception as e:  # noqa: BLE001 — collecting all failures
            failures[name] = f"{type(e).__name__}: {str(e).splitlines()[0][:200]}"
    assert not failures, f"{len(failures)} queries crash on empty input: {failures}"
