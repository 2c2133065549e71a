"""Mid-scale IVF recall: CI-reachable guard for the corpus-adaptive
nprobe curve (r6 VERDICT item 6).

The round-6 sf10 probe measured IVF recall@5 decaying with corpus size
at FIXED nprobe (0.62 at 200k isotropic vectors) and fixed it with
``_ivf_nprobe`` scaling probes as ``4 * (n / 20k)^0.3``. That probe
lives in a gitignored scratch fixture, so nothing committed would trip
if the scaling were dropped or mis-tuned. This test regenerates the
failure condition deterministically in-test — 50k ISOTROPIC vectors,
the worst case for IVF (no cluster structure, true neighbors spread
across cell boundaries) — and asserts:

  * the adaptive curve actually engages above the 20k reference corpus
    (unit check on ``_ivf_nprobe`` values at the measured scales), and
  * end-to-end recall@5 vs exact brute force holds the 0.8 contract
    floor at 50k.

Writing this test CAUGHT a real defect in the r6 curve: its
exponent-only form gave nprobe=5 at 50k, which measures 0.70 recall on
this fixture — below the floor. The in-test sweep (nprobe 5/6/7/8 ->
0.70/0.76/0.82/0.86) showed recall is probed-fraction-driven and nearly
flat in corpus size for unstructured vectors, so the curve now floors
at 7 above the clustered-fixture regime (see _ivf_nprobe).

Runtime: ~40 s at local[4] (brute force is 10 queries x 50k corpus).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from muurschilderingendatabase_etl_spark.queries.similarity import (
    _ivf_nprobe,
    _ivf_topk,
    similarity_topk_bruteforce,
)

N_VECS = 50_000
DIM = 64
SEED = 20260815


def test_ivf_nprobe_curve():
    # At/below the 20k reference corpus the base nprobe holds.
    assert _ivf_nprobe(500) == 4
    assert _ivf_nprobe(20_000) == 4
    # Above it: floor 7 (smallest nprobe >= 0.8 at every measured
    # scale), growing to the cap of 10 (0.96 at 200k; recall is ~flat
    # in n, so more cells buy little and cost linearly).
    assert _ivf_nprobe(50_000) == 7
    assert _ivf_nprobe(200_000) == 8
    assert _ivf_nprobe(2_000_000) == 10  # capped
    # Monotone non-decreasing over two decades.
    probes = [_ivf_nprobe(n) for n in (1_000, 20_000, 50_000, 200_000, 1_000_000)]
    assert probes == sorted(probes)


@pytest.fixture(scope="module")
def midscale_dir(tmp_path_factory):
    """50k isotropic float32 vectors written as embeddings.parquet —
    the same distribution family as the testdata generator, at 100x the
    sf0.01 corpus, regenerated deterministically so the fixture never
    needs committing."""
    rng = np.random.RandomState(SEED)
    vecs = rng.normal(size=(N_VECS, DIM)).astype(np.float32)
    table = pa.table(
        {
            "vec_id": pa.array(np.arange(N_VECS), type=pa.int64()),
            "embedding": pa.array(list(vecs), type=pa.list_(pa.float32())),
            "label": pa.array(
                (np.arange(N_VECS) % 10).astype(np.int32), type=pa.int32()
            ),
        }
    )
    d = tmp_path_factory.mktemp("ivf_midscale")
    pq.write_table(table, d / "embeddings.parquet")
    return str(d)


def _topk_sets(df):
    out: dict[int, set[int]] = {}
    for r in df.collect():
        out.setdefault(r["q_id"], set()).add(r["vec_id"])
    return out


def test_ivf_midscale_recall(spark, midscale_dir):
    exact = _topk_sets(similarity_topk_bruteforce(spark, midscale_dir))
    approx = _topk_sets(_ivf_topk(spark, midscale_dir))
    assert set(exact) == set(approx)
    hits = sum(len(exact[q] & approx[q]) for q in exact)
    total = sum(len(exact[q]) for q in exact)
    recall = hits / total
    # Contract floor 0.8; the floored curve (nprobe=7) measures 0.82 on
    # this seed, the r6 exponent-only curve (nprobe=5) measured 0.70 —
    # the floor separates the two, so dropping or mis-tuning the
    # adaptive curve fails here, in CI, instead of in a future
    # at-scale probe.
    assert recall >= 0.8, f"mid-scale IVF recall collapsed: {recall:.2f}"
