"""Dedup-specific guards beyond the generic oracle-parity suite."""

from __future__ import annotations

from muurschilderingendatabase_etl_spark.queries.dedup import _SHINGLE_ORACLE


def test_minhash_lsh_fixture_margin(ddb):
    """LSH recall at τ=0.9 is probabilistic: with 8 bands × 2 rows the
    per-true-pair miss probability is (1-s²)^8 ≤ (0.19)^8 ≈ 1.7e-6. The
    parity gate (LSH output == exact all-pairs oracle) is deterministic
    for FIXED fixtures (xxhash64 seeds are constants), but a fixture
    refresh could add near-dup pairs; this guard keeps the union bound
    negligible — 500 pairs × 1.7e-6 < 1e-3 — so a refresh that breaks
    the assumption fails loudly HERE, not as a mystery hash-mismatch.
    """
    n_pairs = ddb.sql(
        f"SELECT COUNT(*) AS n FROM ({_SHINGLE_ORACLE})"
    ).fetchone()[0]
    assert n_pairs <= 500, (
        f"fixture has {n_pairs} true near-dup pairs; union-bound miss "
        "probability no longer negligible — add a guaranteed-candidate "
        "pass to dedup_minhash_lsh or re-shrink the fixture"
    )
