#!/usr/bin/env python
"""One-off sf10 verification for the three pair-mining queries
(dedup_ngram_jaccard, dedup_minhash_lsh, dedup_connected_components).

Their REGISTERED oracles are honest all-pairs joins with per-pair
list_intersect — the clearest spec, but O(block² · doclen) in DuckDB:
hours at sf10 (25k docs per source block / 500k docs global). This
script re-derives each oracle with a PREFIX-FILTER candidate stage
(Bayardo et al., "Scaling Up All Pairs Similarity Search", WWW'07 —
public literature, and a DIFFERENT algorithm from the Spark side's
pigeonhole partition signatures, so cross-checking power is kept):

  Under any fixed global token order, Jaccard(A,B) >= t implies
  |A∩B| >= ceil(t·|B|) =: α — and α common tokens cannot all sit in
  B's last α-1 positions, so at least one common token lies in B's
  first |B| - α + 1 tokens ("prefix"). Joining every doc's prefix
  tokens (rarest-first order makes them low-frequency) against ALL
  tokens of other docs therefore finds every qualifying pair; the
  exact list_intersect verify then runs only on those candidates, so
  the emitted VALUES are computed exactly as the registered oracle
  computes them.

The fast-form <-> all-pairs-form identity is proven on real sf0.01
data in tests/test_invariants.py for all three queries.

Usage: python scripts/pairminer_sf10_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _fast_pairs_sql(threshold: float, shingles: bool, per_source: bool) -> str:
    """Candidate pairs via prefix filtering + exact jaccard verify.

    Emits (doc_a, doc_b, jaccard) for pairs meeting the threshold —
    value-identical to the registered all-pairs form because the final
    jaccard is the same list_intersect expression on the same lists.
    """
    if shingles:
        units = """
    units AS (
      SELECT doc_id, source,
             list_distinct(list_transform(
               generate_series(1, len(w) - 2),
               i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]
             )) AS u
      FROM (SELECT doc_id, source, string_split(text, ' ') AS w
            FROM documents)
      WHERE len(w) >= 3
    )"""
    else:
        units = """
    units AS (
      SELECT doc_id, source, list_distinct(string_split(text, ' ')) AS u
      FROM documents
    )"""
    blk = "a.source = b.source AND" if per_source else ""
    blk_tok = "p.source = t.source AND" if per_source else ""
    return f"""
    WITH {units},
    tok AS (
      SELECT doc_id, source, un.tk AS tk, len(u) AS nu
      FROM units, UNNEST(u) un(tk)
    ),
    df AS (SELECT tk, COUNT(*) AS df FROM tok GROUP BY tk),
    ranked AS (
      SELECT tok.doc_id, tok.source, tok.tk, tok.nu,
             row_number() OVER (
               PARTITION BY tok.doc_id ORDER BY df.df, tok.tk
             ) AS rn
      FROM tok JOIN df USING (tk)
    ),
    prefix AS (
      -- first |u| - ceil(t*|u|) + 1 tokens in rarest-first order.
      -- The 1e-9 guard keeps binary-inexact products (0.8*5 =
      -- 4.0000000000000002) from CEILing one slot too high, which
      -- would shorten the prefix and drop qualifying pairs (r7 ADVICE).
      SELECT doc_id, source, tk FROM ranked
      WHERE rn <= nu - CEIL({threshold} * nu - 1e-9) + 1
    ),
    cand AS (
      SELECT DISTINCT LEAST(p.doc_id, t.doc_id) AS doc_a,
                      GREATEST(p.doc_id, t.doc_id) AS doc_b
      FROM prefix p JOIN tok t
        ON {blk_tok} p.tk = t.tk AND p.doc_id <> t.doc_id
    ),
    verified AS (
      SELECT c.doc_a, c.doc_b,
             CAST(len(list_intersect(a.u, b.u)) AS DOUBLE)
               / len(list_distinct(list_concat(a.u, b.u))) AS j
      FROM cand c
      JOIN units a ON a.doc_id = c.doc_a
      JOIN units b ON b.doc_id = c.doc_b
      WHERE {blk} TRUE
    )
    SELECT doc_a, doc_b, ROUND(j, 6) AS jaccard
    FROM verified WHERE j >= {threshold}
    """


def fast_oracle_sql(name: str) -> str:
    if name == "dedup_ngram_jaccard":
        return _fast_pairs_sql(0.95, shingles=False, per_source=True)
    if name == "dedup_minhash_lsh":
        return _fast_pairs_sql(0.9, shingles=True, per_source=False)
    if name == "dedup_connected_components":
        pairs = _fast_pairs_sql(0.95, shingles=False, per_source=True)
        return f"""
    WITH RECURSIVE base AS ({pairs}),
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM base
      UNION ALL
      SELECT doc_b AS src, doc_a AS dst FROM base
    ),
    reach(node, r) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.src, reach.r
      FROM edges e JOIN reach ON reach.node = e.dst
    )
    SELECT node AS doc_id, CAST(MIN(r) AS BIGINT) AS component
    FROM reach
    GROUP BY node
    """
    raise KeyError(name)


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scratch/real-sf10"
    names = sys.argv[2:] or [
        "dedup_ngram_jaccard",
        "dedup_minhash_lsh",
        "dedup_connected_components",
    ]

    import duckdb
    import pandas as pd

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.master("local[32]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as mod

    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")

    def canon(df: pd.DataFrame) -> pd.DataFrame:
        df = df[sorted(df.columns)].round(6)
        return df.sort_values(list(df.columns)).reset_index(drop=True)

    failed = []
    for name in names:
        spdf = canon(mod.queries()[name](spark, sf).toPandas())
        if name == "dedup_connected_components":
            # Materialize the pair mining ONCE: inlined in the recursive
            # CTE, DuckDB re-evaluates the multiply-referenced units/tok
            # CTEs and ground 35+ min at sf10; as a temp table the pairs
            # cost is paid once and the closure runs on ~1k edges.
            con.sql(
                "CREATE OR REPLACE TEMP TABLE cc_pairs AS "
                + fast_oracle_sql("dedup_ngram_jaccard")
            )
            odf = canon(con.sql("""
    WITH RECURSIVE edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM cc_pairs
      UNION ALL
      SELECT doc_b AS src, doc_a AS dst FROM cc_pairs
    ),
    reach(node, r) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.src, reach.r
      FROM edges e JOIN reach ON reach.node = e.dst
    )
    SELECT node AS doc_id, CAST(MIN(r) AS BIGINT) AS component
    FROM reach GROUP BY node
            """).df())
            same = len(spdf) == len(odf) and spdf.equals(odf)
            print(f"{name}: spark rows={len(spdf)} oracle rows={len(odf)} "
                  f"match={same}")
            if not same:
                failed.append(name)
            continue
        odf = canon(con.sql(fast_oracle_sql(name)).df())
        same = len(spdf) == len(odf) and spdf.equals(odf)
        print(f"{name}: spark rows={len(spdf)} oracle rows={len(odf)} "
              f"match={same}")
        if not same:
            failed.append(name)
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
