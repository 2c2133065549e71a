#!/usr/bin/env python
"""Planted near-dup recall probe for `gen_sf.py --corpus realistic`
fixtures.

Runs dedup_ngram_jaccard against the fixture dir and checks that every
pair recorded in the generator's planted_neardups.json sidecar is
found (the planted pairs are constructed with word-set Jaccard >= 0.951
and the dup's source forced equal to the original's, so a lossless
candidate scheme must recall all of them).

Usage: python scripts/check_planted_recall.py /path/to/fixture-dir
Exits 0 and prints `recall=1.0 …` on success; nonzero with the missing
pairs otherwise.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    fixture = sys.argv[1]
    planted = json.load(open(os.path.join(fixture, "planted_neardups.json")))
    pl = {
        (min(p["doc_a"], p["doc_b"]), max(p["doc_a"], p["doc_b"]))
        for p in planted
    }

    from muurschilderingendatabase_etl_spark.queries.dedup import (
        dedup_ngram_jaccard,
    )
    from muurschilderingendatabase_etl_spark.session import get_spark

    spark = get_spark(app_name="planted-recall")
    spark.sparkContext.setLogLevel("ERROR")
    got = {
        (r.doc_a, r.doc_b) for r in dedup_ngram_jaccard(spark, fixture).collect()
    }
    missing = pl - got
    recall = 1.0 - len(missing) / max(len(pl), 1)
    print(
        f"planted={len(pl)} found={len(pl) - len(missing)} "
        f"recall={recall:.4f} total_pairs_reported={len(got)}"
    )
    if missing:
        print(f"MISSING: {sorted(missing)[:20]}")
        sys.exit(1)


if __name__ == "__main__":
    main()
