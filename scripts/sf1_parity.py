#!/usr/bin/env python
"""Reproduce the round-6 sf1 oracle-parity sweep.

Stage 1 — full sf1 (fixtures from ``gen_sf.py --sf 1``): every oracle
except the three whose DuckDB side is quadratic-infeasible at full sf1
(dedup_ngram_jaccard / dedup_minhash_lsh ran >10 min mining all-pairs
per source; dedup_connected_components adds a recursive CTE on top).

Stage 2 — single-source restriction for those three: documents filtered
to source='src0' (~2.4k docs at sf1), other tables symlinked. The
pair-mining cost is per-block (same-source pairs only), so one block at
sf1 density exercises exactly the per-block workload the operator would
see at full sf1 while dividing the DuckDB side by the block count.
(join_fuzzy_levenshtein needs no restriction: its oracle is
prefix-blocked on customer and runs at full sf1 in ~17 s.)

Usage:
    python scripts/gen_sf.py --sf 1 --out /root/repo/.scratch/sf1
    python scripts/sf1_parity.py [--sf1-dir /root/repo/.scratch/sf1]

Round-6 result: 182/182 oracles green at sf1 scale (179 + 2 embedding
+ fuzzy at full sf1; the three pair-miners at block density; the one
initial failure — timeseries_resample_ffill's round-then-ffill
amplification — was a real defect, fixed in the same round). The same
sweep was repeated green on the realistic Zipf-Mandelbrot corpus
(``gen_sf.py --corpus realistic``, ``.scratch/real-sf1``) — both
stages, both generators.
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

BLOCK_RESTRICTED = [
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_connected_components",
]


def make_src0_fixture(sf1_dir: str) -> str:
    import duckdb

    dst = sf1_dir.rstrip("/") + "-src0"
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    con.sql(
        f"COPY (SELECT * FROM '{sf1_dir}/documents.parquet' "
        f"WHERE source = 'src0') TO '{dst}/documents.parquet' "
        f"(FORMAT PARQUET)"
    )
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "embeddings",
    ]:
        p = os.path.join(dst, f"{t}.parquet")
        if not os.path.exists(p):
            os.symlink(os.path.join(sf1_dir, f"{t}.parquet"), p)
    return dst


def run_pytest(sf_dir: str, args: list[str]) -> int:
    env = dict(os.environ, PARITY_SF_DIR=sf_dir)
    return subprocess.call(
        [sys.executable, "-m", "pytest", "-q", *args], cwd=REPO, env=env
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf1-dir", default="/root/repo/.scratch/sf1")
    args = ap.parse_args()

    deselect = [
        f"--deselect=tests/test_oracle_parity.py::test_oracle_parity[{q}]"
        for q in BLOCK_RESTRICTED
    ]
    rc1 = run_pytest(args.sf1_dir, ["tests/test_oracle_parity.py", *deselect])

    src0 = make_src0_fixture(args.sf1_dir)
    sel = [
        f"tests/test_oracle_parity.py::test_oracle_parity[{q}]"
        for q in BLOCK_RESTRICTED
    ]
    rc2 = run_pytest(src0, sel)
    sys.exit(rc1 or rc2)


if __name__ == "__main__":
    main()
