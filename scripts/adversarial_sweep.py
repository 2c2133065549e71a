#!/usr/bin/env python
"""Adversarial-values sweep: run every registered query against a tiny
fixture of degenerate-but-legal values.

Complements scripts/empty_sweep.py (0 rows): here every table HAS rows,
but the values sit on the edges no sampled fixture reaches — total ties
(all-equal prices, one shared timestamp), extreme skew (every order from
one customer), empty / whitespace-only / single-word / unicode document
text, zero and duplicated embedding vectors, invalid JSON in props,
orphan foreign keys. The target failure classes: divide-by-zero on
zero-range stats, argmin/rank instability on total ties, n-gram and
tokenizer paths on sub-threshold text, JSON parsing on malformed input,
and join plumbing on referential breaks.

Usage: python scripts/adversarial_sweep.py [name1 name2 ...]
"""

from __future__ import annotations

import datetime as dt
import os
import shutil
import sys
import tempfile
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow as pa
import pyarrow.parquet as pq

TS0 = dt.datetime(2024, 1, 15, 12, 0, 0)
D0 = dt.datetime(1997, 6, 1)


def make_fixture(dst: str) -> None:
    os.makedirs(dst, exist_ok=True)

    def w(name, cols, schema):
        pq.write_table(pa.table(cols, schema=schema), f"{dst}/{name}.parquet")

    w("region", {"r_regionkey": [0], "r_name": ["ONLY"]},
      pa.schema([("r_regionkey", pa.int32()), ("r_name", pa.string())]))

    # nation 1 points at a region that does not exist (referential break)
    w("nation",
      {"n_nationkey": [0, 1], "n_name": ["ZÜRICH", "東京"],
       "n_regionkey": [0, 99]},
      pa.schema([("n_nationkey", pa.int32()), ("n_name", pa.string()),
                 ("n_regionkey", pa.int32())]))

    # every customer in one nation; balances include 0 and a tie pair
    n_cust = 8
    w("customer",
      {"c_custkey": list(range(1, n_cust + 1)),
       "c_name": [f"Customer#{i}" for i in range(1, n_cust)] + ["Customer#1"],
       "c_nationkey": [0] * n_cust,
       "c_acctbal": [0.0, -10.0, 50.0, 50.0, 50.0, 50.0, 50.0, 50.0],
       "c_mktsegment": ["BUILDING"] * n_cust},
      pa.schema([("c_custkey", pa.int64()), ("c_name", pa.string()),
                 ("c_nationkey", pa.int32()), ("c_acctbal", pa.float64()),
                 ("c_mktsegment", pa.string())]))

    w("supplier",
      {"s_suppkey": [1, 2, 3], "s_name": ["S1", "S2", "S3"],
       "s_nationkey": [0, 0, 1], "s_acctbal": [0.0, 0.0, 0.0]},
      pa.schema([("s_suppkey", pa.int64()), ("s_name", pa.string()),
                 ("s_nationkey", pa.int32()), ("s_acctbal", pa.float64())]))

    w("part",
      {"p_partkey": [1, 2, 3], "p_name": ["p", "p", "p"],
       "p_brand": ["B#1"] * 3, "p_type": ["T"] * 3,
       "p_size": [0, 0, 0], "p_retailprice": [100.0, 100.0, 100.0]},
      pa.schema([("p_partkey", pa.int64()), ("p_name", pa.string()),
                 ("p_brand", pa.string()), ("p_type", pa.string()),
                 ("p_size", pa.int32()), ("p_retailprice", pa.float64())]))

    # extreme skew: 29 of 30 orders from customer 1, all same price+date
    # (total tie for min_by / percentiles / windows); one order in
    # another year so partitioned writes see >1 partition.
    n_ord = 30
    w("orders",
      {"o_orderkey": list(range(1, n_ord + 1)),
       "o_custkey": [1] * (n_ord - 1) + [2],
       "o_orderstatus": ["O"] * n_ord,
       "o_totalprice": [1000.0] * n_ord,
       "o_orderdate": [D0] * (n_ord - 1) + [dt.datetime(1998, 1, 1)],
       "o_orderpriority": ["1-URGENT"] * n_ord},
      pa.schema([("o_orderkey", pa.int64()), ("o_custkey", pa.int64()),
                 ("o_orderstatus", pa.string()), ("o_totalprice", pa.float64()),
                 ("o_orderdate", pa.timestamp("us")),
                 ("o_orderpriority", pa.string())]))

    # one hot orderkey, orphans (orderkey 999 not in orders),
    # discount 0 and 1 (revenue term -> 0), quantity 0, all dates equal
    n_li = 40
    ok = [1] * (n_li - 3) + [999, 999, 2]
    w("lineitem",
      {"l_orderkey": ok,
       "l_partkey": [1] * n_li,
       "l_suppkey": [1] * n_li,
       "l_linenumber": list(range(1, n_li + 1)),
       "l_quantity": [0.0] + [5.0] * (n_li - 1),
       "l_extendedprice": [100.0] * n_li,
       "l_discount": [1.0, 0.0] + [0.05] * (n_li - 2),
       "l_tax": [0.0] * n_li,
       "l_returnflag": ["N"] * n_li,
       "l_linestatus": ["O"] * n_li,
       "l_shipdate": [D0 + dt.timedelta(days=30)] * n_li},
      pa.schema([("l_orderkey", pa.int64()), ("l_partkey", pa.int64()),
                 ("l_suppkey", pa.int64()), ("l_linenumber", pa.int32()),
                 ("l_quantity", pa.float64()),
                 ("l_extendedprice", pa.float64()),
                 ("l_discount", pa.float64()), ("l_tax", pa.float64()),
                 ("l_returnflag", pa.string()), ("l_linestatus", pa.string()),
                 ("l_shipdate", pa.timestamp("us"))]))

    # one user, ONE shared timestamp (total tie), one event type,
    # all-equal values (stddev 0), props: valid / empty / malformed JSON
    n_ev = 24
    props = (['{"k": 1}'] * (n_ev - 4)) + ["", "{", "not json", "{}"]
    w("events",
      {"event_id": list(range(1, n_ev + 1)),
       "ts": [TS0] * n_ev,
       "user_id": [7] * n_ev,
       "event_type": ["signup"] * n_ev,
       "value": [42.0] * n_ev,
       "props": props},
      pa.schema([("event_id", pa.int64()), ("ts", pa.timestamp("us")),
                 ("user_id", pa.int64()), ("event_type", pa.string()),
                 ("value", pa.float64()), ("props", pa.string())]))

    # text edge cases; n_chars kept consistent with text
    texts = [
        "",                           # empty
        "   ",                        # whitespace only
        "word",                       # single word (< 5-gram threshold)
        "one two three four",         # exactly 4 words
        ("rep " * 200).strip(),       # one word repeated (1 distinct gram)
        "Ünïcode tëxt 漢字 emoji \U0001f600 done here now ok",
        ("the quick brown fox jumps over the lazy dog " * 30).strip(),
        ("the quick brown fox jumps over the lazy dog " * 30).strip(),  # dup
    ]
    w("documents",
      {"doc_id": list(range(1, len(texts) + 1)),
       "text": texts,
       "lang": ["en", "en", "xx", "en", "en", "zh", "en", "en"],
       "source": ["src0", "src0", "src1", "src1", "src1", "src1", "src1",
                  "src2"],
       "n_chars": [len(t_) for t_ in texts]},
      pa.schema([("doc_id", pa.int64()), ("text", pa.string()),
                 ("lang", pa.string()), ("source", pa.string()),
                 ("n_chars", pa.int64())]))

    # zero vector, duplicated vectors (cosine ties), one lonely label
    dim = 64
    zero = [0.0] * dim
    unit = [1.0] + [0.0] * (dim - 1)
    w("embeddings",
      {"vec_id": [0, 1, 2, 3, 4],
       "embedding": [zero, unit, unit, unit, [0.5] * dim],
       "label": [0, 0, 0, 0, 9]},
      pa.schema([("vec_id", pa.int64()),
                 ("embedding", pa.list_(pa.float32())),
                 ("label", pa.int32())]))


def make_null_fixture(dst: str) -> None:
    """A copy of the sf0.001 driver fixture with NULL-laden rows appended
    to every table: every parquet column is nullable, so NULLs are legal
    input this engine must survive — NULL text/embedding/props, NULL
    timestamps and prices, even NULL join/group keys (a NULL group is
    legal in both engines; NULL join keys simply never match).
    """
    os.makedirs(dst, exist_ok=True)
    src = "/root/testdata/sf0.001"
    extra = {
        "region": [{"r_regionkey": 90, "r_name": None}],
        "nation": [{"n_nationkey": 90, "n_name": None, "n_regionkey": None}],
        "customer": [
            {"c_custkey": 900001, "c_name": None, "c_nationkey": None,
             "c_acctbal": None, "c_mktsegment": None},
        ],
        "supplier": [
            {"s_suppkey": 900001, "s_name": None, "s_nationkey": None,
             "s_acctbal": None},
        ],
        "part": [
            {"p_partkey": 900001, "p_name": None, "p_brand": None,
             "p_type": None, "p_size": None, "p_retailprice": None},
        ],
        "orders": [
            {"o_orderkey": 900001, "o_custkey": None, "o_orderstatus": None,
             "o_totalprice": None, "o_orderdate": None,
             "o_orderpriority": None},
        ],
        "lineitem": [
            {"l_orderkey": None, "l_partkey": None, "l_suppkey": None,
             "l_linenumber": None, "l_quantity": None,
             "l_extendedprice": None, "l_discount": None, "l_tax": None,
             "l_returnflag": None, "l_linestatus": None, "l_shipdate": None},
        ],
        "events": [
            {"event_id": 900001, "ts": None, "user_id": None,
             "event_type": None, "value": None, "props": None},
            {"event_id": 900002, "ts": TS0, "user_id": 900002,
             "event_type": None, "value": None, "props": None},
        ],
        "documents": [
            {"doc_id": 900001, "text": None, "lang": None, "source": None,
             "n_chars": None},
            {"doc_id": 900002, "text": "some real text here for company",
             "lang": None, "source": None, "n_chars": 31},
        ],
        "embeddings": [
            {"vec_id": 900001, "embedding": None, "label": None},
            {"vec_id": 900002, "embedding": [None] * 64, "label": 0},
        ],
    }
    for name, rows in extra.items():
        base = pq.read_table(f"{src}/{name}.parquet")
        add = pa.Table.from_pylist(rows, schema=base.schema)
        pq.write_table(pa.concat_tables([base, add]), f"{dst}/{name}.parquet")


def main() -> None:
    from pyspark.sql import SparkSession

    if sys.argv[1:2] == ["--nulls"]:
        del sys.argv[1]
        dst = tempfile.mkdtemp(prefix="adv-null-sf-")
        make_null_fixture(dst)
    else:
        dst = tempfile.mkdtemp(prefix="adv-sf-")
        make_fixture(dst)

    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as mod

    qs = mod.queries()
    only = sys.argv[1:]
    if only:
        qs = {n: qs[n] for n in only}

    ok, failed = 0, []
    for name, fn in qs.items():
        t0 = time.time()
        try:
            rows = fn(spark, dst).collect()
            ok += 1
            print(f"ok    {name}: {len(rows)} rows ({time.time()-t0:.1f}s)", flush=True)
        except Exception:
            failed.append(name)
            msg = traceback.format_exc().strip().splitlines()[-1]
            print(f"FAIL  {name}: {msg[:300]}", flush=True)
    print(f"\n{ok} ok / {len(failed)} failed of {len(qs)}", flush=True)
    if failed:
        print("failed:", " ".join(failed))
    shutil.rmtree(dst, ignore_errors=True)
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
