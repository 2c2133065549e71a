from __future__ import annotations

import os

import duckdb
import pytest

from muurschilderingendatabase_etl_spark.session import get_spark
from muurschilderingendatabase_etl_spark.tables import TABLES

# sf0.001 keeps the local loop fast; the driver re-checks at sf0.01.
SF_DIR = os.environ.get("PARITY_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="tests",
        master="local[4]",
        shuffle_partitions=4,
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def ddb():
    con = duckdb.connect()
    for name in TABLES:
        con.sql(
            f"CREATE VIEW {name} AS SELECT * FROM '{SF_DIR}/{name}.parquet'"
        )
    yield con
    con.close()
