"""Local replica of the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB at
sf0.01 and compare row counts, column names and values exactly
(order-insensitive, like the driver's value-hash)."""

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return con


def _norm(v):
    if v is None:
        # CUBE/grouping-set rows carry NULL keys; stringify so mixed
        # None/str columns stay sortable (identical on both engines)
        return "\x00null"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.6g}"
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    return v


ORACLES = entrymod.oracle_sql()
QUERIES = entrymod.queries()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, ddb, name):
    sdf = QUERIES[name](spark, SF_DIR)
    cols = sdf.columns
    got = sorted(
        (tuple(_norm(v) for v in row) for row in sdf.collect()), key=repr
    )

    res = ddb.execute(ORACLES[name])
    ocols = [d[0] for d in res.description]
    exp = sorted(
        (tuple(_norm(v) for v in row) for row in res.fetchall()), key=repr
    )

    assert sorted(cols) == sorted(ocols), (cols, ocols)
    assert len(got) == len(exp)
    assert got == exp


def test_rows_only_queries_run(spark):
    for name in sorted(set(QUERIES) - set(ORACLES)):
        df = QUERIES[name](spark, SF_DIR)
        assert df.count() > 0, name


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert "question_number" in df.columns
