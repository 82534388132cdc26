"""Replicates the driver's Spark-vs-DuckDB comparison for every query that
declares an oracle: row count, column names, and an order-insensitive
value hash over columns sorted by name (see /root/repo/__spark_entry__.py
docstring for the contract)."""

import hashlib

import duckdb
import pytest

from modern_document_converter_for_ai_library_spark.queries import ORACLE_SQL, SPARK_QUERIES

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            "CREATE VIEW %s AS SELECT * FROM read_parquet('%s/%s.parquet')"
            % (t, SF_DIR, t)
        )
    yield con
    con.close()


def _canon(v):
    if v is None:
        return "<null>"
    if isinstance(v, bool):
        return str(v).lower()
    if isinstance(v, float):
        return repr(round(v, 9))
    return str(v)


def _value_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(_canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


@pytest.mark.parametrize("name", sorted(ORACLE_SQL))
def test_query_matches_oracle(spark, duck, name):
    sdf = SPARK_QUERIES[name](spark, SF_DIR)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    res = duck.execute(ORACLE_SQL[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), f"{name}: column names differ"
    assert len(spark_rows) == len(duck_rows), f"{name}: row count differs"
    assert _value_hash(spark_cols, spark_rows) == _value_hash(duck_cols, duck_rows), (
        f"{name}: value hash differs; spark sample={spark_rows[:3]} "
        f"duck sample={duck_rows[:3]}"
    )


def test_all_queries_have_entries():
    # every oracle key must exist in the spark registry
    assert set(ORACLE_SQL) <= set(SPARK_QUERIES)
