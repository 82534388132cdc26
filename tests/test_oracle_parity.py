"""Replicates the driver's Spark-vs-DuckDB comparison for every query that
declares an oracle: row count, column names, and an order-insensitive
value hash over columns sorted by name (see /root/repo/__spark_entry__.py
docstring for the contract).

Round-4 hardening (VERDICT r3 item 2): canonicalization is now
DRIVER-FAITHFUL — the result rows go through a pandas DataFrame
``sort_values`` over the name-sorted columns, exactly the operation the
driver's canonicalizer performs. pandas factorizes object columns to sort
them, so a non-scalar cell (list/dict) raises ``TypeError: unhashable
type`` here the same way it did in the driver's CORRECTNESS_r03 run for
q_tfidf_vectors; the old ``str()``-based hash silently swallowed that
class of bug. A scalar-only output-schema assertion backs it up at the
type level for all 107 queries.
"""

import hashlib

import duckdb
import pandas as pd
import pytest
from pyspark.sql import types as T

from modern_document_converter_for_ai_library_spark.queries import ORACLE_SQL, SPARK_QUERIES

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

_COMPLEX = (T.ArrayType, T.MapType, T.StructType)


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
    if v is None or v is pd.NA or (isinstance(v, float) and pd.isna(v)):
        return "<null>"
    if isinstance(v, bool):
        return str(v).lower()
    if isinstance(v, float):
        return repr(round(v, 9))
    return str(v)


def _driver_frame(cols, rows):
    """The driver's canonicalization: pandas frame, columns sorted by
    name, sort_values over ALL columns (raw values — this is the step
    that raises TypeError on list/dict cells, which is the point)."""
    df = pd.DataFrame(rows, columns=list(cols), dtype=object)
    df = df[sorted(df.columns)]
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def _value_hash(cols, rows):
    df = _driver_frame(cols, rows)
    h = hashlib.sha256()
    for row in df.itertuples(index=False, name=None):
        h.update("|".join(_canon(v) for v in row).encode())
        h.update(b"\n")
    return h.hexdigest()


@pytest.mark.parametrize("name", sorted(ORACLE_SQL))
def test_query_matches_oracle(spark, duck, name):
    sdf = SPARK_QUERIES[name](spark, SF_DIR)

    # Contract-schema gate: the driver canonicalizer can only hash scalar
    # cells; any Array/Map/Struct output column is a red CORRECTNESS row
    # waiting to happen (q_tfidf_vectors, round 3). Serialize in the
    # contract query (concat_ws / md5), keep the rich type in the operator.
    complex_cols = [
        f.name for f in sdf.schema.fields if isinstance(f.dataType, _COMPLEX)
    ]
    assert not complex_cols, (
        f"{name}: non-scalar output column(s) {complex_cols} — the driver "
        "canonicalizer cannot hash these; serialize to a scalar in the "
        "contract query"
    )

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


def test_driver_canon_rejects_list_cells():
    # regression pin for the round-3 failure mode: the canonicalizer must
    # fail loudly on non-scalar cells, not silently str() them
    with pytest.raises(TypeError):
        _value_hash(["a", "v"], [(1, [1, 2]), (2, [3, 4])])
