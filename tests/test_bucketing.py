"""Plan-level proof of the bucketed co-located join: writing both sides
bucketed by the join key removes every Exchange from the join plan, while
the identical unbucketed join shuffles both sides."""

import pytest
from pyspark.sql import functions as F

from modern_document_converter_for_ai_library_spark.sources.bucketing import (
    bucketed_join,
    write_bucketed,
)


@pytest.fixture()
def no_broadcast(spark):
    """Force sort-merge joins so the Exchange assertion is about
    co-location, not broadcast."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_exchange(spark, tmp_path, no_broadcast):
    docs = spark.range(5000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 100).alias("n_chars")
    )
    meta = spark.range(5000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 7).alias("flag")
    )
    try:
        write_bucketed(docs, "b_docs", n_buckets=8, path=str(tmp_path / "d"))
        write_bucketed(meta, "b_meta", n_buckets=8, path=str(tmp_path / "m"))

        joined = bucketed_join(spark, "b_docs", "b_meta")
        assert joined.count() == 5000
        plan = _executed_plan(joined)
        assert "Exchange" not in plan, plan

        # control: the same join over the raw DataFrames shuffles
        control = docs.join(meta, on="doc_id")
        assert control.count() == 5000
        assert "Exchange" in _executed_plan(control)
    finally:
        spark.sql("DROP TABLE IF EXISTS b_docs")
        spark.sql("DROP TABLE IF EXISTS b_meta")


def test_bucketed_join_values_match_plain_join(spark, tmp_path, no_broadcast):
    docs = spark.range(1000).select(
        F.col("id").alias("doc_id"), (F.col("id") * 3).alias("x")
    )
    meta = spark.range(0, 1000, 2).select(
        F.col("id").alias("doc_id"), (F.col("id") + 1).alias("y")
    )
    try:
        write_bucketed(docs, "bv_docs", n_buckets=4, path=str(tmp_path / "d"))
        write_bucketed(meta, "bv_meta", n_buckets=4, path=str(tmp_path / "m"))
        got = sorted(
            tuple(r) for r in bucketed_join(spark, "bv_docs", "bv_meta").collect()
        )
        want = sorted(tuple(r) for r in docs.join(meta, on="doc_id").collect())
        assert got == want and len(got) == 500
    finally:
        spark.sql("DROP TABLE IF EXISTS bv_docs")
        spark.sql("DROP TABLE IF EXISTS bv_meta")


def test_mismatched_bucket_counts_reshuffle_one_side(spark, tmp_path, no_broadcast):
    """Documenting the sharp edge the module docstring warns about."""
    docs = spark.range(2000).select(F.col("id").alias("doc_id"))
    meta = spark.range(2000).select(F.col("id").alias("doc_id"))
    try:
        write_bucketed(docs, "mm_docs", n_buckets=8, path=str(tmp_path / "d"))
        write_bucketed(meta, "mm_meta", n_buckets=4, path=str(tmp_path / "m"))
        plan = _executed_plan(bucketed_join(spark, "mm_docs", "mm_meta"))
        assert "Exchange" in plan
    finally:
        spark.sql("DROP TABLE IF EXISTS mm_docs")
        spark.sql("DROP TABLE IF EXISTS mm_meta")
