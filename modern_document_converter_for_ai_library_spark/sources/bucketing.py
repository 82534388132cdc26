"""Bucketed table layout — shuffle-free co-located joins at corpus scale.

The manifest/lineage and per-doc metadata tables join the corpus on
``doc_id`` over and over (resume anti-joins, code linkage, quality-flag
attachment). At 100 TB each such join is a full shuffle of the corpus
UNLESS both sides are written bucketed by the join key with the same
bucket count: then every bucket pairs 1:1 with its partner and the
sort-merge join runs with NO Exchange on either side — the join cost
becomes a co-partitioned local merge.

This is the Spark-native equivalent of the pre-partitioned layouts the
north rule asks for ("partitioning / shuffle / skew handled explicitly"):
pay one layout-time shuffle at write, amortize it over every subsequent
join. tests/test_bucketing.py asserts the no-Exchange plan property
mechanically.

Bucket-count guidance at scale: buckets are the unit of join parallelism
AND of file layout (one file per bucket per write task) — pick
``n_buckets`` ~ cluster cores at the target SF, and keep it IDENTICAL for
every table that joins on the key (mismatched counts re-shuffle one side).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str = "doc_id",
    n_buckets: int = 32,
    path: str | None = None,
    sort: bool = True,
) -> None:
    """Write ``df`` as a parquet table bucketed (and by default sorted)
    by ``bucket_col``. ``path`` makes it an external table."""
    w = (
        df.write.format("parquet")
        .mode("overwrite")
        .bucketBy(n_buckets, bucket_col)
    )
    if sort:
        w = w.sortBy(bucket_col)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str = "doc_id"
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key. The plan is a
    sort-merge join with zero Exchange nodes when both tables were written
    by ``write_bucketed`` with equal bucket counts."""
    return spark.table(left_table).join(spark.table(right_table), on=on)
