"""group_sample (operators/sampling.py): fixed-size per-group bottom-k
sampling — determinism under recompute, exact equivalence to the
single-window form at salt boundaries, and the min-k MERGE law (bottom-k
of unioned per-shard samples == bottom-k of the unioned raw data)."""

from pyspark.sql import Window
from pyspark.sql import functions as F

from modern_document_converter_for_ai_library_spark.operators.sampling import (
    group_sample,
)


def _corpus(spark, n=200):
    rows = [(i, "g%d" % (i % 5)) for i in range(n)]
    return spark.createDataFrame(rows, ["doc_id", "source"])


def _single_window(df, k=3):
    h = F.md5(F.col("doc_id").cast("string"))
    w = Window.partitionBy("source").orderBy(h, "doc_id")
    return (
        df.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= k)
        .select("source", "doc_id", F.col("sample_rank").cast("bigint").alias("sample_rank"))
    )


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_matches_single_window_and_k_bound(spark):
    df = _corpus(spark)
    got = group_sample(df, "source", "doc_id", k=3)
    assert _rows(got) == _rows(_single_window(df, 3))
    per_group = got.groupBy("source").count().collect()
    assert all(r["count"] == 3 for r in per_group)


def test_salt_boundaries(spark):
    df = _corpus(spark)
    base = _rows(_single_window(df, 3))
    for n_salts in (1, 256):
        assert _rows(group_sample(df, "source", "doc_id", 3, n_salts=n_salts)) == base


def test_deterministic_under_recompute(spark):
    df = _corpus(spark).repartition(7)
    s = group_sample(df, "source", "doc_id", k=3)
    assert _rows(s) == _rows(s)  # two independent materializations


def test_merge_law(spark):
    # per-shard bottom-k samples union + resample == bottom-k of the union
    df = _corpus(spark, 300)
    shard_a = df.filter(F.col("doc_id") % 2 == 0)
    shard_b = df.filter(F.col("doc_id") % 2 == 1)
    merged = group_sample(
        group_sample(shard_a, k=5).select("doc_id", "source").union(
            group_sample(shard_b, k=5).select("doc_id", "source")
        ),
        k=5,
    )
    assert _rows(merged) == _rows(group_sample(df, k=5))


def test_salt_decorrelates_samples(spark):
    df = _corpus(spark)
    a = {r["doc_id"] for r in group_sample(df, k=3, salt="a").collect()}
    b = {r["doc_id"] for r in group_sample(df, k=3, salt="b").collect()}
    assert a != b
