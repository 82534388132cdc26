"""Skew handling: hot-key salting, two-phase agg, giant-doc placement."""

from pyspark.sql import functions as F

from modern_document_converter_for_ai_library_spark.plans.salting import (
    balance_by_size,
    detect_hot_keys,
    salted_two_phase_agg,
    with_salted_key,
)


def _skewed_docs(spark, n=400):
    # 60% of rows on one hot host, the rest spread over 20 cold hosts
    rows = []
    for i in range(n):
        host = "hot.example.com" if i % 10 < 6 else f"cold{i % 20}.example.com"
        rows.append((f"doc_{i:05d}", host, "x" * (10 + i % 50)))
    return spark.createDataFrame(rows, ["doc_id", "host", "text"]).withColumn(
        "n_chars", F.length("text")
    )


def test_detect_hot_keys(spark):
    df = _skewed_docs(spark)
    hot = detect_hot_keys(df, "host", threshold_frac=0.2, sample_frac=0.5)
    assert hot == ["hot.example.com"]


def test_salting_splits_hot_key_only(spark):
    df = _skewed_docs(spark)
    salted = with_salted_key(df, "host", n_salts=8, hot_keys=["hot.example.com"])
    per_key = {
        r["host"]: r["n_sub"]
        for r in salted.groupBy("host")
        .agg(F.countDistinct("salted_key").alias("n_sub"))
        .collect()
    }
    assert per_key["hot.example.com"] > 1  # hot key split across salts
    assert all(v == 1 for k, v in per_key.items() if k != "hot.example.com")
    # the biggest salted group is far below the unsalted hot-key size
    biggest = (
        salted.groupBy("salted_key").count().agg(F.max("count")).collect()[0][0]
    )
    hot_size = df.filter(F.col("host") == "hot.example.com").count()
    assert biggest <= hot_size / 2


def test_two_phase_agg_equals_direct(spark):
    df = _skewed_docs(spark)
    salted = with_salted_key(df, "host", n_salts=8, hot_keys=["hot.example.com"])
    two_phase = {
        r["host"]: (r["n_docs"], r["total_chars"])
        for r in salted_two_phase_agg(salted, "host").collect()
    }
    direct = {
        r["host"]: (r["n"], r["chars"])
        for r in df.groupBy("host")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum(F.col("n_chars").cast("bigint")).cast("bigint").alias("chars"),
        )
        .collect()
    }
    assert two_phase == direct


def test_balance_by_size_spreads_giants(spark):
    from modern_document_converter_for_ai_library_spark.sources.synth import (
        SPANS_SCHEMA,
    )
    import pyspark.sql.types as T

    schema = T.StructType(
        [T.StructField("doc_id", T.StringType()), T.StructField("spans", SPANS_SCHEMA)]
    )
    def doc(i, size):
        return (f"d{i:03d}", [{"kind": "text", "text": "x" * size, "media_ref": "", "offset": 0}])

    rows = [doc(i, 100) for i in range(40)] + [doc(100 + i, 2_000_000) for i in range(4)]
    # scatter giants across MANY input partitions: RoundRobinPartitioning
    # cycles per input partition from a random offset, so without the
    # single-partition barrier giants from different inputs can collide
    df = spark.createDataFrame(rows, schema=schema).repartition(13)
    out = balance_by_size(df, num_partitions=4, giant_threshold=1_000_000)
    per_part = (
        out.withColumn("pid", F.spark_partition_id())
        .withColumn("is_giant", F.length(F.col("spans")[0]["text"]) > 1_000_000)
        .groupBy("pid")
        .agg(F.sum(F.when(F.col("is_giant"), 1).otherwise(0)).alias("giants"))
        .collect()
    )
    assert max(r["giants"] for r in per_part) <= 1  # round-robin guarantee
    assert out.count() == 44
