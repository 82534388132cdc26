"""Small-file compaction (operators/compaction.py + jobs/compact_job.py):
fragmentation digest, bin-packed rewrite with content verification,
partition-preserving mode, refusal to overwrite, and the job CLI."""

import glob
import json
import os

import pytest
from pyspark.sql import functions as F

from modern_document_converter_for_ai_library_spark.operators.compaction import (
    compact_parquet,
    content_checksum,
    file_stats,
)


def _fragmented(spark, path, n_rows=5000, n_files=40):
    (
        spark.range(n_rows)
        .select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("text-"), F.col("id")).alias("text"),
            (F.col("id") % 4).cast("string").alias("source"),
        )
        .repartition(n_files)
        .write.parquet(path)
    )


def _data_files(path):
    return [
        f
        for f in glob.glob(os.path.join(path, "**", "*"), recursive=True)
        if os.path.isfile(f)
        and not os.path.basename(f).startswith(("_", "."))
    ]


def test_file_stats_counts_fragmentation(spark, tmp_path):
    src = str(tmp_path / "frag")
    _fragmented(spark, src)
    stats = file_stats(spark, src, target_bytes=1 << 20)
    assert stats["n_files"] == len(_data_files(src)) == 40
    assert stats["total_bytes"] > 0
    assert stats["small_files"] == 40  # tiny files vs a 1 MB target
    assert stats["small_fraction_millis"] == 1000


def test_compact_preserves_content_and_reduces_files(spark, tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    _fragmented(spark, src)
    total = file_stats(spark, src)["total_bytes"]
    target = max(1, total // 4)  # force ~4-5 output files
    result = compact_parquet(spark, src, dst, target_bytes=target)
    assert result["verified"] is True
    assert result["rows"] == 5000
    n_after = result["after"]["n_files"]
    assert n_after < 40
    assert n_after == result["planned_files"]
    # content equality, independently of the operator's own check
    assert content_checksum(spark.read.parquet(src)) == content_checksum(
        spark.read.parquet(dst)
    )


def test_compact_partitioned_layout(spark, tmp_path):
    src, dst = str(tmp_path / "psrc"), str(tmp_path / "pdst")
    _fragmented(spark, src)
    result = compact_parquet(
        spark, src, dst, target_bytes=1 << 30, partition_by=["source"]
    )
    assert result["verified"] is True
    # Hive layout preserved
    parts = {os.path.basename(p) for p in glob.glob(os.path.join(dst, "source=*"))}
    assert parts == {"source=0", "source=1", "source=2", "source=3"}
    got = spark.read.parquet(dst)
    assert got.count() == 5000
    assert set(got.columns) == {"doc_id", "text", "source"}


def test_partitioned_hot_partition_splits(spark, tmp_path):
    # one Hive partition carries ~8x the data of the others: its slot
    # count must scale (multiple near-target files) while tiny partitions
    # stay at one file — a GLOBAL slot modulus would shatter every
    # partition into every slot
    src, dst = str(tmp_path / "hsrc"), str(tmp_path / "hdst")
    (
        spark.range(9000)
        .select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("payload-"), F.col("id")).alias("text"),
            F.when(F.col("id") < 8000, "hot").otherwise(
                F.concat(F.lit("cold"), (F.col("id") % 4).cast("string"))
            ).alias("source"),
        )
        .repartition(30)
        .write.parquet(src)
    )
    total = file_stats(spark, src)["total_bytes"]
    result = compact_parquet(
        spark, src, dst, target_bytes=max(1, total // 6), partition_by=["source"]
    )
    assert result["verified"] is True
    by_part = {}
    for p in glob.glob(os.path.join(dst, "source=*")):
        by_part[os.path.basename(p)] = len(_data_files(p))
    assert by_part["source=hot"] >= 3  # hot partition split
    for name, n in by_part.items():
        if name != "source=hot":
            assert n == 1  # cold partitions NOT shattered across slots


def test_refuses_existing_target(spark, tmp_path):
    src = str(tmp_path / "src2")
    _fragmented(spark, src, n_rows=100, n_files=4)
    with pytest.raises(ValueError, match="already exists"):
        compact_parquet(spark, src, src)


def test_compact_hive_partitioned_source_keeps_partition_columns(spark, tmp_path):
    # ADVICE r3 (high): reading pinned leaf files WITHOUT basePath drops
    # Hive partition-value columns, so compacting a partitionBy-written
    # source silently republished a table missing its partition columns
    # (with a passing checksum — both sides derived from the same
    # column-less frame). Pin: the columns survive end-to-end.
    src, dst = str(tmp_path / "hivesrc"), str(tmp_path / "hivedst")
    (
        spark.range(4000)
        .select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("text-"), F.col("id")).alias("text"),
            (F.col("id") % 3).cast("string").alias("source"),
        )
        .repartition(12)
        .write.partitionBy("source")
        .parquet(src)
    )
    result = compact_parquet(
        spark, src, dst, target_bytes=1 << 30, partition_by=["source"]
    )
    assert result["verified"] is True
    got = spark.read.parquet(dst)
    assert set(got.columns) == {"doc_id", "text", "source"}
    assert got.count() == 4000
    # partition values round-trip exactly as a plain spark.read.parquet(src)
    # reader sees them (Hive partition-value inference types 'source=0'
    # dirs as int in BOTH reads — compaction is faithful to Spark's own
    # view of the table, dir names included)
    assert {r["source"] for r in got.select("source").distinct().collect()} == {
        r["source"]
        for r in spark.read.parquet(src).select("source").distinct().collect()
    }
    parts = {os.path.basename(p) for p in glob.glob(os.path.join(dst, "source=*"))}
    assert parts == {"source=0", "source=1", "source=2"}
    # full content equality including the partition column values
    src_rows = {tuple(r) for r in spark.read.parquet(src).collect()}
    dst_rows = {tuple(r) for r in got.collect()}
    assert src_rows == dst_rows
    # planned_files reports the per-partition plan and matches reality
    assert result["after"]["n_files"] == result["planned_files"] == 3


def test_compact_hive_source_sizes_partitions_by_exact_bytes(spark, tmp_path):
    # one partition's rows are ~40x wider than the others': row-share
    # sizing would under-provision it (ADVICE r3 low). With listing-dir
    # exact bytes the wide partition gets multiple slots while the
    # narrow one stays at a single file.
    src, dst = str(tmp_path / "wsrc"), str(tmp_path / "wdst")
    (
        spark.range(3000)
        .select(
            F.col("id").alias("doc_id"),
            F.when(F.col("id") % 2 == 0, F.repeat(F.lit("wide-payload-"), 40))
            .otherwise(F.lit("tiny"))
            .alias("text"),
            F.when(F.col("id") % 2 == 0, "wide").otherwise("narrow").alias("source"),
        )
        .repartition(10)
        .write.partitionBy("source")
        .parquet(src)
    )
    wide_bytes = sum(
        os.path.getsize(f) for f in _data_files(os.path.join(src, "source=wide"))
    )
    result = compact_parquet(
        spark, src, dst, target_bytes=max(1, wide_bytes // 3),
        partition_by=["source"],
    )
    assert result["verified"] is True
    n_wide = len(_data_files(os.path.join(dst, "source=wide")))
    n_narrow = len(_data_files(os.path.join(dst, "source=narrow")))
    assert n_wide >= 3  # provisioned for its true bytes
    assert n_narrow <= 2  # not shattered by the wide partition's slots
    assert result["after"]["n_files"] == result["planned_files"]


def test_partitioned_planned_files_matches_actual(spark, tmp_path):
    # ADVICE r3 (low): planned_files must report the per-partition slot
    # sum in partition_by mode, not the global bin count
    src, dst = str(tmp_path / "ppsrc"), str(tmp_path / "ppdst")
    _fragmented(spark, src, n_rows=2000, n_files=8)
    result = compact_parquet(
        spark, src, dst, target_bytes=1 << 30, partition_by=["source"]
    )
    assert result["verified"] is True
    # 4 sources x 1 slot each under a huge target
    assert result["planned_files"] == 4
    assert result["after"]["n_files"] == 4


def test_checksum_is_order_insensitive_and_duplicate_sensitive(spark):
    a = spark.createDataFrame([(1, "x"), (2, "y")], ["id", "t"])
    b = spark.createDataFrame([(2, "y"), (1, "x")], ["id", "t"])
    dup = spark.createDataFrame([(1, "x"), (1, "x")], ["id", "t"])
    assert content_checksum(a) == content_checksum(b)
    assert content_checksum(a) != content_checksum(dup)


def test_compact_job_cli(spark, tmp_path, capsys):
    from jobs.compact_job import main

    src, dst = str(tmp_path / "jsrc"), str(tmp_path / "jdst")
    _fragmented(spark, src, n_rows=1000, n_files=16)
    assert main(["--input", src, "--audit-only"]) == 0
    audit = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert audit["mode"] == "audit" and audit["n_files"] == 16

    assert main(["--input", src, "--output", dst, "--target-mb", "1"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["mode"] == "compact"
    assert out["verified"] is True
    assert out["after"]["n_files"] < 16
    assert spark.read.parquet(dst).count() == 1000


def test_norm_uri_strips_scheme_and_authority():
    from modern_document_converter_for_ai_library_spark.operators.compaction import (
        _norm_uri,
    )

    # ADVICE r4: the authority must not survive as a path segment
    assert _norm_uri("file:/a/b") == "/a/b"
    assert _norm_uri("file:///a/b") == "/a/b"
    assert _norm_uri("hdfs://nn/a/b") == "/a/b"
    assert _norm_uri("hdfs://nn:8020/a/b") == "/a/b"
    assert _norm_uri("s3a://bucket/a/b") == "/a/b"
    assert _norm_uri("/a/b") == "/a/b"


def test_murmur3_hash_canary_pins_bijective_probe_contract(spark):
    """Cross-version canary (VERDICT r4 item 8): _bijective_task_values
    probes pmod(hash(int32 v), n) with Spark's murmur3 and later
    repartitions on the same expression — self-consistent inside one
    session, but silently wrong if a Spark upgrade ever changed hash()
    or the int-cast coupling. Pin the exact hash values (computed on
    Spark 4.1 / seed 42 murmur3) so a behavior change fails HERE, not
    as a mysterious planned_files mismatch. Note hash(int32) !=
    hash(int64) for the same value — the probe's cast matters."""
    rows = (
        spark.range(5)
        .select(
            F.hash(F.col("id").cast("int")).alias("h32"),
            F.hash(F.col("id").cast("bigint")).alias("h64"),
        )
        .collect()
    )
    assert [(r["h32"], r["h64"]) for r in rows] == [
        (933211791, -1670924195),
        (-559580957, -1712319331),
        (1765031574, -797927272),
        (-1823081949, 519220707),
        (-397064898, 1344313940),
    ]

    from modern_document_converter_for_ai_library_spark.operators.compaction import (
        _bijective_task_values,
    )

    vals = _bijective_task_values(spark, 7)
    got = (
        spark.createDataFrame([(v,) for v in vals], "v int")
        .select(F.pmod(F.hash(F.col("v").cast("int")), F.lit(7)).alias("r"))
        .collect()
    )
    assert sorted(r["r"] for r in got) == list(range(7))
