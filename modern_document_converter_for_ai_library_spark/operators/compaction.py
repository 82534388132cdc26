"""Small-file compaction for parquet table directories.

At 10^12 documents the ingest tiers (streaming foreachBatch sinks, the
per-batch manifest writer, incremental dedup appends) accrete small
files; every downstream scan then pays a task per file and the NameNode/
object-store pays a listing per file. Compaction is the standard
maintenance pass: bin-pack the table's bytes into files near a target
size and atomically republish. Iceberg installations get this from
`rewrite_data_files`; this operator is the dependency-free parquet-path
form built on the same Hadoop FileSystem API Spark itself uses (works on
local paths in tests and HDFS/S3A on a cluster — no `os.walk`).

Design:

- ``file_stats`` lists data files via ``FileSystem.listFiles`` (one
  recursive remote listing, no data read) and reports the fragmentation
  digest: file count, bytes, median size, small-file fraction.
- ``compact_parquet`` reads the source, round-robin repartitions to
  ``ceil(total_bytes / target_bytes)`` output slots (RoundRobin gives
  near-uniform file sizes regardless of input skew; hash partitioning
  would re-create skew), and writes to a NEW directory — republishing is
  the caller's atomic rename/pointer-swap, never an in-place overwrite
  of the directory being read. With ``partition_by`` the layout is
  preserved: one shuffle on the partition columns + a within-partition
  slot key so each Hive partition gets its own near-target files.
- ``content_checksum`` is the cheap mod-2^64 row checksum (sum of the
  60-bit md5 of each row's canonical JSON — order-insensitive,
  duplicate-sensitive) used by the job to assert the rewrite moved
  every row and nothing else; it reads every column by design — the
  check is about content, not the scan plan.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_TARGET_BYTES = 128 * 1024 * 1024


def _fs_and_path(spark: SparkSession, path: str):
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, jpath


def file_stats(
    spark: SparkSession, path: str, target_bytes: int = DEFAULT_TARGET_BYTES
) -> dict:
    """Fragmentation digest of a table directory: {n_files, total_bytes,
    median_bytes, small_files, small_fraction_millis}. A file is "small"
    under half the target. Listing only — no data read."""
    fs, jpath = _fs_and_path(spark, path)
    sizes = []
    it = fs.listFiles(jpath, True)
    while it.hasNext():
        f = it.next()
        name = f.getPath().getName()
        if name.startswith("_") or name.startswith("."):
            continue  # _SUCCESS, checksums, hidden markers
        sizes.append(int(f.getLen()))
    sizes.sort()
    n = len(sizes)
    small = sum(1 for s in sizes if s < target_bytes // 2)
    return {
        "n_files": n,
        "total_bytes": sum(sizes),
        "median_bytes": sizes[n // 2] if n else 0,
        "small_files": small,
        "small_fraction_millis": (1000 * small // n) if n else 0,
    }


def content_checksum(df: DataFrame) -> tuple[int, int]:
    """(row_count, exact content checksum). Order-insensitive (sum) and
    duplicate-sensitive (unlike xor, where duplicate rows cancel in
    pairs). The 60-bit row hashes are summed in DECIMAL(38,0) — exact and
    overflow-safe to ~10^19 rows (a bigint sum overflows at ~10^4 rows
    under ANSI mode; a wrapping sum would still be a valid checksum but
    ANSI makes it an error, not a wrap)."""
    # name-sorted columns: a partitionBy round-trip appends partition
    # columns at the END of the read schema, and the checksum must not
    # depend on column order
    row = F.conv(
        F.substring(F.md5(F.to_json(F.struct(*sorted(df.columns)))), 1, 15),
        16,
        10,
    ).cast("decimal(38,0)")
    r = df.select(
        F.count("*").alias("n"), F.sum(row).alias("s")
    ).collect()[0]
    return int(r["n"]), int(r["s"] or 0)


def compact_parquet(
    spark: SparkSession,
    src: str,
    dst: str,
    target_bytes: int = DEFAULT_TARGET_BYTES,
    partition_by: list[str] | None = None,
    verify: bool = True,
) -> dict:
    """Rewrite ``src`` into ``dst`` as near-target-size parquet files.

    Returns the before/after digest plus the verification result. ``dst``
    must be a NEW location (republish by rename/pointer swap — in-place
    overwrite of a directory while reading it is never safe); an
    existing ``dst`` raises.
    """
    fs, jdst = _fs_and_path(spark, dst)
    if fs.exists(jdst):
        raise ValueError(
            "compaction target %r already exists — compaction republishes "
            "via a fresh directory + atomic swap, never in place" % dst
        )
    before = file_stats(spark, src, target_bytes)
    df = spark.read.parquet(src)
    n_out = max(1, math.ceil(before["total_bytes"] / target_bytes))
    if partition_by:
        # one shuffle on (partition cols, slot): each Hive partition gets
        # its own near-target file set; the slot key spreads a hot
        # partition across several writers instead of one giant file
        slot = (
            F.conv(F.substring(F.md5(F.to_json(F.struct(*df.columns))), 1, 8), 16, 10)
            .cast("bigint")
            % n_out
        )
        out = df.withColumn("_slot", slot).repartition(
            n_out, *(partition_by + ["_slot"])
        ).drop("_slot")
        out.write.partitionBy(*partition_by).parquet(dst)
    else:
        df.repartition(n_out).write.parquet(dst)
    result = {
        "before": before,
        "after": file_stats(spark, dst, target_bytes),
        "target_bytes": target_bytes,
        "planned_files": n_out,
    }
    if verify:
        n0, c0 = content_checksum(df)
        # pin the source schema on the read-back: Hive partition-value
        # type inference would otherwise re-type a string partition
        # column (e.g. source='0' -> int 0) and fail the checksum on a
        # representation change that is not a content change
        n1, c1 = content_checksum(spark.read.schema(df.schema).parquet(dst))
        result["verified"] = (n0 == n1) and (c0 == c1)
        result["rows"] = n0
        if not result["verified"]:
            raise RuntimeError(
                "compaction verification FAILED for %s -> %s: "
                "rows %d -> %d, checksum %d -> %d" % (src, dst, n0, n1, c0, c1)
            )
    return result
