"""Small-file compaction for parquet table directories.

At 10^12 documents the ingest tiers (streaming foreachBatch sinks, the
per-batch manifest writer, incremental dedup appends) accrete small
files; every downstream scan then pays a task per file and the NameNode/
object-store pays a listing per file. Compaction is the standard
maintenance pass: bin-pack the table's bytes into files near a target
size and atomically republish. Iceberg installations get this from
`rewrite_data_files` (which also pins a snapshot natively); this
operator is the dependency-free parquet-path form.

Design:

- Listing is DISTRIBUTED: ``binaryFile`` gives a slim (path, length)
  frame without reading content, so the fragmentation digest never
  pays a driver py4j round-trip per file (a 1M-file table would cost
  minutes of pure driver latency under the naive
  ``FileSystem.listFiles`` iterator — the same per-call-latency class
  as the simhash64 expression-build finding). Spark's file index
  already excludes ``_``/``.`` hidden files (_SUCCESS, checksums).
- ``compact_parquet`` PINS the listing once and reads exactly that
  file set (``spark.read.parquet(*paths)``), so the byte total, the
  rewrite, and the verification all see the same snapshot — a
  concurrent ingest appending mid-job can neither skew the bin count
  nor fail verification spuriously; files landing after the listing
  are simply not part of this compaction round. (At extreme file
  counts the collected path list is the cost of pinning — that is the
  scale where an Iceberg snapshot does this for free.)
- The rewrite round-robins into ``ceil(total_bytes / target_bytes)``
  output slots (near-uniform file sizes regardless of input skew) and
  writes to a NEW directory — republishing is the caller's atomic
  rename/pointer-swap, never an in-place overwrite of a directory
  being read. With ``partition_by`` each Hive partition gets its OWN
  slot count, ceil(partition_bytes / target), with partition bytes
  summed EXACTLY from the pinned listing (each leaf file lives in
  exactly one partition directory — no row-count x average-width
  estimate, which under-provisions partitions whose rows are wider
  than average): a global slot modulus would scatter every partition
  across every writer task and emit n_partitions x n_slots small
  files, the exact pathology compaction exists to remove. The pinned
  snapshot is read with ``basePath`` so Hive partition-value columns
  SURVIVE the leaf-file read — without it Spark silently drops them
  and a compaction of a partitioned source would republish a table
  missing its partition columns (with a passing checksum, since both
  sides would derive from the same column-less frame). Slot groups map
  to shuffle partitions through a murmur3-residue BIJECTION
  (``_bijective_task_values``), not plain hash partitioning on the
  group columns: hash combos birthday-collide, and a collision merged
  two slots into one writer task — a file up to 2x target_bytes and a
  written file count undershooting ``planned_files``.
- ``content_checksum`` is the cheap exact row checksum (sum of 60-bit
  row-JSON md5 in DECIMAL(38,0) — order-insensitive,
  duplicate-sensitive, overflow-safe to ~10^19 rows) used to assert
  the rewrite moved every row and nothing else before success.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_TARGET_BYTES = 128 * 1024 * 1024


def _file_listing(spark: SparkSession, path: str) -> DataFrame:
    """(fpath, bytes) for every data file under ``path`` — executors do
    the listing; content is never read (column-pruned binaryFile)."""
    df = (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", "true")
        .load(path)
        .select(F.col("path").alias("fpath"), F.col("length").alias("bytes"))
    )
    name = F.element_at(F.split("fpath", "/"), -1)
    return df.filter(~name.startswith("_") & ~name.startswith("."))


_URI_AUTHORITY_RE = r"^[a-zA-Z][a-zA-Z0-9+.\-]*://[^/]*"
_URI_SCHEME_RE = r"^[a-zA-Z][a-zA-Z0-9+.\-]*:/"


def _norm_uri(p: str) -> str:
    """Scheme-AND-authority-stripped absolute path: 'file:/x',
    'file:///x', 'hdfs://nn:8020/x' all normalize to '/x'. The old
    single-pattern form collapsed '//' and kept the authority as a path
    segment ('hdfs://nn/x' -> '/nn/x', contrary to this docstring —
    ADVICE r4), which compared fine only while BOTH the pinned listing
    and input_file_name() carried the identical authority form. Applied
    identically on the row side (same two regexes in regexp_replace) so
    the slot join always compares like with like."""
    import re as _re

    return _re.sub(_URI_SCHEME_RE, "/", _re.sub(_URI_AUTHORITY_RE, "", p))


def _hive_layout_matches(
    part_bytes: dict[str, int], src: str, partition_by: list[str]
) -> bool:
    """True iff every leaf-file parent directory under ``src`` is exactly
    the Hive encoding of ``partition_by`` (one ``col=value`` segment per
    column, in order) — i.e. the source is already laid out by these
    columns, so the pinned listing carries exact per-partition bytes."""
    root = _norm_uri(src).rstrip("/")
    for d in part_bytes:
        if not d.startswith(root + "/"):
            return False
        segs = d[len(root) + 1 :].split("/")
        if len(segs) != len(partition_by):
            return False
        for seg, col in zip(segs, partition_by):
            if not seg.startswith(col + "="):
                return False
    return True


def _bijective_task_values(spark: SparkSession, n_part: int) -> list[int]:
    """Integers v_0..v_{n_part-1} with pmod(hash(v_i), n_part) == i under
    Spark's murmur3 hash partitioning — so ``repartition(n_part, task)``
    with these values as the task key places EXACTLY one slot group per
    shuffle partition. Plain ``repartition(n, group_cols)`` hashes group
    combos into partitions with birthday collisions: two slots of one
    Hive partition merging costs a file up to 2x target_bytes and makes
    the written file count undershoot the plan (observed 5 files for a
    6-slot plan at test scale). One bounded probe job (64x oversample;
    coupon-collector needs ~n ln n) finds the representatives; the int
    cast matters — murmur3 of int32 and int64 differ."""
    probe = (
        spark.range(64 * n_part)
        .select(
            F.col("id").cast("int").alias("v"),
            F.pmod(F.hash(F.col("id").cast("int")), F.lit(n_part)).alias("r"),
        )
        .groupBy("r")
        .agg(F.min("v").alias("v"))
        .collect()
    )
    got = {int(r["r"]): int(r["v"]) for r in probe}
    missing = [i for i in range(n_part) if i not in got]
    if missing:  # astronomically unlikely at 64x oversample
        raise RuntimeError(
            "hash-residue probe left %d/%d shuffle partitions unmapped; "
            "rerun with a larger probe range" % (len(missing), n_part)
        )
    return [got[i] for i in range(n_part)]


def _digest(sizes: list[int], target_bytes: int) -> dict:
    sizes = sorted(sizes)
    n = len(sizes)
    small = sum(1 for s in sizes if s < target_bytes // 2)
    return {
        "n_files": n,
        "total_bytes": sum(sizes),
        "median_bytes": sizes[n // 2] if n else 0,
        "small_files": small,
        "small_fraction_millis": (1000 * small // n) if n else 0,
    }


def file_stats(
    spark: SparkSession, path: str, target_bytes: int = DEFAULT_TARGET_BYTES
) -> dict:
    """Fragmentation digest of a table directory: {n_files, total_bytes,
    median_bytes, small_files, small_fraction_millis}. A file is "small"
    under half the target. Listing only — no data read."""
    sizes = [
        int(r["bytes"]) for r in _file_listing(spark, path).select("bytes").collect()
    ]
    return _digest(sizes, target_bytes)


def content_checksum(df: DataFrame) -> tuple[int, int]:
    """(row_count, exact content checksum). Order-insensitive (sum) and
    duplicate-sensitive (unlike xor, where duplicate rows cancel in
    pairs). The 60-bit row hashes are summed in DECIMAL(38,0) — exact and
    overflow-safe to ~10^19 rows (a bigint sum overflows at ~10^4 rows
    under ANSI mode)."""
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
    existing ``dst`` raises. The source file set is pinned by one
    listing; everything (bin count, rewrite, verify) operates on exactly
    that snapshot.

    Known bound: in ``partition_by`` mode, rows whose partition value is
    NULL cannot equi-match the slot map (null keys never join); they
    fall into slot group 0 and the writer emits them under Hive's
    ``__HIVE_DEFAULT_PARTITION__`` directory — content is preserved
    (the left join + verify guarantee that), but the written file count
    exceeds ``planned_files`` by that one extra directory's files.
    """
    jvm = spark._jvm
    jdst = jvm.org.apache.hadoop.fs.Path(dst)
    fs = jdst.getFileSystem(spark._jsc.hadoopConfiguration())
    if fs.exists(jdst):
        raise ValueError(
            "compaction target %r already exists — compaction republishes "
            "via a fresh directory + atomic swap, never in place" % dst
        )
    listing = _file_listing(spark, src).collect()
    if not listing:
        raise ValueError("no data files under %r" % src)
    paths = [r["fpath"] for r in listing]
    before = _digest([int(r["bytes"]) for r in listing], target_bytes)
    # basePath keeps Hive partition-value columns in the read schema —
    # reading leaf files without it silently DROPS them (ADVICE r3 high:
    # a partitioned source would compact to a table missing its partition
    # columns, with a passing checksum since both sides derive from the
    # same column-less frame)
    df = spark.read.option("basePath", src).parquet(*paths)  # pinned snapshot
    n_out = max(1, math.ceil(before["total_bytes"] / target_bytes))
    if partition_by:
        missing = [c for c in partition_by if c not in df.columns]
        if missing:
            raise ValueError(
                "partition_by columns %r not in source schema %r"
                % (missing, df.columns)
            )
        row_hash = F.conv(
            F.substring(F.md5(F.to_json(F.struct(*sorted(df.columns)))), 1, 8),
            16,
            10,
        ).cast("bigint")
        part_bytes: dict[str, int] = {}
        for r in listing:
            d = _norm_uri(r["fpath"]).rsplit("/", 1)[0]
            part_bytes[d] = part_bytes.get(d, 0) + int(r["bytes"])
        if _hive_layout_matches(part_bytes, src, partition_by):
            # Source is ALREADY laid out by exactly these columns: size
            # each partition from the pinned listing (partition dir ->
            # summed file bytes — exact, not a row-share estimate that
            # under-provisions partitions with wider-than-average rows;
            # ADVICE r3). Rows map to their partition's slot count via
            # input_file_name() -> parent dir, broadcast-joined against
            # the listing — no extra aggregate over the data at all.
            # Each parent dir IS one output partition, so repartitioning
            # by (_pdir, _slot) keeps every writer task single-partition.
            slots_by_dir = {
                d: max(1, math.ceil(b / target_bytes))
                for d, b in part_bytes.items()
            }
            n_part = sum(slots_by_dir.values())
            rows, off = [], 0
            for d in sorted(slots_by_dir):
                rows.append((d, slots_by_dir[d], off))
                off += slots_by_dir[d]
            slots_df = spark.createDataFrame(
                rows, "_pdir string, _slots int, _off int"
            )
            row_pdir = F.regexp_replace(
                F.regexp_replace(
                    F.regexp_replace(
                        F.input_file_name(), _URI_AUTHORITY_RE, ""
                    ),
                    _URI_SCHEME_RE,
                    "/",
                ),
                r"/[^/]*$",
                "",
            )
            out = (
                df.withColumn("_pdir", row_pdir)
                .join(F.broadcast(slots_df), "_pdir", "left")
                # left join + LOUD unmatched guard: an inner join would
                # DROP rows whose file fell outside the listing map; the
                # old silent coalesce-to-1 fallback instead dumped such
                # rows into slot 0 — content stayed correct via verify,
                # but sizing and the n_files==planned_files invariant
                # broke with no signal (ADVICE r4). raise_error keeps
                # the guard lazy (no extra pass over the data).
                .withColumn(
                    "_slot",
                    F.when(
                        F.col("_slots").isNotNull(),
                        F.pmod(row_hash, F.col("_slots")),
                    ).otherwise(
                        F.raise_error(
                            F.concat(
                                F.lit(
                                    "compact_table: row file dir not in "
                                    "the pinned listing (URI-form "
                                    "mismatch between input_file_name "
                                    "and the listing?): "
                                ),
                                F.col("_pdir"),
                            )
                        ).cast("int")
                    ),
                )
                .drop("_pdir", "_slots")
            )
        else:
            # Flat (or differently-partitioned) source being RE-laid-out
            # by a data column: the listing carries no per-value bytes,
            # so estimate partition bytes as row share x global average
            # row bytes (one slim aggregate, output bounded by partition
            # cardinality). A GLOBAL slot modulus would scatter every
            # Hive partition over every writer task -> n_partitions x
            # n_slots shards.
            counts = df.groupBy(*partition_by).agg(F.count("*").alias("_rows"))
            rows = counts.collect()
            total_rows = sum(int(r["_rows"]) for r in rows) or 1
            slot_rows, off = [], 0
            for r in sorted(rows, key=lambda r: tuple(
                (v is None, v) for v in (r[c] for c in partition_by)
            )):
                n_slots = max(
                    1,
                    math.ceil(
                        int(r["_rows"])
                        * before["total_bytes"]
                        / total_rows
                        / target_bytes
                    ),
                )
                slot_rows.append(
                    tuple(r[c] for c in partition_by) + (n_slots, off)
                )
                off += n_slots
            from pyspark.sql.types import IntegerType

            slots_df = spark.createDataFrame(
                slot_rows,
                counts.select(*partition_by)
                .schema.add("_slots", IntegerType())
                .add("_off", IntegerType()),
            )
            n_part = max(1, off)
            out = (
                df.join(F.broadcast(slots_df), partition_by, "left")
                # left join + coalesce: an inner join would DROP rows
                # whose partition value is NULL (null keys never
                # equi-match)
                .withColumn(
                    "_slot",
                    F.pmod(row_hash, F.coalesce(F.col("_slots"), F.lit(1))),
                )
                .drop("_slots")
            )
        # one shuffle partition per slot group, EXACTLY: map each group's
        # dense index (_off + _slot) to a task value whose murmur3
        # residue is that index, so repartition can't birthday-collide
        # two groups into one writer task (which merged their files —
        # up to 2x target_bytes — and made n_files undershoot the plan)
        task_map = spark.createDataFrame(
            list(enumerate(_bijective_task_values(spark, n_part))),
            "_idx int, _task int",
        )
        out = (
            out.withColumn(
                "_idx",
                (F.coalesce(F.col("_off"), F.lit(0)) + F.col("_slot")).cast(
                    "int"
                ),
            )
            .join(F.broadcast(task_map), "_idx", "left")
            .repartition(n_part, "_task")
            .drop("_idx", "_task", "_slot", "_off")
        )
        out.write.partitionBy(*partition_by).parquet(dst)
    else:
        df.repartition(n_out).write.parquet(dst)
    result = {
        "before": before,
        "after": file_stats(spark, dst, target_bytes),
        "target_bytes": target_bytes,
        # in partition_by mode the actual plan is the sum of per-partition
        # slots, not the global bin count (ADVICE r3: the heartbeat and
        # the n_after == planned_files invariant must describe the real
        # plan)
        "planned_files": n_part if partition_by else n_out,
    }
    if verify:
        # both checksums derive from the SAME pinned file list (df), so
        # a concurrent append to src cannot fail verification spuriously
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
