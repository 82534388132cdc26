"""Table targets: Iceberg on a cluster, parquet directories in the sandbox.

The north rule's storage contract is an Iceberg table of interleaved
documents with snapshot-id lineage; this sandbox has no Iceberg runtime
jars, so every reader/writer resolves the target shape at call time:

  - ``catalog.db.table`` (dotted, no slash)  -> Iceberg DataFrame V2 API:
        ``df.writeTo(t).append()`` / ``spark.read.table(t)`` — commits are
        snapshot-atomic, so the manifest's ``input_snapshot`` column records
        a real snapshot id
  - anything path-like                       -> parquet directory with the
        same append/overwrite semantics (idempotence comes from the
        manifest anti-join either way, operators/manifest.py)

``iceberg_available`` probes for the runtime instead of importing eagerly,
so the module works (and is tested) without the jars; submitting with
``--packages org.apache.iceberg:iceberg-spark-runtime-*`` flips the same
call sites to Iceberg with no code change.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def is_table_identifier(target: str) -> bool:
    """Dotted, slash-free targets are catalog table identifiers."""
    return "/" not in target and "\\" not in target and "." in target


def iceberg_available(spark: SparkSession) -> bool:
    """True when the Iceberg Spark runtime is on the classpath."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


def write_documents(
    df: DataFrame, target: str, mode: str = "append",
    partition_by: list[str] | None = None,
) -> None:
    """Write a span-shaped DataFrame to an Iceberg table or parquet path.

    ``partition_by`` lays the files out by the named columns (e.g. the
    shard layout's ``shard_id``); for Iceberg targets it becomes the
    table partition spec, which only applies when the table is (re)created
    — append mode inherits the existing spec, so passing partition_by with
    append on a table target is rejected rather than silently ignored."""
    if is_table_identifier(target):
        spark = df.sparkSession
        if not iceberg_available(spark):
            raise RuntimeError(
                f"{target!r} is a catalog table identifier but no Iceberg "
                "runtime is on the classpath; submit with the "
                "iceberg-spark-runtime package or use a path target"
            )
        writer = df.writeTo(target)
        if partition_by:
            if mode != "overwrite":
                raise ValueError(
                    "partition_by on a table target requires overwrite "
                    "(the partition spec is set at table creation)"
                )
            from pyspark.sql import functions as _F

            writer = writer.partitionedBy(
                *[_F.col(c) for c in partition_by]
            )
        if mode == "append":
            writer.append()
        elif mode == "overwrite":
            writer.createOrReplace()
        else:
            raise ValueError(f"unsupported mode: {mode!r}")
        return
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(target)


def is_missing_target_error(e: Exception) -> bool:
    """True iff ``e`` means the read TARGET does not exist (yet) — the only
    error class bootstrap/resume paths may treat as "no output yet".
    Catalog misconfiguration and transient read failures must propagate:
    swallowing them silently reprocesses and appends duplicates (the
    resume_pending discipline, ADVICE r2)."""
    msg = str(e)
    return (
        "PATH_NOT_FOUND" in msg
        or "TABLE_OR_VIEW_NOT_FOUND" in msg
        or "Path does not exist" in msg
        or "UNABLE_TO_INFER_SCHEMA" in msg  # empty dir target
        or "Unable to infer schema" in msg
    )


def read_documents(spark: SparkSession, target: str) -> DataFrame:
    """Read a span-shaped table from an Iceberg identifier or parquet path."""
    if is_table_identifier(target):
        if not iceberg_available(spark):
            raise RuntimeError(
                f"{target!r} is a catalog table identifier but no Iceberg "
                "runtime is on the classpath"
            )
        return spark.read.table(target)
    return spark.read.parquet(target)


def current_snapshot_id(spark: SparkSession, target: str) -> str:
    """Input-snapshot lineage for the manifest: the Iceberg snapshot id for
    table targets, or a content-stable marker for parquet directories."""
    if is_table_identifier(target):
        if not iceberg_available(spark):
            raise RuntimeError("no Iceberg runtime for snapshot lookup")
        row = (
            spark.sql(f"SELECT snapshot_id FROM {target}.snapshots "
                      "ORDER BY committed_at DESC LIMIT 1").collect()
        )
        return str(row[0][0]) if row else ""
    # parquet fallback: the sorted file listing hashed is a deterministic
    # stand-in (changes iff the directory content changes)
    import hashlib
    import os

    names = []
    for root, _, files in os.walk(target):
        for f in sorted(files):
            if f.endswith(".parquet"):
                p = os.path.join(root, f)
                names.append(f"{os.path.relpath(p, target)}:{os.path.getsize(p)}")
    h = hashlib.sha256("\n".join(sorted(names)).encode()).hexdigest()
    return f"dir:{h[:16]}"
