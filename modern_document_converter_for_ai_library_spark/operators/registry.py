"""Registry query surface (SURVEY.md §2.1 S13, §2.6 O2, §2.4 A7).

The reference registry is SQLite; ours is the rename output table (one row
per document with code/claim outcome — operators/rename.py). These
operators reproduce the registrar's read surface:

  list_documents       registrar.py:487-516 (filter, ORDER BY recency DESC,
                       LIMIT) — insertion recency == processing order ==
                       lexicographic doc_id in our functional registry, so
                       recency-desc is doc_id-desc
  registry_statistics  registrar.py:639-676 (total, by-type, allocated
                       codes, code status, next index) as one long-format
                       (metric, key, value) DataFrame
  export_registry_json registrar.py:678-693 — distributed JSON export:
                       documents + statistics as JSON part-files (the
                       reference writes one json file; a directory of parts
                       is the cluster-shaped equivalent, coalesce for tiny
                       registries)
"""

from __future__ import annotations

import os
from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def list_documents(
    registry_df: DataFrame,
    document_type: Optional[str] = None,
    limit: Optional[int] = None,
    order_col: str = "doc_id",
) -> DataFrame:
    """Documents ordered newest-first with optional type filter and limit."""
    out = registry_df
    if document_type is not None:
        out = out.filter(F.col("document_type") == document_type)
    out = out.orderBy(F.desc(order_col))
    if limit is not None:
        out = out.limit(limit)
    return out


def registry_statistics(registry_df: DataFrame, start_index: int = 0) -> DataFrame:
    """Long-format (metric, key, value) statistics table.

    ``allocated_codes`` counts the codes TABLE, not committed documents:
    a discovered code whose every claimant later failed registration was
    still inserted by its first claimant (code_exists guard only skips the
    insert, code_generator.py:392-436), so the union of held codes and
    discovered codes reproduces the sqlite table's cardinality. Failed
    fresh allocations never inserted (IntegrityError) and are excluded.
    """
    held = registry_df.filter(F.col("unique_code").isNotNull()).select(
        F.col("unique_code").alias("code")
    )
    discovered = registry_df.filter(F.col("discovered_code").isNotNull()).select(
        F.col("discovered_code").alias("code")
    )
    codes = held.unionByName(discovered).distinct()
    in_use = held.distinct()

    def _row(metric, key, value):
        return F.struct(
            F.lit(metric).alias("metric"),
            key.alias("key"),
            value.cast("bigint").alias("value"),
        )

    total = registry_df.agg(
        _row("total_documents", F.lit(""), F.count("*")).alias("r")
    ).select("r.*")
    by_type = (
        registry_df.groupBy("document_type")
        .agg(F.count("*").alias("n"))
        .select(
            F.lit("by_type").alias("metric"),
            F.coalesce(F.col("document_type"), F.lit("")).alias("key"),
            F.col("n").cast("bigint").alias("value"),
        )
    )
    allocated = codes.agg(
        _row("allocated_codes", F.lit(""), F.count("*")).alias("r")
    ).select("r.*")
    n_in_use = in_use.agg(F.count("*").alias("n"))
    n_codes = codes.agg(F.count("*").alias("n"))
    status = (
        n_in_use.crossJoin(n_codes.withColumnRenamed("n", "n_all"))
        .select(
            F.explode(
                F.array(
                    F.struct(
                        F.lit("code_status").alias("metric"),
                        F.lit("in_use").alias("key"),
                        F.col("n").cast("bigint").alias("value"),
                    ),
                    F.struct(
                        F.lit("code_status").alias("metric"),
                        F.lit("allocated").alias("key"),
                        (F.col("n_all") - F.col("n")).cast("bigint").alias("value"),
                    ),
                )
            ).alias("r")
        )
        .select("r.*")
    )
    next_index = registry_df.agg(
        _row(
            "next_code_index",
            F.lit(""),
            F.coalesce(F.max("code_index") + 1, F.lit(start_index)),
        ).alias("r")
    ).select("r.*")
    return total.unionByName(by_type).unionByName(allocated).unionByName(
        status
    ).unionByName(next_index)


def export_registry_json(
    registry_df: DataFrame,
    output_dir: str,
    start_index: int = 0,
    single_file: bool = False,
) -> None:
    """JSON export: ``{output_dir}/documents`` + ``{output_dir}/statistics``."""
    docs = registry_df
    stats = registry_statistics(registry_df, start_index=start_index)
    if single_file:
        docs = docs.coalesce(1)
        stats = stats.coalesce(1)
    docs.write.mode("overwrite").json(os.path.join(output_dir, "documents"))
    stats.write.mode("overwrite").json(os.path.join(output_dir, "statistics"))
