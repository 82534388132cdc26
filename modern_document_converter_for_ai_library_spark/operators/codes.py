"""Distributed sequential code assignment (SURVEY.md §2.8 C4, §7 hard part 3).

The reference increments a SQLite counter per document — a global sequential
dependency. The distributed re-expression keeps the reference's determinism
contract (same input set => same codes; order = lexicographic doc_id, which
matches the reference's alphabetical processing order, orchestrator.py:96)
without a global single-reducer window:

  1. range-partition by the order column and sort within partitions;
  2. count rows per partition (tiny job: P rows to the driver);
  3. exclusive prefix-sum of the counts gives each partition its starting
     index; a single mapInPandas pass assigns ``start + local_rank`` while
     streaming through the partition.

The only data-wide movement is the range partition itself — the same shuffle
a global ``row_number() over (order by ...)`` would need for its sort, minus
the single-partition bottleneck where all rows funnel through one task.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..reference_semantics.codes import ALPHABET, CODE_LENGTH


def code_from_index_col(idx_col):
    """Columnar base-25 encode (C1) — pure JVM expression, WSCG-friendly."""
    digits = [
        F.expr(
            "substring('%s', CAST((%s div %d) %% 25 AS INT) + 1, 1)"
            % (ALPHABET, idx_col, 25 ** p)
        )
        for p in range(CODE_LENGTH - 1, -1, -1)
    ]
    return F.concat(*digits)


def assign_codes(
    df: DataFrame,
    order_col: str = "doc_id",
    start_index: int = 0,
    index_col: str = "code_index",
    num_partitions: int | None = None,
) -> DataFrame:
    """Add ``code_index`` (bigint) and ``unique_code`` columns.

    ``start_index`` continues a previous batch's allocation (recorded in the
    manifest table) — the distributed analogue of the registry's
    ``next_code_index`` row.
    """
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = max(df.rdd.getNumPartitions(), 1)

    ranged = df.repartitionByRange(num_partitions, F.col(order_col)).sortWithinPartitions(
        order_col
    )
    # Materialize the partitioning once so the count pass and the assign pass
    # see identical splits (range bounds come from sampling).
    ranged = ranged.persist()
    try:
        counts = {
            r["pid"]: r["cnt"]
            for r in ranged.groupBy(
                F.spark_partition_id().alias("pid")
            )
            .agg(F.count("*").alias("cnt"))
            .collect()
        }
        offsets = {}
        acc = start_index
        for pid in sorted(counts):
            offsets[pid] = acc
            acc += counts[pid]
        offsets_bc = spark.sparkContext.broadcast(offsets)

        with_pid = ranged.withColumn("_pid", F.spark_partition_id())
        out_schema = T.StructType(
            with_pid.schema.fields
            + [T.StructField(index_col, T.LongType(), False)]
        )

        def _assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            local = 0
            base = None
            for pdf in batches:
                if len(pdf) == 0:
                    yield pdf.assign(**{index_col: pd.Series([], dtype="int64")})
                    continue
                if base is None:
                    base = offsets_bc.value[int(pdf["_pid"].iloc[0])]
                idx = pd.Series(
                    range(base + local, base + local + len(pdf)), dtype="int64"
                )
                local += len(pdf)
                out = pdf.copy()
                out[index_col] = idx.values
                yield out

        assigned = with_pid.mapInPandas(_assign, schema=out_schema).drop("_pid")
        return assigned.withColumn("unique_code", code_from_index_col(index_col))
    finally:
        # The count pass above consumed the cache; the assign pass may
        # recompute the ranged lineage after this unpersist, which is safe:
        # range bounds are derived from a deterministic sample (fixed seed,
        # same input) so both passes see identical partition splits.
        ranged.unpersist()
