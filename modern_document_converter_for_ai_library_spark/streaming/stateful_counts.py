"""Custom stateful streaming operator via ``applyInPandasWithState``.

Per-user running totals over the events stream: the per-group state is the
pair (n_events, sum_value_micros), updated as Arrow batches arrive and
emitted after every micro-batch. This is the template for custom stateful
operators that the built-in windowed aggregations cannot express (e.g.
per-entity dedup state, incremental document registries); state lives in the
checkpointed state store, so a restarted query resumes exactly.

Determinism: values are integer-quantized (floor(value * 1e6)) before
summation so emitted totals are exact integers — the same convention as the
batch queries (pkg/queries.py).
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value_micros", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value_micros", T.LongType()),
    ]
)


def _update_user_totals(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    if state.exists:
        n_events, sum_micros = state.get
    else:
        n_events, sum_micros = 0, 0
    for pdf in pdfs:
        n_events += len(pdf)
        if len(pdf):
            import numpy as np

            sum_micros += int(np.floor(pdf["value"].to_numpy() * 1_000_000).sum())
    state.update((n_events, sum_micros))
    yield pd.DataFrame(
        [{"user_id": key[0], "n_events": n_events, "sum_value_micros": sum_micros}]
    )


def user_totals_stream(
    spark: SparkSession,
    input_path: str,
    checkpoint_path: str,
    query_name: str = "user_totals",
    available_now: bool = True,
) -> StreamingQuery:
    """Start the stateful per-user totals query into a memory sink."""
    schema = spark.read.parquet(input_path).schema
    stream = spark.readStream.schema(schema).parquet(input_path)
    totals = stream.groupBy("user_id").applyInPandasWithState(
        _update_user_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    writer = (
        totals.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_path)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def batch_user_totals(events: DataFrame) -> DataFrame:
    """The batch equivalent the test compares against."""
    from pyspark.sql import functions as F

    return events.groupBy(F.col("user_id").cast("bigint").alias("user_id")).agg(
        F.count("*").cast("bigint").alias("n_events"),
        F.sum(F.floor(F.col("value") * 1_000_000)).cast("bigint").alias(
            "sum_value_micros"
        ),
    )
