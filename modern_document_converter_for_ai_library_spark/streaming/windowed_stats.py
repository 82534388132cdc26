"""Watermarked windowed aggregation over the events stream (SURVEY.md §2.9+).

The reference has no streaming story beyond change-detection resume; this is
the training-pipeline addition for continuous ingest telemetry: tumbling
event-time windows with a watermark bounding the state store, so late events
inside the allowed lateness still land in their window and state for closed
windows is evicted — the standard Structured Streaming pattern for unbounded
sources.

Semantics are identical to the batch `groupBy(window(ts), event_type)`
aggregation; the test asserts streaming-vs-batch equality on a bounded
(availableNow) run. On a cluster the source is a Kafka/Iceberg CDC stream;
the file source here is the sandbox stand-in.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def with_event_time(events: DataFrame) -> DataFrame:
    """NTZ -> TIMESTAMP cast for the event-time column (identity under the
    session's pinned UTC timezone; watermarks require TIMESTAMP)."""
    return events.withColumn("ts", F.col("ts").cast("timestamp"))


def windowed_event_agg(events: DataFrame, window_size: str = "1 hour") -> DataFrame:
    """The aggregation shared verbatim by the batch and streaming paths."""
    return (
        events.groupBy(F.window("ts", window_size), "event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.sum(F.floor(F.col("value") * 1_000_000))
            .cast("bigint")
            .alias("sum_value_micros"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value_micros",
        )
    )


def windowed_event_counts_stream(
    spark: SparkSession,
    input_path: str,
    checkpoint_path: str,
    query_name: str = "windowed_event_counts",
    window_size: str = "1 hour",
    watermark: str = "2 hours",
    available_now: bool = True,
) -> StreamingQuery:
    """Start the watermarked windowed aggregation into a memory sink.

    ``watermark`` bounds how late an event may arrive and still be counted;
    it also lets the state store drop windows older than
    (max event time - watermark) — without it an unbounded stream's window
    state grows forever. Output mode is ``append``: a window emits once its
    watermark passes (closed-window semantics; with availableNow the final
    batch flushes every window).
    """
    schema = spark.read.parquet(input_path).schema
    stream = with_event_time(spark.readStream.schema(schema).parquet(input_path))
    agg = windowed_event_agg(stream.withWatermark("ts", watermark), window_size)
    writer = (
        agg.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_path)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
