"""Streaming exact dedup over a document stream (training-data front door:
continuously-landing crawl output deduplicated before conversion).

Built-in-first: the content hash (md5 of the canonical span JSON) keys
Structured Streaming's ``dropDuplicates`` — the state store keeps one
entry per distinct content corpus-so-far, so the FIRST occurrence is
emitted and every later one (same micro-batch, later micro-batch, or
after a restart from checkpoint) is dropped. No custom state code.

State growth: unbounded by default — correct for a bounded backfill or a
keyed retention job. For an endless stream pass ``within_watermark``
(e.g. "24 hours"): ``dropDuplicatesWithinWatermark`` then bounds state to
the watermark horizon, trading global dedup for windowed dedup — the
standard crawl-pipeline compromise (re-crawls of a page arrive within a
snapshot window).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..sources.synth import DOCS_SCHEMA


def content_hash_col():
    """md5 over the canonical JSON of the span array — byte-stable for a
    given span sequence, the same identity the resume manifest uses."""
    return F.md5(F.to_json(F.col("spans")))


def dedup_stream(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    checkpoint_path: str,
    available_now: bool = True,
    within_watermark: str | None = None,
) -> StreamingQuery:
    stream = spark.readStream.schema(DOCS_SCHEMA).parquet(input_path)
    hashed = stream.withColumn("content_hash", content_hash_col())
    if within_watermark is not None:
        hashed = hashed.withColumn(
            "ingest_ts", F.current_timestamp()
        ).withWatermark("ingest_ts", within_watermark)
        deduped = hashed.dropDuplicatesWithinWatermark(["content_hash"]).drop(
            "ingest_ts"
        )
    else:
        deduped = hashed.dropDuplicates(["content_hash"])
    writer = (
        deduped.writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
