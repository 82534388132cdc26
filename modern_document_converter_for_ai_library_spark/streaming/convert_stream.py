"""Structured Streaming variant of the convert job (SURVEY.md §2.9).

The reference is a batch CLI whose incremental story is change-detection +
skip; the streaming variant generalizes it: new document files landing in the
input directory are converted continuously. The pipeline is stateless
(per-document kernels), so it composes directly with ``readStream`` — no
watermarks or state store needed. Exactly-once delivery comes from the
checkpointed file-source offsets + idempotent parquet sink.

On a cluster this reads an Iceberg table's incremental snapshots; the file
source here is the sandbox stand-in.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQuery

from ..operators.convert import convert_documents
from ..sources.synth import DOCS_SCHEMA


def convert_stream(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    checkpoint_path: str,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
) -> StreamingQuery:
    """Start (and return) the streaming convert query.

    ``available_now=True`` drains everything currently in the source then
    stops — the batch-compatible mode used by tests and backfills. Leave it
    False for a continuously running pipeline.
    """
    reader = spark.readStream.schema(DOCS_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(input_path)

    out = convert_documents(stream)

    writer = (
        out.writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
