"""Streaming exact dedup: first occurrence survives across micro-batches
AND across a checkpointed restart; batch parity on the survivor set."""

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from modern_document_converter_for_ai_library_spark.sources.synth import DOCS_SCHEMA
from modern_document_converter_for_ai_library_spark.streaming.dedup_stream import (
    content_hash_col,
    dedup_stream,
)


def _doc(doc_id: str, text: str):
    return (
        doc_id,
        f"{doc_id}.pdf",
        [{"kind": "text", "text": text, "media_ref": "", "offset": 0}],
    )


def _write_batch(spark, path: str, name: str, rows):
    # the file stream source lists FILES in the directory (no recursion):
    # write to a scratch dir and move the single part file in as one file
    df = spark.createDataFrame(rows, schema=DOCS_SCHEMA)
    scratch = tempfile.mkdtemp(prefix="dstream_w_")
    try:
        df.coalesce(1).write.mode("overwrite").parquet(scratch)
        part = [f for f in os.listdir(scratch) if f.endswith(".parquet")][0]
        shutil.copy(
            os.path.join(scratch, part), os.path.join(path, f"{name}.parquet")
        )
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


def test_dedup_stream_across_batches_and_restart(spark):
    src = tempfile.mkdtemp(prefix="dstream_src_")
    out = tempfile.mkdtemp(prefix="dstream_out_")
    ckpt = tempfile.mkdtemp(prefix="dstream_ckpt_")
    try:
        _write_batch(
            spark, src, "b1", [_doc("a", "alpha text"), _doc("b", "beta text")]
        )
        q = dedup_stream(spark, src, out, ckpt)
        q.awaitTermination(120)
        got1 = {r["doc_id"] for r in spark.read.parquet(out).collect()}
        assert got1 == {"a", "b"}

        # second drop: one duplicate content (new doc_id), one new doc —
        # the restarted query must restore dedup state from the checkpoint
        _write_batch(
            spark, src, "b2", [_doc("a2", "alpha text"), _doc("c", "gamma text")]
        )
        q = dedup_stream(spark, src, out, ckpt)
        q.awaitTermination(120)
        rows = spark.read.parquet(out).collect()
        ids = {r["doc_id"] for r in rows}
        assert ids == {"a", "b", "c"}, ids  # a2 deduped against batch-1 'a'

        # survivor hash set equals the batch-dedup survivor hash set
        all_docs = spark.createDataFrame(
            [
                _doc("a", "alpha text"),
                _doc("b", "beta text"),
                _doc("a2", "alpha text"),
                _doc("c", "gamma text"),
            ],
            schema=DOCS_SCHEMA,
        ).withColumn("content_hash", content_hash_col())
        batch_hashes = {
            r["content_hash"]
            for r in all_docs.select("content_hash").distinct().collect()
        }
        assert {r["content_hash"] for r in rows} == batch_hashes
    finally:
        for d in (src, out, ckpt):
            shutil.rmtree(d, ignore_errors=True)


def test_dedup_stream_within_watermark_variant(spark):
    """The watermark-bounded variant must still dedup within one drain
    (all rows share one ingest window here) — exercises the
    dropDuplicatesWithinWatermark code path end-to-end."""
    src = tempfile.mkdtemp(prefix="dstreamw_src_")
    out = tempfile.mkdtemp(prefix="dstreamw_out_")
    ckpt = tempfile.mkdtemp(prefix="dstreamw_ckpt_")
    try:
        _write_batch(
            spark,
            src,
            "b1",
            [_doc("a", "alpha"), _doc("a2", "alpha"), _doc("b", "beta")],
        )
        q = dedup_stream(spark, src, out, ckpt, within_watermark="1 hour")
        q.awaitTermination(120)
        rows = spark.read.parquet(out).collect()
        hashes = [r["content_hash"] for r in rows]
        assert len(hashes) == len(set(hashes)) == 2  # alpha once, beta once
    finally:
        for d in (src, out, ckpt):
            shutil.rmtree(d, ignore_errors=True)
