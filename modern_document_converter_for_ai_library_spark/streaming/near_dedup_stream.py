"""Streaming incremental NEAR-dedup: continuously-landing documents are
near-deduplicated against the accumulated kept corpus, micro-batch by
micro-batch (the training-data front door at crawl-ingest time).

Exact streaming dedup (dedup_stream.py) keys the state store with a
content hash; NEAR-dedup has no equality key, so the state is a TABLE —
the kept corpus — and each micro-batch runs
``near_dedup_incremental(batch, base)`` inside ``foreachBatch``:
batch-vs-base and batch-vs-batch candidates only, never base-vs-base
(operators/dedup.py). The base holds KEPT (canonical) docs only — a new
doc is compared against survivors, not against previously-dropped
near-duplicates; that bounds base growth to unique content, which is the
production compromise (a doc near-dupping a dropped doc but not its
canonical slips through — at high thresholds the gap is the S-curve
tail).

Idempotency: both the flagged output and the base delta are written to
``batch_id=N`` subdirectories with overwrite, so a replayed micro-batch
(foreachBatch is at-least-once) rewrites its own partition instead of
appending duplicates — the same per-partition idempotency contract as
the convert manifest sink.

With ``band_index_path`` the stream also maintains the stored LSH band
index (operators/dedup.py:band_index): each micro-batch READS the index
instead of re-shingling the whole accumulated base (at micro-batch
cadence the re-shingling cost is paid per trigger — the index turns it
into a slim scan), and writes its kept docs' band rows to its own
``batch_id=N`` subdirectory (same overwrite idempotency). A missing
index with a NONEMPTY base (the flag was enabled on an existing stream)
bootstraps the full base's rows into that batch's delta — a partial
index would silently miss base candidates.

Replay determinism: every read a batch makes EXCLUDES its own
``batch_id=N`` partition of the base and the index. foreachBatch is
at-least-once, so batch N can re-run after its own writes landed; if
the bootstrap decision looked at the raw index, the replay would see
"index exists", skip the bootstrap, and overwrite the bootstrap
subdirectory with the batch's kept rows alone — permanently dropping
every base doc's band rows. Filtering out the batch's own partition
makes each run of batch N a pure function of the state left by batches
< N (pinned by a direct double-invocation test).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..sources.synth import DOCS_SCHEMA


def _flat_text(df: DataFrame) -> DataFrame:
    """(doc_id, text) from the interleaved span shape — near-dup identity
    is over the concatenated text spans, the same identity the batch
    queries use."""
    return df.select(
        F.col("doc_id"),
        F.array_join(
            F.transform(
                F.filter(F.col("spans"), lambda s: s["kind"] == F.lit("text")),
                lambda s: s["text"],
            ),
            " ",
        ).alias("text"),
    )


def _read_prior_partitions(
    sess: SparkSession, path: str, batch_id: int
) -> DataFrame | None:
    """Read a batch_id-partitioned table EXCLUDING the current batch's own
    partition (replay determinism: a re-run of batch N must see exactly
    the state left by batches < N, never its own crashed writes), or None
    for a missing/empty target. Returns None also when only the current
    batch's partition exists (nothing prior)."""
    from pyspark.errors import AnalysisException

    from ..sources.catalog import is_missing_target_error

    try:
        df = sess.read.parquet(path)
    except AnalysisException as e:
        # only a missing/empty target means "nothing yet"; transient
        # read failures propagate (catalog.is_missing_target_error)
        if is_missing_target_error(e):
            return None
        raise
    if "batch_id" in df.columns:
        df = df.filter(F.col("batch_id") != batch_id).drop("batch_id")
    if df.isEmpty():
        return None
    return df


def process_near_dedup_batch(
    batch_df: DataFrame,
    batch_id: int,
    output_path: str,
    base_path: str,
    threshold_micros: int = 500_000,
    band_index_path: str | None = None,
) -> None:
    """One micro-batch of the streaming near-dedup — module-level so replay
    semantics are directly testable (call twice with the same batch_id:
    the second run must leave identical state)."""
    from ..operators.dedup import band_index, near_dedup_incremental

    sess = batch_df.sparkSession
    batch = _flat_text(batch_df)
    base = _read_prior_partitions(sess, base_path, batch_id)
    if base is None:
        base = sess.createDataFrame([], "doc_id string, text string")
    base = base.select("doc_id", "text").withColumn(
        "doc_id", F.col("doc_id").cast(batch.schema["doc_id"].dataType)
    )
    stored = None
    if band_index_path:
        stored = _read_prior_partitions(sess, band_index_path, batch_id)
        if stored is not None:
            stored = stored.withColumn(
                "doc_id",
                F.col("doc_id").cast(batch.schema["doc_id"].dataType),
            )
    flagged = near_dedup_incremental(
        batch, base, threshold_micros=threshold_micros, base_bands=stored
    )
    flagged.write.mode("overwrite").parquet(
        os.path.join(output_path, f"batch_id={batch_id}")
    )
    kept = sess.read.parquet(
        os.path.join(output_path, f"batch_id={batch_id}")
    ).filter(~F.col("is_near_duplicate")).select("doc_id", "text")
    kept.write.mode("overwrite").parquet(
        os.path.join(base_path, f"batch_id={batch_id}")
    )
    if band_index_path:
        delta = band_index(kept)
        if stored is None:
            # enabling the index on an existing stream: bootstrap the
            # whole base into this batch's delta (a PARTIAL index
            # would silently miss base candidates forever after). The
            # base bands are computed once here; the dedup pass above
            # derived its own from base text (base_bands=None) — at
            # micro-batch scale the duplicate banding is the bootstrap
            # trigger's one-off cost.
            delta = band_index(base).unionByName(delta)
        delta.write.mode("overwrite").parquet(
            os.path.join(band_index_path, f"batch_id={batch_id}")
        )


def near_dedup_stream(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    checkpoint_path: str,
    base_path: str,
    available_now: bool = True,
    threshold_micros: int = 500_000,
    max_files_per_trigger: int | None = None,
    band_index_path: str | None = None,
) -> StreamingQuery:
    reader = spark.readStream.schema(DOCS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(input_path)

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        process_near_dedup_batch(
            batch_df,
            batch_id,
            output_path,
            base_path,
            threshold_micros=threshold_micros,
            band_index_path=band_index_path,
        )

    writer = (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
