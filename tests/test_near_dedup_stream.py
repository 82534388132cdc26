"""Streaming incremental near-dedup: micro-batches dedup against the
accumulated kept corpus (cross-batch detection via the base table), and a
replayed batch id overwrites its own partition (idempotent)."""

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from modern_document_converter_for_ai_library_spark.sources.synth import DOCS_SCHEMA
from modern_document_converter_for_ai_library_spark.streaming.near_dedup_stream import (
    near_dedup_stream,
)

BASE_TEXT = (
    "the quick brown fox jumps over the lazy dog while the band plays "
    "a slow waltz under paper lanterns in the crowded summer square"
)


def _doc(doc_id: str, text: str):
    return (
        doc_id,
        f"{doc_id}.pdf",
        [{"kind": "text", "text": text, "media_ref": "", "offset": 0}],
    )


def _write_batch(spark, path: str, name: str, rows):
    df = spark.createDataFrame(rows, schema=DOCS_SCHEMA)
    scratch = tempfile.mkdtemp(prefix="ndstream_w_")
    try:
        df.coalesce(1).write.mode("overwrite").parquet(scratch)
        part = [f for f in os.listdir(scratch) if f.endswith(".parquet")][0]
        shutil.copy(
            os.path.join(scratch, part), os.path.join(path, f"{name}.parquet")
        )
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


def test_near_dedup_stream_cross_batch(spark):
    src = tempfile.mkdtemp(prefix="ndstream_src_")
    out = tempfile.mkdtemp(prefix="ndstream_out_")
    ckpt = tempfile.mkdtemp(prefix="ndstream_ckpt_")
    base = tempfile.mkdtemp(prefix="ndstream_base_")
    shutil.rmtree(base)  # stream creates it
    try:
        # phase 1: a + its near-dup a2 + unique c
        _write_batch(
            spark, src, "b1",
            [
                _doc("a", BASE_TEXT),
                _doc("a2", BASE_TEXT + " with a tiny suffix appended"),
                _doc("c", "completely different content about gardening and bread recipes today"),
            ],
        )
        q = near_dedup_stream(spark, src, out, ckpt, base)
        q.awaitTermination(180)
        got1 = {
            r["doc_id"]: (r["canonical_doc_id"], r["is_near_duplicate"])
            for r in spark.read.parquet(out).collect()
        }
        assert got1["a"] == ("a", False)
        assert got1["a2"] == ("a", True)
        assert got1["c"] == ("c", False)
        kept1 = {r["doc_id"] for r in spark.read.parquet(base).collect()}
        assert kept1 == {"a", "c"}

        # phase 2 (restart from checkpoint): a3 near-dups the BASE doc a;
        # d is new. Only the new file is processed.
        _write_batch(
            spark, src, "b2",
            [
                _doc("a3", BASE_TEXT + " and one more little twist"),
                _doc("d", "sailing ships and harbor towns feature in this other text"),
            ],
        )
        q = near_dedup_stream(spark, src, out, ckpt, base)
        q.awaitTermination(180)
        got2 = {
            r["doc_id"]: (r["canonical_doc_id"], r["is_near_duplicate"])
            for r in spark.read.parquet(out).collect()
        }
        assert got2["a3"] == ("a", True)  # matched against the BASE corpus
        assert got2["d"] == ("d", False)
        kept2 = {r["doc_id"] for r in spark.read.parquet(base).collect()}
        assert kept2 == {"a", "c", "d"}
        # phase-1 rows unchanged in the output
        assert got2["a"] == ("a", False) and got2["a2"] == ("a", True)
    finally:
        for p in (src, out, ckpt, base):
            shutil.rmtree(p, ignore_errors=True)


def test_near_dedup_stream_band_index_maintained(spark):
    """With band_index_path the stream reads the stored index per
    micro-batch and appends its kept docs' band rows; cross-batch
    detection works THROUGH the index, and the index tracks exactly the
    kept corpus. Phase 3 deletes nothing and replays fine because each
    batch owns its own subdirectory."""
    import tempfile

    src = tempfile.mkdtemp(prefix="ndstream2_src_")
    out = tempfile.mkdtemp(prefix="ndstream2_out_")
    ckpt = tempfile.mkdtemp(prefix="ndstream2_ckpt_")
    base = tempfile.mkdtemp(prefix="ndstream2_base_")
    idx = tempfile.mkdtemp(prefix="ndstream2_idx_")
    shutil.rmtree(base)
    shutil.rmtree(idx)
    try:
        _write_batch(
            spark, src, "b1",
            [
                _doc("a", BASE_TEXT),
                _doc("a2", BASE_TEXT + " with a tiny suffix appended"),
                _doc("c", "completely different content about gardening and bread recipes today"),
            ],
        )
        q = near_dedup_stream(spark, src, out, ckpt, base, band_index_path=idx)
        q.awaitTermination(180)
        kept1 = {r["doc_id"] for r in spark.read.parquet(base).collect()}
        assert kept1 == {"a", "c"}
        idx1 = {r["doc_id"] for r in spark.read.parquet(idx).collect()}
        assert idx1 == kept1  # index tracks exactly the kept corpus

        # phase 2: a3 must match base doc a THROUGH the stored index
        _write_batch(
            spark, src, "b2",
            [
                _doc("a3", BASE_TEXT + " and one more little twist"),
                _doc("d", "sailing ships and harbor towns feature in this other text"),
            ],
        )
        q = near_dedup_stream(spark, src, out, ckpt, base, band_index_path=idx)
        q.awaitTermination(180)
        got = {
            r["doc_id"]: (r["canonical_doc_id"], r["is_near_duplicate"])
            for r in spark.read.parquet(out).collect()
        }
        assert got["a3"] == ("a", True)
        assert got["d"] == ("d", False)
        idx2 = {r["doc_id"] for r in spark.read.parquet(idx).collect()}
        assert idx2 == {"a", "c", "d"}
        # index rows are the real band layout (+ the batch_id partition
        # column the per-batch subdirectory layout surfaces on read)
        cols = spark.read.parquet(idx).columns
        assert set(cols) == {"doc_id", "batch_id"} | {
            f"band_{k}" for k in range(16)
        }
    finally:
        for p in (src, out, ckpt, base, idx):
            shutil.rmtree(p, ignore_errors=True)


def test_near_dedup_stream_index_enabled_midlife_bootstraps(spark):
    """Enabling band_index_path on an EXISTING stream bootstraps the whole
    base into the first indexed batch's delta — no silent partial index."""
    import tempfile

    src = tempfile.mkdtemp(prefix="ndstream3_src_")
    out = tempfile.mkdtemp(prefix="ndstream3_out_")
    ckpt = tempfile.mkdtemp(prefix="ndstream3_ckpt_")
    base = tempfile.mkdtemp(prefix="ndstream3_base_")
    idx = tempfile.mkdtemp(prefix="ndstream3_idx_")
    shutil.rmtree(base)
    shutil.rmtree(idx)
    try:
        # phase 1 WITHOUT the index
        _write_batch(
            spark, src, "b1",
            [_doc("a", BASE_TEXT),
             _doc("c", "completely different content about gardening and bread recipes today")],
        )
        q = near_dedup_stream(spark, src, out, ckpt, base)
        q.awaitTermination(180)
        # phase 2 WITH the index: a4 must still match base doc a, and the
        # index delta must contain the bootstrapped base rows
        _write_batch(
            spark, src, "b2",
            [_doc("a4", BASE_TEXT + " trailing change here")],
        )
        q = near_dedup_stream(spark, src, out, ckpt, base, band_index_path=idx)
        q.awaitTermination(180)
        got = {
            r["doc_id"]: (r["canonical_doc_id"], r["is_near_duplicate"])
            for r in spark.read.parquet(out).collect()
        }
        assert got["a4"] == ("a", True)
        idx_ids = {r["doc_id"] for r in spark.read.parquet(idx).collect()}
        assert idx_ids == {"a", "c"}  # bootstrapped base; a4 was dropped
    finally:
        for p in (src, out, ckpt, base, idx):
            shutil.rmtree(p, ignore_errors=True)


def test_bootstrap_replay_is_idempotent(spark, tmp_path):
    """The review scenario: enable the index mid-life, then REPLAY the
    bootstrapping batch (foreachBatch is at-least-once — the stream can
    crash after the index write but before the checkpoint commit). The
    replay must regenerate the SAME bootstrap delta, not overwrite it
    with the batch's kept rows alone (which would permanently drop every
    base doc's band rows from the index)."""
    from modern_document_converter_for_ai_library_spark.sources.synth import DOCS_SCHEMA
    from modern_document_converter_for_ai_library_spark.streaming.near_dedup_stream import (
        process_near_dedup_batch,
    )

    out = str(tmp_path / "out")
    base = str(tmp_path / "base")
    idx = str(tmp_path / "idx")
    # pre-existing base from earlier (un-indexed) batches 0 and 1
    for bid, (did, text) in enumerate(
        [("a", BASE_TEXT),
         ("c", "completely different content about gardening and bread recipes today")]
    ):
        spark.createDataFrame([_doc(did, text)], schema=DOCS_SCHEMA).select(
            "doc_id",
            F.array_join(
                F.transform(F.col("spans"), lambda s: s["text"]), " "
            ).alias("text"),
        ).write.parquet(f"{base}/batch_id={bid}")

    batch = spark.createDataFrame(
        [_doc("a4", BASE_TEXT + " trailing change here"),
         _doc("n1", "novel text about mountain weather patterns and snow")],
        schema=DOCS_SCHEMA,
    )

    def idx_state():
        df = spark.read.parquet(idx)
        return sorted(
            (r["doc_id"],) + tuple(r[f"band_{k}"] for k in range(16))
            for r in df.collect()
        )

    process_near_dedup_batch(batch, 2, out, base, band_index_path=idx)
    first = idx_state()
    assert {r[0] for r in first} == {"a", "c", "n1"}  # bootstrap + kept

    # replay batch 2 over its own crashed writes: state must be identical
    process_near_dedup_batch(batch, 2, out, base, band_index_path=idx)
    assert idx_state() == first
    # and the flagged output is identical too
    got = {
        r["doc_id"]: (r["canonical_doc_id"], r["is_near_duplicate"])
        for r in spark.read.parquet(out).collect()
    }
    assert got["a4"] == ("a", True) and got["n1"] == ("n1", False)
