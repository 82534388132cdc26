"""Custom stateful streaming operator (applyInPandasWithState) vs batch."""

import os
import shutil
import tempfile

from modern_document_converter_for_ai_library_spark.streaming.stateful_counts import (
    batch_user_totals,
    user_totals_stream,
)

SF_DIR = "/root/testdata/sf0.01"


def test_stateful_user_totals_match_batch(spark):
    ckpt = tempfile.mkdtemp(prefix="sstate_ckpt_")
    src_dir = tempfile.mkdtemp(prefix="sstate_src_")
    shutil.copy(f"{SF_DIR}/events.parquet", os.path.join(src_dir, "part-0.parquet"))
    try:
        q = user_totals_stream(spark, src_dir, ckpt, query_name="stest")
        q.awaitTermination(120)

        # update mode re-emits a user's row on every batch it appears in;
        # the LAST emission per user is the final state
        rows = spark.sql("select * from stest").collect()
        streamed = {}
        for r in rows:
            streamed[r["user_id"]] = (r["n_events"], r["sum_value_micros"])

        batch = {
            r["user_id"]: (r["n_events"], r["sum_value_micros"])
            for r in batch_user_totals(
                spark.read.parquet(f"{SF_DIR}/events.parquet")
            ).collect()
        }
        assert len(batch) > 50
        assert streamed == batch
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)
        shutil.rmtree(src_dir, ignore_errors=True)
