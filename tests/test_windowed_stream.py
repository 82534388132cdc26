"""Watermarked windowed streaming aggregation vs its batch equivalent."""

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from modern_document_converter_for_ai_library_spark.streaming.windowed_stats import (
    windowed_event_agg,
    windowed_event_counts_stream,
    with_event_time,
)

SF_DIR = "/root/testdata/sf0.01"


def test_streaming_windows_match_batch_up_to_watermark(spark):
    ckpt = tempfile.mkdtemp(prefix="wstream_ckpt_")
    # the file stream source needs a DIRECTORY of files
    src_dir = tempfile.mkdtemp(prefix="wstream_src_")
    shutil.copy(f"{SF_DIR}/events.parquet", os.path.join(src_dir, "part-0.parquet"))
    try:
        q = windowed_event_counts_stream(
            spark,
            src_dir,
            ckpt,
            query_name="wtest",
            window_size="1 hour",
            watermark="2 hours",
        )
        q.awaitTermination(120)

        streamed = {
            (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value_micros"])
            for r in spark.sql("select * from wtest").collect()
        }

        events = with_event_time(spark.read.parquet(f"{SF_DIR}/events.parquet"))
        batch_df = windowed_event_agg(events, "1 hour")
        # append mode emits a window only once the watermark passes its end:
        # final watermark = max event time - 2h
        max_ts = events.agg(F.max("ts")).collect()[0][0]
        batch = {
            (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value_micros"])
            for r in batch_df.collect()
            if (max_ts - r["window_end"]).total_seconds() >= 2 * 3600
        }

        assert len(streamed) > 100  # a month of hourly windows x types
        # every emitted window agrees with batch exactly
        for k, v in streamed.items():
            assert batch.get(k) == v, k
        # and all watermark-closed batch windows were emitted
        assert set(batch) <= set(streamed)
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)
        shutil.rmtree(src_dir, ignore_errors=True)
