#!/usr/bin/env python3
"""A/B the as-of join's skew escape hatch on a planted giant key.

Synthesizes an events corpus where one "bot" key owns a large share of
all rows (the hot-key shape real event streams have), then measures
``asof_join`` plain (per-key window: the giant key's whole history sorts
on ONE task) vs ``chunk_seconds`` (per-(key, chunk) windows + the tiny
carry pass). Equality of the two outputs is asserted on a sample before
timing. Appends/refreshes a row in BENCH/BASELINE.md by hand — this
script just prints the JSON.

Usage: python scripts/asof_skew_bench.py [--rows 4000000] [--cpus 24]
       [--bot-share 0.4] [--chunk 3600]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=4_000_000)
    ap.add_argument("--cpus", type=int, default=24)
    ap.add_argument("--bot-share", type=float, default=0.4)
    ap.add_argument("--chunk", type=int, default=3600)
    ap.add_argument("--keys", type=int, default=5000)
    args = ap.parse_args()

    os.environ.setdefault("SPARK_DRIVER_MEMORY", f"{args.cpus * 2}g")
    from modern_document_converter_for_ai_library_spark.operators.asof import (
        asof_join,
    )
    from modern_document_converter_for_ai_library_spark.plans import get_spark

    spark = get_spark(
        app_name="asof-skew-bench",
        master=f"local[{args.cpus}]",
        shuffle_partitions=args.cpus * 2,
    )
    from pyspark.sql import functions as F

    # deterministic synthetic events: key 0 is the bot (bot_share of all
    # rows); timestamps spread over ~46 days so the 1h chunking yields
    # ~1.1k chunks; md5-derived pseudo-randomness, no RNG state
    n = args.rows
    bot_cut = int(args.bot_share * (1 << 15))
    base = (
        spark.range(n)
        .withColumn("_h", F.conv(F.substring(F.md5(F.col("id").cast("string")), 1, 8), 16, 10).cast("bigint"))
        .withColumn(
            "k",
            F.when((F.col("_h") % (1 << 15)) < bot_cut, F.lit(0)).otherwise(
                (F.col("_h") % args.keys) + 1
            ),
        )
        .withColumn("ts", (F.col("_h") * F.lit(7919) + F.col("id")) % F.lit(4_000_000))
        .drop("_h")
    )
    left = base.filter(F.col("id") % 4 == 0).select(
        "k", "ts", F.col("id").alias("lid")
    )
    right = base.filter(F.col("id") % 4 != 0).select(
        "k", "ts", F.col("id").alias("rid")
    )
    left.persist().count()
    right.persist().count()

    # correctness first: both plans agree on a 1/512 sample of left rows
    sample = left.filter(F.col("lid") % 512 == 0)
    plain_s = asof_join(sample, right, by="k").orderBy("lid")
    chunk_s = asof_join(sample, right, by="k", chunk_seconds=args.chunk).orderBy("lid")
    assert [r.asDict() for r in plain_s.collect()] == [
        r.asDict() for r in chunk_s.collect()
    ], "chunked != plain on the sample"

    def timed(chunk_seconds):
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            asof_join(
                left, right, by="k", chunk_seconds=chunk_seconds
            ).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        return best

    plain = timed(None)
    chunked = timed(args.chunk)
    print(
        json.dumps(
            {
                "rows": n,
                "cpus": args.cpus,
                "bot_share": args.bot_share,
                "chunk_seconds": args.chunk,
                "plain_sec": round(plain, 2),
                "chunked_sec": round(chunked, 2),
                "speedup": round(plain / chunked, 2),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
