#!/usr/bin/env python3
"""Production-width SimHash bench (VERDICT r2 item 5): confirm the
bucket-cardinality claim behind the 64-bit / 16-bit-band shape and measure
the banded Hamming join at scale.

Corpus: N deterministic synthetic sketches generated JVM-side — the base
sketch is the binary expansion of md5(id) (uniform over 2^64, the
random-projection ideal), plus a near-dup tail (ids % dup_mod == 0 get a
twin with 1..3 bits flipped at id-derived positions, i.e. real pairs the
join must find). Reported per band: distinct buckets, mean/max bucket
size, candidate pairs sum(C(size,2)); then wall time + pair count of
simhash_pairs(n_bits=64, n_bands=4, max_hamming=3).

For contrast the same study runs at the demo width (16-bit sketches =
4-bit bands) on the SAME corpus truncated to 16 bits — showing why narrow
bands cannot scale: 2^4 buckets per band make the candidate term
quadratic in N.

Usage: python scripts/simhash_bench.py [--n 500000] [--cpus 16] [--demo-n 20000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _sketches(spark, n: int, dup_mod: int, n_bits: int = 64):
    from pyspark.sql import functions as F

    base = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lpad(F.conv(F.substring(F.md5(F.col("id").cast("string")), 1, 8), 16, 2), 32, "0"),
            F.lpad(F.conv(F.substring(F.md5(F.col("id").cast("string")), 9, 8), 16, 2), 32, "0"),
        ).alias("simhash_bits"),
    )
    # twins: flip 1 + id%3 bits at deterministic positions
    twins = base.filter(F.col("doc_id") % dup_mod == 0)
    s = F.col("simhash_bits")
    for k in range(3):
        # flip position p_k = (doc_id * (k+7)) % 64, only when k < 1 + id%3
        p = (F.col("doc_id") * (k + 7)) % 64 + 1  # 1-based
        ch = F.substring(s, p.cast("int"), 1)
        flipped = F.concat(
            F.expr(f"substring(simhash_bits, 1, cast((doc_id * {k + 7}) % 64 as int))"),
            F.when(ch == "1", F.lit("0")).otherwise(F.lit("1")),
            F.expr(
                f"substring(simhash_bits, cast((doc_id * {k + 7}) % 64 as int) + 2, "
                f"64 - cast((doc_id * {k + 7}) % 64 as int) - 1)"
            ),
        )
        twins = twins.withColumn(
            "simhash_bits",
            F.when(F.lit(k) < 1 + F.col("doc_id") % 3, flipped).otherwise(s),
        )
    twins = twins.select((F.col("doc_id") + n).alias("doc_id"), "simhash_bits")
    out = base.unionByName(twins)
    if n_bits != 64:
        out = out.select(
            "doc_id", F.substring("simhash_bits", 1, n_bits).alias("simhash_bits")
        )
    return out


def _band_stats(df, n_bits: int, n_bands: int):
    from pyspark.sql import functions as F

    w = n_bits // n_bands
    stats = []
    for k in range(n_bands):
        g = df.groupBy(
            F.substring("simhash_bits", 1 + k * w, w).alias("band")
        ).count()
        row = g.agg(
            F.count("*").alias("buckets"),
            F.avg("count").alias("mean"),
            F.max("count").alias("max"),
            F.sum(F.col("count") * (F.col("count") - 1) / 2).alias("cand_pairs"),
        ).collect()[0]
        stats.append(
            {
                "band": k,
                "buckets": row["buckets"],
                "mean_size": round(float(row["mean"]), 2),
                "max_size": int(row["max"]),
                "cand_pairs": int(row["cand_pairs"]),
            }
        )
    return stats


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=500_000)
    ap.add_argument("--demo-n", type=int, default=20_000)
    ap.add_argument("--dup-mod", type=int, default=50)
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "16")))
    args = ap.parse_args()

    from modern_document_converter_for_ai_library_spark.operators.dedup import (
        simhash_pairs,
    )
    from modern_document_converter_for_ai_library_spark.plans import get_spark

    spark = get_spark(
        app_name="simhash-bench",
        master=f"local[{args.cpus}]",
        shuffle_partitions=max(8, args.cpus * 2),
    )

    for label, n, n_bits, n_bands in (
        ("production_64bit_16bit_bands", args.n, 64, 4),
        ("demo_16bit_4bit_bands", args.demo_n, 16, 4),
    ):
        df = _sketches(spark, n, args.dup_mod, n_bits=n_bits).persist()
        total = df.count()
        stats = _band_stats(df, n_bits, n_bands)
        t0 = time.perf_counter()
        n_pairs = simhash_pairs(
            df, n_bits=n_bits, n_bands=n_bands, max_hamming=3
        ).count()
        sec = time.perf_counter() - t0
        df.unpersist()
        print(
            json.dumps(
                {
                    "config": label,
                    "n_sketches": total,
                    "band_width_bits": n_bits // n_bands,
                    "bucket_space": 2 ** (n_bits // n_bands),
                    "bands": stats,
                    "pairs_within_3": n_pairs,
                    "join_sec": round(sec, 2),
                    "pairs_per_sec": round(total / sec, 1),
                }
            ),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
