#!/usr/bin/env python3
"""Marginal-cost probe for select_representatives (BENCH/BASELINE.md).

Runs the SAME end-to-end near_dedup job twice on a realistic-density
deterministic corpus (mostly-unique docs + a planted near-dup fraction,
the dedup_tier_ab.py recipe) — once plain, once with the score-argmax
representative-selection layer on top — in FRESH subprocess JVMs, and
reports both walls. The layer's claim: the argmax aggregation touches
only multi-member-cluster docs, so its marginal cost stays ~flat in the
corpus and bounded by the duplicate fraction.

Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_once(docs: int, cpus: int, with_select: bool) -> float:
    os.environ.setdefault("SPARK_DRIVER_MEMORY", f"{cpus * 2}g")
    from pyspark.sql import functions as F

    from modern_document_converter_for_ai_library_spark.operators.dedup import (
        near_dedup,
        select_representatives,
    )
    from modern_document_converter_for_ai_library_spark.plans import get_spark

    spark = get_spark(
        app_name="rep-select-probe",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus * 2,
    )
    # deterministic corpus, same shape as dedup_tier_ab.py: doc i draws 60
    # tokens from a 40k vocab by md5 mixing; ids with i % 100 < 10 are
    # near-dups of their i-1 neighbor (one-token tail edit). WRITTEN to
    # parquet untimed, so the timed section measures the operator over a
    # real table scan, not re-execution of the generator lineage (a
    # parquet input is the job's actual shape).
    path = f"/tmp/rep_select_probe_corpus_{docs}"
    if not os.path.exists(path + "/_SUCCESS"):
        base = spark.range(docs).select(
            F.col("id").alias("doc_id"),
            F.when(F.col("id") % 100 < 10, (F.col("id") - 1))
            .otherwise(F.col("id"))
            .alias("seed"),
            (F.col("id") % 100 < 10).alias("_is_dup"),
        )
        words = F.transform(
            F.sequence(F.lit(0), F.lit(59)),
            lambda j: F.concat(
                F.lit("w"),
                F.conv(
                    F.substring(F.md5(F.concat_ws("-", "seed", j)), 1, 4),
                    16,
                    10,
                )
                % 40_000,
            ),
        )
        base.select(
            "doc_id",
            F.when(
                F.col("_is_dup"),
                F.concat_ws(
                    " ",
                    F.concat(F.slice(words, 1, 59), F.array(F.lit("tail"))),
                ),
            )
            .otherwise(F.concat_ws(" ", words))
            .alias("text"),
        ).write.mode("overwrite").parquet(path)
    corpus = spark.read.parquet(path)
    t = time.time()
    out = near_dedup(
        corpus, threshold_micros=700_000, candidate_tier="bands",
        n_bands=2, band_rows=2, max_bucket_size=100_000,
    )
    if with_select:
        out = out.withColumn(
            "score", F.size(F.split("text", " ")).cast("bigint")
        )
        out = select_representatives(out, "score")
    n = out.count()
    wall = time.time() - t
    spark.stop()
    return wall if n == docs else -1.0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=500_000)
    ap.add_argument("--cpus", type=int, default=24)
    ap.add_argument("--mode", choices=["plain", "select", "both"], default="both")
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    if args.mode == "both":
        # fresh JVM per rep — warm-JVM ordering confounds A/Bs here
        import subprocess

        best: dict = {"docs": args.docs, "cpus": args.cpus}
        for mode in ("plain", "select"):
            for _ in range(args.reps):
                out = subprocess.run(
                    [sys.executable, os.path.abspath(__file__),
                     "--docs", str(args.docs), "--cpus", str(args.cpus),
                     "--mode", mode, "--reps", "1"],
                    capture_output=True, text=True, timeout=3600,
                )
                line = [
                    l for l in out.stdout.splitlines() if l.startswith("{")
                ][-1]
                wall = json.loads(line)[mode]
                if mode not in best or wall < best[mode]:
                    best[mode] = wall
        best["marginal_sec"] = round(best["select"] - best["plain"], 2)
        best["marginal_pct"] = round(
            100 * (best["select"] / best["plain"] - 1), 1
        )
        print(json.dumps(best))
        return

    wall = run_once(args.docs, args.cpus, args.mode == "select")
    print(json.dumps({args.mode: round(wall, 2)}))


if __name__ == "__main__":
    main()
