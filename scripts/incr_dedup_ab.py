#!/usr/bin/env python3
"""Ingest-batch A/B: incremental near-dedup (stored band index) vs full
recompute, on a realistic-density corpus.

The claim under ``near_dedup_incremental`` (operators/dedup.py) is that an
ingest batch costs O(batch + touched-base), not O(corpus): the stored band
index (``band_index``) spares re-shingling the base text, and the broadcast
leftsemi on the batch's band keys prunes the base side to touched buckets
BEFORE the bucket aggregation — the base is scanned once, never shuffled.
This script measures both arms on the same corpus with one fresh JVM per
arm rep (warm-JVM ordering confounds A/Bs; see dedup_tier_ab.py):

    full  near_dedup(base ∪ batch, wide tier)      — what a naive daily
                                                      job would run
    incr  near_dedup_incremental(batch, base,       — the index is built
          base_bands=<stored index>)                  OUTSIDE the timed
                                                      region (it was built
                                                      at prior ingests);
                                                      its one-off cost is
                                                      reported separately

Corpus: ``--docs`` base documents of 60 tokens drawn from a 40k vocabulary
by md5 mixing (unique — the base was deduped at its own ingest, the
incremental tier's contract), plus a ``--batch-pct`` ingest batch where
``--dup-pct`` of batch docs near-duplicate a deterministic base doc (same
prefix stream, last 4 tokens replaced -> shingle Jaccard ~0.93). Both arms
must agree on the batch's duplicate count (asserted in the parent).

Prints one JSON line with per-arm wall seconds, batch docs/sec, the
speedup, and the amortized index build/write cost.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _corpus(spark, n_base: int, n_batch: int, dup_pct: int):
    """(base_df, batch_df): deterministic token-soup docs; batch doc b
    (0-indexed) is a near-dup of base doc (b*37) % n_base when
    b % 100 < dup_pct."""
    from pyspark.sql import functions as F

    def tok_exprs(src_expr: str, own_expr: str):
        exprs = []
        for t in range(60):
            src = own_expr if t >= 56 else src_expr
            exprs.append(
                "concat('w', conv(substring(md5(concat(cast(%s as string), '|', '%d')), 1, 8), 16, 10) %% 40000)"
                % (src, t)
            )
        return "concat_ws(' ', %s)" % ", ".join(exprs)

    base = spark.range(n_base).select(
        F.col("id").alias("doc_id"),
        F.expr(tok_exprs("id", "id")).alias("text"),
    )
    batch = (
        spark.range(n_batch)
        .withColumn("_is_dup", F.col("id") % 100 < dup_pct)
        .withColumn(
            "_src",
            F.when(F.col("_is_dup"), (F.col("id") * 37) % n_base).otherwise(
                F.col("id") + n_base
            ),
        )
        .select(
            (F.col("id") + n_base).alias("doc_id"),
            F.expr(tok_exprs("_src", "id + %d" % n_base)).alias("text"),
        )
    )
    return base, batch


def run_cand_stage(args, arm: str, base, batch, spark, n_batch: int) -> dict:
    """Candidate-pair generation ONLY — the stage the stored index + the
    touched-bucket semi-join actually optimize (verify + CC are
    candidate-proportional and identical in both arms, so at corpora near
    the measurement floor they drown the end-to-end ratio)."""
    from pyspark.sql import functions as F

    from modern_document_converter_for_ai_library_spark.operators.dedup import (
        band_index,
        incremental_candidate_pairs,
        minhash_wide_bands,
        minhash_wide_pairs,
    )

    if arm == "full":
        t0 = time.perf_counter()
        bands = minhash_wide_bands(base.unionByName(batch))
        n_cand = minhash_wide_pairs(bands, max_bucket_size=64).count()
        wall = time.perf_counter() - t0
        out = {"wall_sec": round(wall, 2), "n_candidates": n_cand}
    else:
        idx_path = os.path.join(args.workdir, "band_index")
        shutil.rmtree(idx_path, ignore_errors=True)
        t0 = time.perf_counter()
        band_index(base).write.parquet(idx_path)
        index_sec = time.perf_counter() - t0
        stored = spark.read.parquet(idx_path)

        # the ACTUAL operator kernel (shared with near_dedup_incremental),
        # so this arm cannot drift from what the operator runs
        t0 = time.perf_counter()
        nb = minhash_wide_bands(batch).withColumn("_is_new", F.lit(True))
        bb = stored.withColumn("_is_new", F.lit(False))
        pairs, nb_long = incremental_candidate_pairs(
            nb, bb, max_bucket_size=64, prune="broadcast"
        )
        n_cand = pairs.count()
        wall = time.perf_counter() - t0
        nb_long.unpersist()
        out = {
            "wall_sec": round(wall, 2),
            "n_candidates": n_cand,
            "index_build_sec": round(index_sec, 2),
        }
    print(json.dumps({arm: out, "n_base": args.docs, "n_batch": n_batch}))
    spark.stop()
    return out


def run_arm(args, arm: str) -> dict:
    os.environ.setdefault("SPARK_DRIVER_MEMORY", f"{args.cpus * 2}g")
    from modern_document_converter_for_ai_library_spark.plans import get_spark

    spark = get_spark(
        app_name=f"incr-dedup-{arm}",
        master=f"local[{args.cpus}]",
        shuffle_partitions=args.cpus * 2,
    )
    n_batch = args.docs * args.batch_pct // 100
    base, batch = _corpus(spark, args.docs, n_batch, args.dup_pct)
    base = base.persist()
    batch = batch.persist()
    base.count(), batch.count()  # corpus generation outside the timed region

    if args.stage == "cand":
        return run_cand_stage(args, arm, base, batch, spark, n_batch)
    if arm == "full":
        from modern_document_converter_for_ai_library_spark.operators.dedup import near_dedup

        t0 = time.perf_counter()
        marked = near_dedup(
            base.unionByName(batch),
            threshold_micros=args.threshold_micros,
            candidate_tier="wide",
            max_bucket_size=64,
        )
        n_dups = marked.filter(
            (marked.doc_id >= args.docs) & marked.is_near_duplicate
        ).count()
        wall = time.perf_counter() - t0
        index_sec = None
    else:
        from pyspark.sql import functions as F

        from modern_document_converter_for_ai_library_spark.operators.dedup import (
            band_index,
            near_dedup_incremental,
        )

        idx_path = os.path.join(args.workdir, "band_index")
        shutil.rmtree(idx_path, ignore_errors=True)
        t0 = time.perf_counter()
        band_index(base).write.parquet(idx_path)
        index_sec = time.perf_counter() - t0
        stored = spark.read.parquet(idx_path)
        t0 = time.perf_counter()
        marked = near_dedup_incremental(
            batch,
            base,
            threshold_micros=args.threshold_micros,
            max_bucket_size=64,
            base_bands=stored,
        )
        n_dups = marked.filter(F.col("is_near_duplicate")).count()
        wall = time.perf_counter() - t0
    out = {
        "wall_sec": round(wall, 2),
        "batch_docs_per_sec": round(n_batch / wall, 1),
        "n_batch_dups": n_dups,
    }
    if index_sec is not None:
        out["index_build_sec"] = round(index_sec, 2)
    print(json.dumps({arm: out, "n_base": args.docs, "n_batch": n_batch}))
    spark.stop()
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=450_000, help="base corpus size")
    ap.add_argument("--batch-pct", type=int, default=10,
                    help="ingest batch size as %% of base")
    ap.add_argument("--dup-pct", type=int, default=10,
                    help="%% of batch docs near-duplicating a base doc")
    ap.add_argument("--cpus", type=int, default=24)
    ap.add_argument("--threshold-micros", type=int, default=700_000)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--workdir", default="/tmp/mdcal_incr_ab")
    ap.add_argument("--arm", choices=["full", "incr", "both"], default="both")
    ap.add_argument("--stage", choices=["e2e", "cand"], default="e2e",
                    help="e2e = full dedup; cand = candidate-pair "
                         "generation only (what the index optimizes)")
    args = ap.parse_args()
    os.makedirs(args.workdir, exist_ok=True)

    if args.arm != "both":
        run_arm(args, args.arm)
        return

    import subprocess

    best: dict = {}
    for arm in ("full", "incr"):
        for _ in range(args.reps):
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--docs", str(args.docs), "--batch-pct", str(args.batch_pct),
                 "--dup-pct", str(args.dup_pct), "--cpus", str(args.cpus),
                 "--threshold-micros", str(args.threshold_micros),
                 "--workdir", args.workdir, "--arm", arm, "--reps", "1",
                 "--stage", args.stage],
                capture_output=True, text=True, timeout=3600,
            )
            if out.returncode != 0:
                raise RuntimeError(
                    f"{arm} rep failed (rc={out.returncode}):\n{out.stderr[-4000:]}"
                )
            line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
            r = json.loads(line)
            cur = best.get(arm)
            if cur is None or r[arm]["wall_sec"] < cur["wall_sec"]:
                best[arm] = r[arm]
                best["n_base"] = r["n_base"]
                best["n_batch"] = r["n_batch"]
    if args.stage == "e2e":
        assert best["full"]["n_batch_dups"] == best["incr"]["n_batch_dups"], (
            "arms disagree on the batch's duplicates: "
            f"{best['full']['n_batch_dups']} vs {best['incr']['n_batch_dups']}"
        )
    best["speedup"] = round(
        best["full"]["wall_sec"] / best["incr"]["wall_sec"], 2
    )
    print(json.dumps(best))


if __name__ == "__main__":
    main()
