#!/usr/bin/env python3
"""Candidate-precision A/B: narrow (4-perm) vs production-width (128-perm)
MinHash candidate tiers on a REALISTIC-density corpus.

The boilerplate-heavy scaling corpus cannot separate the tiers (every page
near-dups thousands of others; verify cost dominates both — noted in
BENCH/BASELINE.md). This corpus has the shape dedup actually runs on:
mostly-unique docs from a large vocabulary plus a planted near-duplicate
fraction, so candidate DILUTION — how many false candidates the banding
emits per true pair — is measurable. The wide tier's steep S-curve
(1-(1-J^8)^16) should emit far fewer sub-threshold candidates than the
narrow r=2 curve (~J^2) at equal recall on the planted pairs.

Prints one JSON line with per-tier candidate count, verified-pair count,
planted-pair recall, precision, and wall seconds.
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
    ap.add_argument("--docs", type=int, default=200_000)
    ap.add_argument("--dup-frac-pct", type=int, default=10)
    ap.add_argument("--cpus", type=int, default=24)
    ap.add_argument("--threshold-micros", type=int, default=700_000)
    ap.add_argument("--tier", choices=["narrow", "wide", "both"], default="both")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    if args.tier == "both":
        # one FRESH JVM per tier rep (warm-JVM ordering confounded the
        # first measurement of this A/B: the second tier ran ~3x faster
        # purely from codegen/JIT warmup); best-of-reps per tier
        import subprocess

        best = {}
        for tier in ("narrow", "wide"):
            for _ in range(args.reps):
                out = subprocess.run(
                    [sys.executable, os.path.abspath(__file__),
                     "--docs", str(args.docs), "--cpus", str(args.cpus),
                     "--dup-frac-pct", str(args.dup_frac_pct),
                     "--threshold-micros", str(args.threshold_micros),
                     "--tier", tier, "--reps", "1"],
                    capture_output=True, text=True, timeout=3600,
                )
                line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
                r = json.loads(line)
                cur = best.get(tier)
                if cur is None or r[tier]["wall_sec"] < cur["wall_sec"]:
                    best[tier] = r[tier]
                    best["docs"] = r["docs"]
                    best["planted_pairs"] = r["planted_pairs"]
                    best["threshold_micros"] = r["threshold_micros"]
        print(json.dumps(best))
        return

    os.environ.setdefault("SPARK_DRIVER_MEMORY", f"{args.cpus * 2}g")
    from pyspark.sql import functions as F

    from modern_document_converter_for_ai_library_spark.operators.dedup import (
        jaccard_verify,
        lsh_candidate_pairs,
        minhash_bands,
        minhash_wide_bands,
        minhash_wide_pairs,
    )
    from modern_document_converter_for_ai_library_spark.functions.hashing import (
        shingle_hashes_col,
        tokens_col,
    )
    from modern_document_converter_for_ai_library_spark.plans import get_spark

    spark = get_spark(
        app_name="dedup-tier-ab",
        master=f"local[{args.cpus}]",
        shuffle_partitions=args.cpus * 2,
    )

    # deterministic corpus: doc i draws 60 tokens from a 40k-word vocab by
    # md5 mixing; docs with id % 100 < dup_frac_pct are near-dups of a
    # "seed" doc (same prefix stream, last 4 tokens replaced -> shingle
    # Jaccard ~0.93, above the 0.7 threshold). Planted pair = (seed, dup).
    n = args.docs
    dup_pct = args.dup_frac_pct
    # dup docs are those with 1 <= id%100 <= dup_pct; their seed is the
    # century head (id%100 == 0), which is never itself a dup — no chains
    base_id = F.when(
        (F.col("id") % 100 >= 1) & (F.col("id") % 100 <= dup_pct),
        F.col("id") - (F.col("id") % 100),
    ).otherwise(F.col("id"))
    # token t of doc: md5(mix of base_id and t) mod vocab, except the last
    # 4 tokens of a dup doc which mix the REAL id (the edit)
    tok_exprs = []
    for t in range(60):
        src = "id" if t >= 56 else "_base"
        tok_exprs.append(
            "concat('w', conv(substring(md5(concat(cast(%s as string), '|', '%d')), 1, 8), 16, 10) %% 40000)"
            % (src, t)
        )
    docs = (
        spark.range(n)
        .withColumn("_base", base_id)
        .withColumn(
            "is_dup",
            (F.col("id") % 100 >= 1) & (F.col("id") % 100 <= dup_pct),
        )
        .select(
            F.col("id").alias("doc_id"),
            "_base",
            "is_dup",
            F.expr("concat_ws(' ', %s)" % ", ".join(tok_exprs)).alias("text"),
        )
    )
    docs.persist().count()
    planted = docs.filter("is_dup").select(
        F.col("_base").alias("a"), F.col("doc_id").alias("b")
    )
    n_planted = planted.count()

    def verify(pairs, label):
        sets_df = docs.withColumn("_tokens", tokens_col("text")).select(
            "doc_id", shingle_hashes_col(F.col("_tokens"), 3).alias("shingle_hashes")
        )
        v = jaccard_verify(sets_df, pairs, threshold_micros=args.threshold_micros)
        return v

    results = {}
    for label in ([args.tier] if args.tier != "both" else ["narrow", "wide"]):
        t0 = time.perf_counter()
        if label == "narrow":
            bands = minhash_bands(docs, n_bands=2, band_rows=2)
            pairs = lsh_candidate_pairs(
                bands, n_bands=2, max_bucket_size=64, pre_aggregated=True
            ).persist()
        else:
            bands = minhash_wide_bands(docs)
            pairs = minhash_wide_pairs(bands, max_bucket_size=64).persist()
        n_cand = pairs.count()
        verified = verify(pairs, label).persist()
        n_ver = verified.count()
        hit = verified.join(
            planted,
            ((verified.a == planted.a) & (verified.b == planted.b))
            | ((verified.a == planted.b) & (verified.b == planted.a)),
            "leftsemi",
        ).count()
        dt = time.perf_counter() - t0
        results[label] = {
            "candidates": n_cand,
            "verified_pairs": n_ver,
            "planted_recalled": hit,
            "candidate_precision": round(n_ver / n_cand, 4) if n_cand else None,
            "wall_sec": round(dt, 2),
        }
        pairs.unpersist()
        verified.unpersist()
    print(
        json.dumps(
            {
                "docs": n,
                "planted_pairs": n_planted,
                "threshold_micros": args.threshold_micros,
                **results,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
