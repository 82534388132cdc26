#!/usr/bin/env python3
"""ANN recall/latency curve (VERDICT r2 item 4).

Sweeps the two approximate-search knobs against exact brute force on the
real testdata embeddings and reports recall@10 plus search wall time:

  IVF   n_centroids x n_probe grid (build once per n_centroids, 2 Lloyd
        rounds over the deterministic 1/5 id-mod sample — the q_ivf_topk
        build recipe)
  LSH   sign-hyperplane buckets, multi_probe in {0, 1}

Protocol matches tests/test_dedup_similarity.py: queries are vec_ids
100..115 (NOT centroid seeds), truth = brute_force_topk k=10, so recall is
out of 160. Usage:

    python scripts/ann_recall_bench.py [--sf-dir /root/testdata/sf0.01] \
        [--queries 16] [--md]

--md prints markdown table rows for BENCH/BASELINE.md.
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
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    ap.add_argument("--queries", type=int, default=16)
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    ap.add_argument("--md", action="store_true")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from modern_document_converter_for_ai_library_spark.operators.similarity import (
        brute_force_topk,
        ivf_build,
        ivf_search,
        lsh_bucketed_ann,
    )
    from modern_document_converter_for_ai_library_spark.plans import get_spark

    spark = get_spark(app_name="ann-recall-bench", master=f"local[{args.cpus}]")
    emb = spark.read.parquet(os.path.join(args.sf_dir, "embeddings.parquet"))
    emb = emb.persist()
    n_corpus = emb.count()
    qs = emb.filter(
        (F.col("vec_id") >= 100) & (F.col("vec_id") < 100 + args.queries)
    ).persist()
    n_q = qs.count()

    t0 = time.perf_counter()
    truth = brute_force_topk(emb, qs, k=10).collect()
    brute_sec = time.perf_counter() - t0
    tset = {(r["query_id"], r["vec_id"]) for r in truth}
    denom = len(tset)

    results = []

    def record(method, params, got_set, search_sec, build_sec=0.0):
        hits = len(got_set & tset)
        row = {
            "method": method,
            **params,
            "recall_at_10": hits,
            "recall_denom": denom,
            "recall_pct": round(100.0 * hits / denom, 1),
            "search_sec": round(search_sec, 2),
            "build_sec": round(build_sec, 2),
        }
        results.append(row)
        print(json.dumps(row), flush=True)

    record("brute", {}, tset, brute_sec)

    for n_centroids in (16, 32):
        t0 = time.perf_counter()
        assigned, cents = ivf_build(
            emb, n_centroids=n_centroids, lloyd_iterations=2, lloyd_sample_mod=5
        )
        assigned = assigned.persist()
        assigned.count()
        build_sec = time.perf_counter() - t0
        for n_probe in (2, 4, 8):
            t0 = time.perf_counter()
            got = ivf_search(assigned, cents, qs, k=10, n_probe=n_probe).collect()
            sec = time.perf_counter() - t0
            record(
                "ivf",
                {"n_centroids": n_centroids, "n_probe": n_probe},
                {(r["query_id"], r["vec_id"]) for r in got},
                sec,
                build_sec,
            )
        assigned.unpersist()

    from modern_document_converter_for_ai_library_spark.operators.pq import (
        pq_build,
        pq_search,
        pq_search_rerank,
    )

    for m, n_codes in ((8, 16), (16, 64)):
        t0 = time.perf_counter()
        encoded, codebook = pq_build(
            emb, m=m, n_codes=n_codes, lloyd_iterations=2
        )
        encoded = encoded.persist()
        encoded.count()
        build_sec = time.perf_counter() - t0
        t0 = time.perf_counter()
        got = pq_search(encoded, codebook, qs, k=10, m=m).collect()
        sec = time.perf_counter() - t0
        record(
            "pq_adc",
            {"m": m, "n_codes": n_codes},
            {(r["query_id"], r["vec_id"]) for r in got},
            sec,
            build_sec,
        )
        for shortlist in (50, 100):
            t0 = time.perf_counter()
            got = pq_search_rerank(
                encoded, codebook, emb, qs, k=10, shortlist=shortlist, m=m
            ).collect()
            sec = time.perf_counter() - t0
            record(
                "pq_rerank",
                {"m": m, "n_codes": n_codes, "shortlist": shortlist},
                {(r["query_id"], r["vec_id"]) for r in got},
                sec,
                build_sec,
            )
        encoded.unpersist()

    from modern_document_converter_for_ai_library_spark.operators.pq import (
        ivf_pq_search,
    )

    t0 = time.perf_counter()
    assigned, cents = ivf_build(
        emb, n_centroids=16, lloyd_iterations=2, lloyd_sample_mod=5
    )
    assigned = assigned.persist()
    assigned.count()
    encoded, codebook = pq_build(emb, m=16, n_codes=64, lloyd_iterations=2)
    encoded = encoded.persist()
    encoded.count()
    build_sec = time.perf_counter() - t0
    for n_probe in (4, 8):
        t0 = time.perf_counter()
        got = ivf_pq_search(
            assigned, cents, encoded, codebook, emb, qs,
            k=10, n_probe=n_probe, shortlist=50, m=16,
        ).collect()
        sec = time.perf_counter() - t0
        record(
            "ivfpq",
            {"n_centroids": 16, "n_probe": n_probe, "m": 16,
             "n_codes": 64, "shortlist": 50},
            {(r["query_id"], r["vec_id"]) for r in got},
            sec,
            build_sec,
        )
    assigned.unpersist()
    encoded.unpersist()

    for n_planes in (4, 8):
        for multi_probe in (0, 1):
            t0 = time.perf_counter()
            got = lsh_bucketed_ann(
                emb, qs, k=10, n_planes=n_planes, multi_probe=multi_probe
            ).collect()
            sec = time.perf_counter() - t0
            record(
                "lsh",
                {"n_planes": n_planes, "multi_probe": multi_probe},
                {(r["query_id"], r["vec_id"]) for r in got},
                sec,
            )

    print(json.dumps({"corpus": n_corpus, "queries": n_q, "sf_dir": args.sf_dir}))
    if args.md:
        print("\n| method | params | recall@10 | search sec |")
        print("|---|---|---|---|")
        for r in results:
            params = ", ".join(
                f"{k}={v}"
                for k, v in r.items()
                if k
                not in (
                    "method",
                    "recall_at_10",
                    "recall_denom",
                    "recall_pct",
                    "search_sec",
                    "build_sec",
                )
            )
            print(
                f"| {r['method']} | {params or '-'} | {r['recall_at_10']}/{r['recall_denom']}"
                f" ({r['recall_pct']}%) | {r['search_sec']} |"
            )
    spark.stop()


if __name__ == "__main__":
    main()
