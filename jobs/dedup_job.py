#!/usr/bin/env python3
"""spark-submit entry point for corpus deduplication (training-data tier).

Usage (cluster):

    zip -r mdcal.zip modern_document_converter_for_ai_library_spark
    spark-submit --py-files mdcal.zip jobs/dedup_job.py \
        --input lake.db.documents --output lake.db.documents_dedup \
        --dupmap lake.db.duplicate_map --tier near --threshold 0.8

Tiers:
    exact   md5 content grouping (one shuffle)
    near    MinHash -> banded LSH -> exact-Jaccard verify -> connected
            components (operators/dedup.py:near_dedup)

Outputs:
    --output   the SURVIVORS (canonical docs only) — the deduplicated corpus
    --dupmap   (doc_id, canonical_doc_id, is_duplicate) for every input doc —
               the audit/provenance table a training pipeline joins against

Input/output targets accept Iceberg identifiers or parquet paths
(sources/catalog.py). The job prints one JSON line with corpus/survivor
counts and the duplicate rate.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True, help="deduplicated survivors")
    p.add_argument("--dupmap", default=None, help="doc->canonical map table")
    p.add_argument("--tier", choices=["exact", "near"], default="near")
    p.add_argument("--threshold", type=float, default=0.8,
                   help="near tier: Jaccard threshold (0..1)")
    p.add_argument("--n-bands", type=int, default=2)
    p.add_argument("--band-rows", type=int, default=2)
    p.add_argument("--max-bucket-size", type=int, default=100_000,
                   help="LSH bucket skew cap (dropped buckets audited)")
    p.add_argument("--text-col", default="text")
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--master", default=None)
    args = p.parse_args(argv)

    from pyspark.sql import functions as F

    from modern_document_converter_for_ai_library_spark.operators.dedup import (
        exact_dedup,
        near_dedup,
    )
    from modern_document_converter_for_ai_library_spark.plans import get_spark
    from modern_document_converter_for_ai_library_spark.sources.catalog import (
        read_documents,
        write_documents,
    )

    from pyspark.sql import SparkSession

    pre_existing = SparkSession.getActiveSession() is not None
    spark = get_spark(app_name=f"mdcal-dedup-{args.tier}", master=args.master)
    try:
        docs = read_documents(spark, args.input)
        if args.tier == "exact":
            marked = exact_dedup(docs, text_col=args.text_col, id_col=args.id_col)
            dup_col = "is_duplicate"
        else:
            marked = near_dedup(
                docs,
                text_col=args.text_col,
                id_col=args.id_col,
                threshold_micros=int(args.threshold * 1_000_000),
                n_bands=args.n_bands,
                band_rows=args.band_rows,
                max_bucket_size=args.max_bucket_size,
            )
            dup_col = "is_near_duplicate"
        marked = marked.persist()
        survivors = marked.filter(~F.col(dup_col)).drop(
            "canonical_doc_id", dup_col
        )
        write_documents(survivors, args.output, mode="overwrite")
        if args.dupmap:
            write_documents(
                marked.select(args.id_col, "canonical_doc_id", F.col(dup_col)),
                args.dupmap,
                mode="overwrite",
            )
        n_total = marked.count()
        n_survivors = survivors.count()
        print(
            json.dumps(
                {
                    "tier": args.tier,
                    "n_docs": n_total,
                    "n_survivors": n_survivors,
                    "duplicate_rate": round(1 - n_survivors / max(n_total, 1), 6),
                }
            )
        )
        return 0
    finally:
        if not pre_existing:
            # keep an embedding caller's (e.g. test harness) session alive
            spark.stop()


if __name__ == "__main__":
    sys.exit(main())
