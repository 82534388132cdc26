#!/usr/bin/env python3
"""Full local Spark-vs-DuckDB correctness sweep — every registered query.

The per-round driver samples ~50 of the registered contract queries; this
script runs ALL of them with the driver's exact comparison (row count,
name-sorted column set, order-insensitive value hash over a pandas
``sort_values``-canonicalized frame) and writes one JSON artifact so the
judge can diff builder-local coverage against driver coverage
(VERDICT r3 item 8).

Usage:
    python scripts/local_correctness.py [--sf-dir /root/testdata/sf0.01] \
        [--out CORRECTNESS_LOCAL_r04.json]
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _canon(v):
    import pandas as pd

    if v is None or v is pd.NA or (isinstance(v, float) and pd.isna(v)):
        return "<null>"
    if isinstance(v, bool):
        return str(v).lower()
    if isinstance(v, float):
        return repr(round(v, 9))
    return str(v)


def _value_hash(cols, rows):
    import pandas as pd

    df = pd.DataFrame(rows, columns=list(cols), dtype=object)
    df = df[sorted(df.columns)]
    if len(df):
        # the driver's canonicalization: pandas sort over raw values —
        # raises TypeError on non-scalar cells, by design
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    h = hashlib.sha256()
    for row in df.itertuples(index=False, name=None):
        h.update("|".join(_canon(v) for v in row).encode())
        h.update(b"\n")
    return h.hexdigest()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default="CORRECTNESS_LOCAL_r04.json")
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    import duckdb

    from modern_document_converter_for_ai_library_spark.plans import get_spark
    from modern_document_converter_for_ai_library_spark.queries import (
        ORACLE_SQL,
        SPARK_QUERIES,
    )

    spark = get_spark(
        app_name="mdcal-local-correctness",
        master=f"local[{args.cpus}]",
        shuffle_partitions=max(8, args.cpus),
    )
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            "CREATE VIEW %s AS SELECT * FROM read_parquet('%s/%s.parquet')"
            % (t, args.sf_dir, t)
        )

    results: dict[str, dict] = {}
    t_start = time.time()
    for name in sorted(SPARK_QUERIES):
        row = {
            "rows_match": None, "schema_match": None, "hash_match": None,
            "spark_rows": None, "oracle_rows": None, "err": None,
        }
        try:
            sdf = SPARK_QUERIES[name](spark, args.sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
            if name in ORACLE_SQL:
                res = con.execute(ORACLE_SQL[name])
                d_cols = [d[0] for d in res.description]
                d_rows = res.fetchall()
                row["spark_rows"] = len(s_rows)
                row["oracle_rows"] = len(d_rows)
                row["rows_match"] = len(s_rows) == len(d_rows)
                row["schema_match"] = sorted(s_cols) == sorted(d_cols)
                row["hash_match"] = _value_hash(s_cols, s_rows) == _value_hash(
                    d_cols, d_rows
                )
            else:
                # rows-only check, mirroring the driver's weaker gate
                row["spark_rows"] = len(s_rows)
                row["rows_match"] = len(s_rows) >= 0
        except Exception:
            row["err"] = traceback.format_exc()[-2000:]
        results[name] = row
        ok = row["err"] is None and row.get("hash_match") in (True, None) and row["rows_match"]
        print(f"{'OK ' if ok else 'FAIL'} {name}", file=sys.stderr)

    def _is_green(r):
        return (
            r["err"] is None
            and r["rows_match"]
            and r["schema_match"] in (True, None)
            and r["hash_match"] in (True, None)
        )

    # Two gate strengths, reported separately (ADVICE r4): an oracle-less
    # query can only fail by raising — its "green" is merely "ran" — so
    # folding both into one count overstates verification strength.
    n_green = sum(1 for r in results.values() if _is_green(r))
    n_oracle = sum(
        1
        for r in results.values()
        if _is_green(r) and r["hash_match"] is True
    )
    n_ran_only = sum(
        1
        for r in results.values()
        if _is_green(r) and r["hash_match"] is None
    )
    summary = {
        "total": len(results),
        "green": n_green,
        "green_oracle": n_oracle,
        "ran_only": n_ran_only,
        "sf_dir": args.sf_dir,
        "wall_sec": round(time.time() - t_start, 1),
    }
    with open(args.out, "w") as f:
        json.dump({"_summary": summary, **results}, f, indent=1)
    print(json.dumps(summary))
    spark.stop()
    return 0 if n_green == len(results) else 1


if __name__ == "__main__":
    raise SystemExit(main())
