#!/usr/bin/env python3
"""spark-submit entry point for corpus mixing (training-data tier).

Usage (cluster):

    zip -r mdcal.zip modern_document_converter_for_ai_library_spark
    spark-submit --py-files mdcal.zip jobs/mix_job.py \
        --input lake.db.documents --output lake.db.documents_mixed \
        --mode budget --spec "web=2000000000,code=500000000" --default 0

Modes (operators/sampling.py — all deterministic pure functions of
(doc_id, salt), reproducible on any engine / partitioning / cluster size):

    rate    hash-threshold stratified sampling; spec values are rates in
            MICROS of probability (600000 = keep ~60% of the source)
    budget  token-budget prefix: keep each source's docs in hash-priority
            order until the source's token budget fills (spec values are
            token budgets)
    epochs  budget with UPSAMPLING: budgets above a source's token mass
            emit full repeat epochs + a prefix remainder; output rows are
            per emitted COPY with an `epoch` column
    temperature  share_i ∝ mass_i^alpha rebalancing (--alpha 1|1/2|1/4,
            --target-total docs, --mass docs|tokens): rare sources are
            upweighted toward uniform as alpha drops; no --spec needed —
            rates derive from the corpus itself (exact integer roots)
    shuffle deterministic global training-order shuffle: graft a
            `shuffle_rank` column (exact 0-based position in the seeded
            (60-bit hash, id) permutation —
            operators/sampling.py:corpus_shuffle);
            --salt picks the permutation (a new salt = a new epoch order);
            a pre-existing shuffle_rank column is replaced
    shard   terminal storage layout: assign every document to a fixed-
            token-mass shard (--shard-tokens) by start offset in the
            canonical hash-priority order and write the corpus
            PARTITIONED BY (key, shard_id) — shard ids are per key, so
            the key must be part of the physical layout or one directory
            would pool shard 0 of every source — plus a per-shard
            manifest table at --manifest (default <output>_manifest)

Input/output targets accept Iceberg identifiers or parquet paths
(sources/catalog.py). The job prints one JSON line with document/token
accounting per run.
"""

from __future__ import annotations

import argparse
import json
import sys


def parse_spec(spec: str) -> dict[str, int]:
    """'src0=3500,src1=0' -> {'src0': 3500, 'src1': 0} (empty spec ok)."""
    out: dict[str, int] = {}
    for part in filter(None, (p.strip() for p in (spec or "").split(","))):
        key, _, val = part.partition("=")
        if not _:
            raise ValueError(f"spec entry {part!r} is not key=value")
        out[key.strip()] = int(val)
    return out


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True, help="the mixed corpus")
    p.add_argument("--mode",
                   choices=["rate", "budget", "epochs", "shard",
                            "temperature", "shuffle"],
                   default="budget")
    p.add_argument("--alpha", choices=["1", "1/2", "1/4"], default="1/2",
                   help="temperature mode: share exponent")
    p.add_argument("--target-total", type=int, default=0,
                   help="temperature mode: total kept mass to aim for")
    p.add_argument("--mass", choices=["docs", "tokens"], default="docs",
                   help="temperature mode: source mass measure")
    p.add_argument("--shard-tokens", type=int, default=0,
                   help="shard mode: target token mass per shard")
    p.add_argument("--manifest", default=None,
                   help="shard mode: manifest target "
                        "(default <output>_manifest for path targets)")
    p.add_argument("--spec", default="",
                   help="per-source values: 'key=value,key=value' "
                        "(rate: micros; budget/epochs: token budgets)")
    p.add_argument("--default", type=int, default=0,
                   help="value for sources absent from --spec")
    p.add_argument("--salt", default="",
                   help="decorrelates independent samples of one corpus")
    p.add_argument("--key-col", default="source")
    p.add_argument("--text-col", default="text")
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--master", default=None)
    args = p.parse_args(argv)

    spec = parse_spec(args.spec)
    if args.mode == "temperature" and args.target_total <= 0:
        raise SystemExit("--mode temperature requires --target-total > 0")

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from modern_document_converter_for_ai_library_spark.operators.sampling import (
        budget_sample,
        epoch_budget_sample,
        shard_assign,
        shard_manifest,
        stratified_sample,
    )
    from modern_document_converter_for_ai_library_spark.plans import get_spark
    from modern_document_converter_for_ai_library_spark.sources.catalog import (
        read_documents,
        write_documents,
    )

    pre_existing = SparkSession.getActiveSession() is not None
    spark = get_spark(app_name=f"mdcal-mix-{args.mode}", master=args.master)
    try:
        docs = read_documents(spark, args.input)
        common = dict(
            key_col=args.key_col, id_col=args.id_col, salt=args.salt
        )
        if args.mode == "shuffle":
            from modern_document_converter_for_ai_library_spark.operators.sampling import (
                corpus_shuffle,
            )

            shuffled = corpus_shuffle(
                docs.drop("shuffle_rank"), id_col=args.id_col, salt=args.salt
            ).persist()
            write_documents(shuffled, args.output, mode="overwrite")
            n = shuffled.count()
            print(
                json.dumps(
                    {
                        "mode": "shuffle",
                        "n_docs": n,
                        "salt": args.salt,
                        "max_rank": n - 1,
                    }
                )
            )
            shuffled.unpersist()
            return 0
        if args.mode == "shard":
            if args.shard_tokens <= 0:
                raise SystemExit("--mode shard requires --shard-tokens > 0")
            assigned = shard_assign(
                docs, args.shard_tokens, text_col=args.text_col, **common
            )
            # only shard_id is grafted on (token counts live in the
            # manifest) — and a pre-existing shard_id column is replaced,
            # so re-sharding an already-sharded corpus works
            sharded = docs.drop("shard_id").join(
                assigned.select(args.id_col, "shard_id"),
                on=args.id_col,
                how="inner",
            ).persist()
            write_documents(
                sharded, args.output, mode="overwrite",
                partition_by=[args.key_col, "shard_id"],
            )
            man = shard_manifest(
                assigned, key_col=args.key_col
            ).persist()
            manifest_target = args.manifest or (args.output + "_manifest")
            write_documents(man, manifest_target, mode="overwrite")
            stats = man.agg(
                F.count("*").alias("n_shards"),
                F.sum("shard_token_count").alias("tokens_out"),
                F.max("shard_token_count").alias("max_shard_tokens"),
            ).collect()[0]
            print(
                json.dumps(
                    {
                        "mode": "shard",
                        "n_docs_in": docs.count(),
                        "n_rows_out": sharded.count(),
                        "tokens_out": int(stats["tokens_out"] or 0),
                        "n_shards": int(stats["n_shards"]),
                        "max_shard_tokens": int(
                            stats["max_shard_tokens"] or 0
                        ),
                        "manifest": manifest_target,
                    }
                )
            )
            sharded.unpersist()
            man.unpersist()
            return 0
        if args.mode == "temperature":
            from modern_document_converter_for_ai_library_spark.operators.sampling import (
                temperature_sample,
            )
            from modern_document_converter_for_ai_library_spark.operators.quality import (
                _tokens,
            )

            base = docs
            mass_col = None
            if args.mass == "tokens":
                base = docs.withColumn(
                    "_n_tokens", F.size(_tokens(args.text_col))
                )
                mass_col = "_n_tokens"
            marked = temperature_sample(
                base,
                source_col=args.key_col,
                alpha=args.alpha,
                target_total=args.target_total,
                id_col=args.id_col,
                salt=args.salt,
                mass_col=mass_col,
            )
            kept = marked.filter("sampled").drop(
                "hash_micros", "sampled", "rate_micros", "_n_tokens"
            )
        elif args.mode == "rate":
            marked = stratified_sample(
                docs, spec, default_micros=args.default, **common
            )
            kept = marked.filter("sampled").drop("hash_micros", "sampled")
        elif args.mode == "budget":
            sel = budget_sample(
                docs, spec, text_col=args.text_col,
                default_budget=args.default, **common
            ).filter("kept")
            kept = docs.join(
                sel.select(args.id_col), on=args.id_col, how="leftsemi"
            )
        else:  # epochs — one output row per emitted COPY, epoch-tagged
            sel = epoch_budget_sample(
                docs, spec, text_col=args.text_col,
                default_budget=args.default, **common
            )
            kept = docs.join(
                sel.select(args.id_col, "epoch"), on=args.id_col, how="inner"
            )
        kept = kept.persist()
        write_documents(kept, args.output, mode="overwrite")

        from modern_document_converter_for_ai_library_spark.operators.quality import (
            _tokens,
        )

        toks = _tokens(args.text_col)
        n_in = docs.count()
        n_out = kept.count()
        tokens_out = (
            kept.select(F.sum(F.size(toks)).alias("t")).collect()[0]["t"] or 0
        )
        print(
            json.dumps(
                {
                    "mode": args.mode,
                    "n_docs_in": n_in,
                    "n_rows_out": n_out,
                    "tokens_out": int(tokens_out),
                }
            )
        )
        kept.unpersist()
        return 0
    finally:
        if not pre_existing:
            # keep an embedding caller's (e.g. test harness) session alive
            spark.stop()


if __name__ == "__main__":
    sys.exit(main())
