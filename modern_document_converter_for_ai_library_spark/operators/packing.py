"""Sequence packing for pretraining-batch construction.

Groups documents into fixed-token-budget sequences (the step between a
cleaned corpus and a trainer's dataloader): greedy first-fit-in-order —
each doc joins the current sequence unless it would overflow the budget,
in which case a new sequence starts; a single doc larger than the budget
gets a sequence of its own.

Greedy packing is prefix-dependent (where one sequence ends depends on
every doc before it), so it is NOT expressible as a distributed prefix
sum. The scalable compromise, standard in practice: pack WITHIN
deterministic buckets — parallel across buckets, sequential (inside one
Arrow kernel) within. Bucket boundaries are doc_id keys from a VALUE-derived
sample frozen as driver literals (see ``_value_sampled_bounds`` — one
notch stronger than operators/codes.py's per-partition sampling), so the
assignment is a pure function of row values: identical output for any
partitioning, caching, or lineage recompute.
Cross-bucket waste is bounded by one partially-filled sequence per
bucket — negligible when buckets hold thousands of documents.

``seq_id = bucket * 2^32 + local_seq`` — globally unique, stable.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_BUCKET = "__pack_bucket"


def _value_sampled_bounds(
    df: DataFrame, id_col: str, num_buckets: int, n_rows: int
) -> list:
    """Bucket boundary keys from a VALUE-derived sample (xxhash64(id) % mod
    == 0), frozen as driver literals. Unlike rdd-style sampling — which
    draws per-partition with a partition-indexed seed, so a repartition
    re-draws the sample — a value-derived sample is a pure function of row
    values: the same corpus yields the same bounds under ANY partitioning.
    That is the stronger guarantee packing needs (same corpus => same
    sequences on any cluster layout)."""
    if num_buckets <= 1 or n_rows == 0:
        return []
    mod = max(1, n_rows // (num_buckets * 100))
    sample = sorted(
        r[0]
        for r in df.select(id_col)
        .filter(F.pmod(F.xxhash64(F.col(id_col)), F.lit(mod)) == 0)
        .collect()
    )
    if not sample:
        return []
    bounds = []
    for i in range(1, num_buckets):
        b = sample[min(len(sample) - 1, i * len(sample) // num_buckets)]
        if not bounds or b > bounds[-1]:
            bounds.append(b)
    return bounds


def pack_sequences(
    df: DataFrame,
    budget_tokens: int,
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
    num_buckets: int | None = None,
    bucket_col: str | None = None,
) -> DataFrame:
    """Returns ``df`` + (``seq_id`` bigint, ``seq_pos`` bigint): which
    packed sequence each document belongs to and its position inside it.
    Documents are packed in ``id_col`` order within each bucket.

    ``bucket_col`` lets the caller bring their own deterministic bucket
    assignment (an existing layout key, a modulus, an engine-portable
    expression for oracle checks); otherwise buckets derive from
    value-sampled ``id_col`` range bounds."""
    if budget_tokens <= 0:
        raise ValueError("budget_tokens must be positive")
    if bucket_col is not None:
        with_bucket = df.withColumn(_BUCKET, F.col(bucket_col).cast("bigint"))
    else:
        if num_buckets is None:
            num_buckets = max(df.rdd.getNumPartitions(), 1)
        n_rows = df.count()
        bounds = _value_sampled_bounds(df, id_col, num_buckets, n_rows)
        if bounds:
            bucket_expr = F.size(
                F.filter(
                    F.array(*[F.lit(b) for b in bounds]),
                    lambda b: F.col(id_col) >= b,
                )
            )
        else:
            bucket_expr = F.lit(0)
        with_bucket = df.withColumn(_BUCKET, bucket_expr.cast("bigint"))

    out_schema = T.StructType(
        with_bucket.schema.fields
        + [
            T.StructField("seq_id", T.LongType(), False),
            T.StructField("seq_pos", T.LongType(), False),
        ]
    )

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        bucket = int(pdf[_BUCKET].iloc[0]) if len(pdf) else 0
        seqs, poss = [], []
        cur_tokens, seq, pos = 0, 0, 0
        for t in pdf[token_col]:
            t = int(t)
            if cur_tokens > 0 and cur_tokens + t > budget_tokens:
                seq += 1
                cur_tokens, pos = 0, 0
            seqs.append((bucket << 32) | seq)
            poss.append(pos)
            cur_tokens += t
            pos += 1
        return pdf.assign(
            seq_id=pd.Series(seqs, dtype="int64"),
            seq_pos=pd.Series(poss, dtype="int64"),
        )

    packed = with_bucket.groupBy(_BUCKET).applyInPandas(_pack, schema=out_schema)
    return packed.drop(_BUCKET)


def packing_stats(packed: DataFrame, token_col: str = "n_tokens") -> DataFrame:
    """(seq_id, n_docs, seq_tokens) — the fill audit for a packed corpus."""
    return packed.groupBy("seq_id").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum(token_col).cast("bigint").alias("seq_tokens"),
    )
