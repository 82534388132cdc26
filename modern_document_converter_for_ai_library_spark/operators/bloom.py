"""Distributed Bloom filter — cross-snapshot membership without a join.

The primitive a continuously-crawled corpus needs at 100 TB: "has this
content hash EVER been kept before?" asked against billions of historical
keys, without shuffling the history next to today's batch. A Bloom filter
answers with zero false negatives and a tunable false-positive rate
``(1 - e^(-k*n/m))^k`` for ``n`` inserted keys, ``m`` bits, ``k`` probes
(Bloom 1970, CACM 13(7)).

Spark shape — everything stays relational and codegen:

  build   explode each key's ``k`` bit positions (md5-derived double
          hashing, Kirsch-Mitzenmacher 2006: ``pos_i = (h1 + i*(2*h2+1))
          % m`` — the odd multiplier makes the stride coprime with the
          power-of-two ``m``), partial-aggregated ``bit_or`` per 64-bit
          word, then densify into ONE ``array<bigint>`` row per shard.
          Output is ``n_shards`` rows of ``m/64`` longs — broadcastable
          state, bounded by construction, never by data volume.

  member  a broadcast equi-join on the shard id grafts the right array
          onto every probe row (one shard -> a constant key -> the whole
          filter rides along as a 128 KB broadcast); the verdict is the
          ``k`` probe-bit tests UNROLLED into one ANDed shift/AND
          conjunction over materialized h1/h2 columns — pure whole-stage
          codegen, ZERO data-side shuffle, no Python, no interpreted
          higher-order lambdas.

  merge   two filters over the same (m, k, n_shards) OR together
          word-wise (``zip_with``) — the merge law that lets every
          ingest batch publish its own filter and readers fold them.

Scale note: one shard of ``m = 2^30`` bits is a 128 MB array — at the
broadcast comfort limit. Past that, raise ``n_shards`` (keys route to
shards by an md5 slice INDEPENDENT of the probe hashes): the filter
becomes an (shard, array) table and the member join distributes or
broadcasts per Spark's own threshold; total bits = ``n_shards * m``.

No reference counterpart — the reference processes single folders and
has no membership structure; this is the training-data-pipeline tier
(SURVEY.md round-3 addendum).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

WORD_BITS = 64

# Hot-path discipline: every per-row expression below is a FLAT projection
# over materialized h1/h2 columns with the probe index k unrolled as a
# literal — never a transform/forall lambda. Higher-order functions are
# INTERPRETED expressions in Spark (no whole-stage codegen), and a lambda
# body re-evaluates md5 PER ELEMENT: the first cut of bloom_member probed
# via forall(transform(...)) and evaluated ~11 interpreted md5 calls per
# row — measured >2x the wall of the ENTIRE unfiltered ExactSubstr job it
# was supposed to accelerate (same trap BENCH/BASELINE.md documents at 8x
# for the simhash sketch builder).


def _hash_cols(df: DataFrame, key_col: str, n_shards: int) -> DataFrame:
    """Materialize (_bf_h1, _bf_h2, _bf_shard) as flat codegen columns —
    ONE md5 per row, sliced three ways. The shard slice is independent of
    the probe slices so shard routing does not correlate with positions
    inside the shard's filter."""
    return df.withColumn(
        "_bf_md5", F.expr(f"md5(CAST({key_col} AS STRING))")
    ).select(
        "*",
        F.expr(
            "CAST(conv(substring(_bf_md5, 1, 8), 16, 10) AS BIGINT)"
        ).alias("_bf_h1"),
        F.expr(
            "CAST(conv(substring(_bf_md5, 9, 8), 16, 10) AS BIGINT)"
        ).alias("_bf_h2"),
        F.expr(
            "CAST(conv(substring(_bf_md5, 17, 8), 16, 10) AS BIGINT)"
            f" % {n_shards}"
        ).alias("_bf_shard"),
    ).drop("_bf_md5")


def _position(i: str, m: int) -> str:
    """SQL for probe bit position ``i`` (an expression or literal) over
    the materialized _bf_h1/_bf_h2 — double hashing (Kirsch-Mitzenmacher
    2006), odd stride coprime with the power-of-two ``m``; all terms
    non-negative so plain ``%`` is exact (and matches engines without
    pmod, e.g. the DuckDB oracle)."""
    return f"(_bf_h1 + CAST({i} AS BIGINT) * (2 * _bf_h2 + 1)) % {m}"


def bloom_build(
    df: DataFrame,
    key_col: str,
    m: int = 1 << 20,
    k: int = 5,
    n_shards: int = 1,
) -> DataFrame:
    """Build the filter over ``df[key_col]`` -> ``(shard, bloom)`` with
    exactly ``n_shards`` rows, ``bloom`` an array of ``m/64`` longs.

    Plan: one partial-aggregated groupBy on (shard, word_idx) — bounded
    at ``n_shards * m/64`` cells regardless of corpus size — then one
    bounded aggregate per shard densifies the sparse words through a map
    lookup. Empty shards still emit a row (all-zero array) so ``member``
    joins never drop probes.
    """
    if m % WORD_BITS:
        raise ValueError(f"m must be a multiple of {WORD_BITS}")
    n_words = m // WORD_BITS
    # index explode FIRST, position as a flat projection (codegen), same
    # position-explode shape as the ExactSubstr gram builder
    keyed = (
        _hash_cols(df.select(F.col(key_col)), key_col, n_shards)
        .select(
            F.col("_bf_shard").alias("shard"),
            "_bf_h1",
            "_bf_h2",
            F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("_i"),
        )
        .select(
            "shard",
            F.expr(_position("_i", m)).alias("p"),
        )
    )
    words = (
        keyed.select(
            "shard",
            F.expr("CAST(p DIV 64 AS INT)").alias("word_idx"),
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(p % 64 AS INT))"
            ).alias("mask"),
        )
        .groupBy("shard", "word_idx")
        .agg(F.expr("bit_or(mask)").alias("word"))
    )
    spark = df.sparkSession
    shards = spark.range(n_shards).select(F.col("id").alias("shard"))
    dense = (
        words.groupBy("shard")
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("word_idx", "word"))
            ).alias("_m")
        )
        .join(shards, on="shard", how="right")
        .select(
            "shard",
            F.expr(
                f"transform(sequence(0, {n_words - 1}), "
                f"i -> coalesce(_m[CAST(i AS INT)], CAST(0 AS BIGINT)))"
            ).alias("bloom"),
        )
    )
    return dense


def bloom_member(
    df: DataFrame,
    bloom_df: DataFrame,
    key_col: str,
    m: int = 1 << 20,
    k: int = 5,
    n_shards: int = 1,
    out_col: str = "maybe_seen",
) -> DataFrame:
    """``df`` + a boolean ``out_col``: True iff every probe bit of
    ``df[key_col]`` is set in its shard's filter (no false negatives;
    false positives at the analytic rate). The filter table broadcasts
    and the verdict is a codegen ``forall`` — zero data-side shuffle."""
    probed = _hash_cols(df, key_col, n_shards)
    joined = probed.join(
        F.broadcast(bloom_df.withColumnRenamed("shard", "_bf_shard")),
        on="_bf_shard",
        how="left",
    )
    # k is a plan-time literal: unroll the probes as ANDed flat bit tests
    # (one codegen conjunction), not a forall over a built array
    tests = " AND ".join(
        f"(shiftright(element_at(bloom, "
        f"CAST(({_position(i, m)}) DIV 64 AS INT) + 1), "
        f"CAST(({_position(i, m)}) % 64 AS INT)) & CAST(1 AS BIGINT)) = 1"
        for i in range(k)
    )
    return joined.withColumn(
        out_col, F.coalesce(F.expr(tests), F.lit(False))
    ).drop("_bf_shard", "_bf_h1", "_bf_h2", "bloom")


def bloom_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """OR-merge two filters built with identical (m, k, n_shards) — the
    law that makes per-batch filters foldable by any reader."""
    bb = b.withColumnRenamed("bloom", "_bloom_b")
    return a.join(bb, on="shard").select(
        "shard",
        F.zip_with("bloom", "_bloom_b", lambda x, y: x.bitwiseOR(y)).alias(
            "bloom"
        ),
    )
