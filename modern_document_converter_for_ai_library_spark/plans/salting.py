"""Skew handling for document workloads (SURVEY.md §4 item 1).

Document corpora skew two ways: a few giant documents (log-normal sizes with
a heavy tail) and hot source hosts. A single document cannot be split across
tasks — the convert kernel needs the whole span sequence in order — so the
lever is *placement*: spread the big documents evenly instead of letting a
hash bucket collect several of them.

``balance_by_size`` implements two-tier placement: the bulk is hash
partitioned; the giant tail is ROUND-ROBIN repartitioned so every partition
receives at most ceil(K/N) of the K largest docs — the worst-case straggler
is bounded by one giant doc rather than a hash collision of several. At
100 TB this is the difference between a 1.05x and a 10x straggler tail.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SIZE_BUCKET_BOUNDS = [1_000, 10_000, 100_000, 1_000_000]  # chars


def doc_char_count(spans_col: str = "spans"):
    """Total characters across a document's text spans — pure column expr."""
    return F.aggregate(
        F.col(spans_col),
        F.lit(0),
        lambda acc, s: acc + F.length(F.coalesce(s["text"], F.lit(""))),
    )


def with_size_bucket(df: DataFrame, spans_col: str = "spans") -> DataFrame:
    """Add ``n_chars`` and a log-scale ``size_bucket`` column (0..len(bounds))."""
    n = doc_char_count(spans_col)
    bucket = F.lit(len(SIZE_BUCKET_BOUNDS))
    for i in reversed(range(len(SIZE_BUCKET_BOUNDS))):
        bucket = F.when(n <= SIZE_BUCKET_BOUNDS[i], F.lit(i)).otherwise(bucket)
    return df.withColumn("n_chars", n).withColumn("size_bucket", bucket)


def detect_hot_keys(
    df: DataFrame,
    key_col: str,
    threshold_frac: float = 0.01,
    sample_frac: float = 0.05,
) -> list:
    """Driver-side heavy-hitter detection: keys holding more than
    ``threshold_frac`` of a deterministic sample. The hot set is by
    definition small (at most 1/threshold_frac keys), so collecting it is
    bounded regardless of corpus size — this is the standard prelude to
    explicit skew salting."""
    sampled = df.sample(fraction=sample_frac, seed=7).groupBy(key_col).count()
    total = sampled.agg(F.sum("count")).collect()[0][0] or 0
    if not total:
        return []
    rows = sampled.filter(F.col("count") >= threshold_frac * total).collect()
    return [r[key_col] for r in rows]


def with_salted_key(
    df: DataFrame,
    key_col: str,
    n_salts: int = 8,
    hot_keys: list | None = None,
    id_col: str = "doc_id",
    out_col: str = "salted_key",
) -> DataFrame:
    """Explicit skew salting for keyed shuffles (north rule: "explicit
    salting of skewed hosts/doc-size buckets").

    Hot keys are split into ``n_salts`` sub-keys ``key#s`` (s =
    pmod(hash(id), n_salts) — deterministic per row); cold keys keep
    ``key#0`` so every row has the same two-part shape. Aggregations then
    run in two phases (partial by salted key, final by key —
    ``salted_two_phase_agg``); joins against a small dim replicate the dim
    per salt. Detection is either caller-supplied (``hot_keys``) or
    sampled (``detect_hot_keys``)."""
    if hot_keys is None:
        hot_keys = detect_hot_keys(df, key_col)
    if hot_keys:
        hot_arr = F.array(*[F.lit(k) for k in hot_keys])
        salt = F.when(
            F.array_contains(hot_arr, F.col(key_col)),
            F.pmod(F.hash(F.col(id_col)), F.lit(n_salts)),
        ).otherwise(F.lit(0))
    else:
        salt = F.lit(0)
    return df.withColumn(
        out_col, F.concat(F.col(key_col), F.lit("#"), salt.cast("string"))
    )


def salted_two_phase_agg(
    df: DataFrame,
    key_col: str,
    salted_col: str = "salted_key",
) -> DataFrame:
    """Two-phase count/byte aggregation over a salted key: partial per
    (key#salt) — at most ceil(rows_of_hot_key / n_salts) rows per reducer —
    then final over the true key on the tiny partial table. Semantically
    identical to a direct groupBy(key); the hot key's single-reducer
    bottleneck is gone."""
    partial = df.groupBy(salted_col).agg(
        F.count("*").alias("_n"),
        F.sum(F.col("n_chars").cast("bigint")).alias("_chars"),
    )
    key = F.substring_index(F.col(salted_col), "#", 1)
    return (
        partial.groupBy(key.alias(key_col))
        .agg(
            F.sum("_n").cast("bigint").alias("n_docs"),
            F.sum("_chars").cast("bigint").alias("total_chars"),
        )
    )


def balance_by_size(
    df: DataFrame,
    num_partitions: int,
    spans_col: str = "spans",
    giant_threshold: int = 1_000_000,
) -> DataFrame:
    """Spread documents so each task sees a near-equal byte total.

    Two-tier placement, chosen to stay scalable:

    - the bulk of the corpus is placed by ``hash(doc_id)`` — uniform, no
      coordination, no extra shuffle beyond the repartition itself;
    - the giant tail (``n_chars > giant_threshold``; by construction a tiny
      fraction of rows) is round-robined by rank so no partition receives two
      giants. The ranking window runs over only those few rows, so the
      single-task sort it implies is bounded and cheap — a global window over
      the full corpus would serialize everything through one task and is
      exactly what this avoids.
    """
    sized = df.withColumn("_n_chars", doc_char_count(spans_col))
    # bulk tier: plain hash repartition — uniform at corpus scale
    small = sized.filter(F.col("_n_chars") <= giant_threshold).repartition(
        num_partitions, F.col("doc_id")
    )
    # giant tier: ROUND-ROBIN repartition FROM A SINGLE PARTITION. Spark's
    # RoundRobinPartitioning cycles per input partition starting at a
    # per-task random offset, so giants spread across several input
    # partitions could still collide; funneling the (tiny, by construction)
    # giant tier through one shuffle partition first makes the cycle global
    # — at most ceil(K/N) giants per output partition, guaranteed. The
    # filter itself still runs parallel; only the already-filtered giant
    # rows pass through the 1-partition barrier.
    # (An earlier variant computed rank-mod-N into a `_part` column and
    # repartitioned BY that column; repartition hashes the column value, so
    # two distinct ranks could still collide into one partition.)
    giants = (
        sized.filter(F.col("_n_chars") > giant_threshold)
        .repartition(1)
        .repartition(num_partitions)
    )
    # union is narrow (no shuffle): the kernel stage sees both tiers'
    # partitions as-is, giants isolated from the hashed bulk
    return small.unionByName(giants).drop("_n_chars")
