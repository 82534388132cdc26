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
    # giant tier: ROUND-ROBIN repartition. RoundRobinPartitioning places rows
    # into partitions cyclically, so no partition receives two giants until
    # every partition has one — a guarantee hash placement cannot give.
    # (An earlier variant computed rank-mod-N into a `_part` column and
    # repartitioned BY that column; repartition hashes the column value, so
    # two distinct ranks could still collide into one partition.)
    giants = sized.filter(F.col("_n_chars") > giant_threshold).repartition(
        num_partitions
    )
    # union is narrow (no shuffle): the kernel stage sees both tiers'
    # partitions as-is, giants isolated from the hashed bulk
    return small.unionByName(giants).drop("_n_chars")
