"""Skew handling for document workloads (SURVEY.md §4 item 1).

Document corpora skew two ways: a few giant documents (log-normal sizes with
a heavy tail) and hot source hosts. A single document cannot be split across
tasks — the convert kernel needs the whole span sequence in order — so the
lever is *placement*: spread the big documents evenly instead of letting a
hash bucket collect several of them.

``balance_by_size`` implements size-aware round-robin placement: rank docs by
byte size descending, assign partition = rank mod N. The rank needs one
window shuffle, but it guarantees every partition receives at most
ceil(K/N) of the K largest docs — the worst-case straggler is bounded by one
giant doc rather than a hash collision of several. At 100 TB this is the
difference between a 1.05x and a 10x straggler tail.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
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
    small = sized.filter(F.col("_n_chars") <= giant_threshold).withColumn(
        "_part", F.pmod(F.hash("doc_id"), F.lit(num_partitions))
    )
    giants_w = Window.orderBy(F.desc("_n_chars"), F.col("doc_id"))
    giants = (
        sized.filter(F.col("_n_chars") > giant_threshold)
        .withColumn("_rank", F.row_number().over(giants_w))
        .withColumn("_part", F.pmod(F.col("_rank"), F.lit(num_partitions)))
        .drop("_rank")
    )
    return (
        small.unionByName(giants)
        .repartition(num_partitions, F.col("_part"))
        .drop("_n_chars", "_part")
    )
