"""Similarity search over embedding columns (training-data pipeline ops).

Two paths:

  brute_force_topk  exact integer-quantized dot-product top-k against a
                    broadcast query set — the correctness baseline; cost
                    O(N_corpus x N_queries) but embarrassingly parallel
  lsh_bucketed_ann  random-hyperplane (sign) LSH: bucket = bit-string of
                    sign(plane . vec) for a deterministic md5-derived plane
                    matrix; candidates come only from the query's bucket, so
                    at corpus scale the join is an equi-join on bucket id

Quantization note: components are floor(x * 2^20) as int64 before the dot
product, making scores exact integers — reproducible across engines and
summation orders (floats would make top-k ties flaky).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import lsh_plane_signs

QSCALE = 1 << 20


def _quantized_dot(a, b):
    return F.aggregate(
        F.transform(
            F.sequence(F.lit(1), F.size(a)),
            lambda i: F.floor(F.element_at(a, i).cast("double") * QSCALE)
            * F.floor(F.element_at(b, i).cast("double") * QSCALE),
        ),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k corpus vectors per query vector (exact, broadcast the queries)."""
    from pyspark.sql import Window

    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    joined = corpus.crossJoin(F.broadcast(q))
    scored = joined.select(
        "query_id",
        F.col(id_col),
        _quantized_dot(F.col(vec_col), F.col("qvec")).alias("qdot"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("qdot"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "qdot", F.col("rank").cast("bigint").alias("rank"))
    )


def lsh_bucket_col(vec_col: str, n_planes: int, dim: int):
    """Bit-string bucket id from deterministic sign planes (pure columns)."""
    planes = lsh_plane_signs(n_planes, dim)
    bits = []
    for row in planes:
        terms = F.aggregate(
            F.transform(
                F.sequence(F.lit(1), F.lit(dim)),
                lambda i: F.floor(F.element_at(F.col(vec_col), i).cast("double") * QSCALE)
                * F.element_at(F.array(*[F.lit(s) for s in row]), i),
            ),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(terms > 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def ivf_build(
    corpus: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame]:
    """IVF (inverted-file) index build: deterministic coarse centroids +
    nearest-centroid cell assignment.

    Centroids are the ``n_centroids`` lowest-id corpus vectors — a
    deterministic stand-in for k-means (at 100 TB one or two Lloyd
    iterations over a sample refine them; assignment below is unchanged).
    Assignment is a broadcast crossJoin against K centroids (K dots per
    vector, embarrassingly parallel) + an argmax window keyed by vector id.
    Returns (assigned, centroids): assigned = corpus + ``cell`` column.
    """
    from pyspark.sql import Window

    centroids = (
        corpus.orderBy(id_col)
        .limit(n_centroids)
        .select(
            F.row_number()
            .over(Window.orderBy(id_col))
            .cast("int")
            .alias("cell"),
            F.col(vec_col).alias("cvec"),
        )
    )
    scored = corpus.crossJoin(F.broadcast(centroids)).select(
        F.col(id_col),
        F.col(vec_col),
        "cell",
        _quantized_dot(F.col(vec_col), F.col("cvec")).alias("cdot"),
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("cdot"), F.asc("cell"))
    assigned = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(id_col, vec_col, "cell")
    )
    return assigned, centroids


def ivf_search(
    assigned: DataFrame,
    centroids: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF query: score each query against the K centroids, probe the
    ``n_probe`` nearest cells, exact-rescore only the vectors in those
    cells. At corpus scale the probe join is an equi-join on ``cell`` —
    the quadratic term shrinks by ~K/n_probe versus brute force; recall is
    tuned by n_probe (n_probe=K degenerates to exact search).
    """
    from pyspark.sql import Window

    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"))
    qc = q.crossJoin(F.broadcast(centroids)).select(
        "query_id", "qvec", "cell",
        _quantized_dot(F.col("qvec"), F.col("cvec")).alias("cdot"),
    )
    wq = Window.partitionBy("query_id").orderBy(F.desc("cdot"), F.asc("cell"))
    probes = (
        qc.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= n_probe)
        .select("query_id", "qvec", "cell")
    )
    cand = probes.join(assigned, on="cell")
    scored = cand.select(
        "query_id",
        F.col(id_col),
        _quantized_dot(F.col(vec_col), F.col("qvec")).alias("qdot"),
    )
    wk = Window.partitionBy("query_id").orderBy(F.desc("qdot"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(wk))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "qdot", F.col("rank").cast("bigint").alias("rank"))
    )


def lsh_bucketed_ann(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: exact rescoring restricted to the query's bucket.

    At 100 TB this replaces the all-pairs crossJoin with an equi-join on the
    bucket id (2^n_planes buckets); recall is tuned by n_planes and by
    probing neighboring buckets (future multi-probe extension).
    """
    from pyspark.sql import Window

    bucket = lsh_bucket_col(vec_col, n_planes, dim)
    c = corpus.withColumn("bucket", bucket)
    q = queries.withColumn("bucket", bucket).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"), "bucket"
    )
    joined = c.join(F.broadcast(q), on="bucket")
    scored = joined.select(
        "query_id",
        F.col(id_col),
        _quantized_dot(F.col(vec_col), F.col("qvec")).alias("qdot"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("qdot"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "qdot", F.col("rank").cast("bigint").alias("rank"))
    )
