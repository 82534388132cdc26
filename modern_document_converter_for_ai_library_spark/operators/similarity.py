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
    """Bit-string bucket id from deterministic sign planes (pure columns).

    Built as ONE F.expr SQL string, not nested Column constructors: the
    constructor form issued ~n_planes*dim py4j round trips (8x64 sign
    literals + lambda plumbing) and measured 7.8 s of DRIVER-side
    DataFrame build time per query at 8 planes — before any Spark job
    ran. The parsed expression tree, plan, and results are identical
    (pinned by test)."""
    planes = lsh_plane_signs(n_planes, dim)
    bits = []
    for row in planes:
        arr = ",".join(str(s) for s in row)
        bits.append(
            "CASE WHEN aggregate(transform(sequence(1, {dim}), "
            "i -> FLOOR(CAST(element_at(`{vec}`, i) AS DOUBLE) * {q}) * "
            "element_at(array({arr}), i)), 0L, (acc, x) -> acc + x) > 0 "
            "THEN '1' ELSE '0' END".format(
                dim=dim, vec=vec_col, q=QSCALE, arr=arr
            )
        )
    return F.expr("concat(%s)" % ", ".join(bits))


def _quantize(col):
    return F.transform(
        col, lambda v: F.floor(v.cast("double") * QSCALE).cast("bigint")
    )


def _qe_sqdist(qa, qb):
    """Squared Euclidean distance between two ALREADY-quantized bigint
    arrays — one zip_with pass, no per-element re-quantization.

    Why Euclidean for k-means cells: the corpus embeddings are unit
    vectors, so Euclidean NN == cosine NN for them, but Lloyd MEANS are
    sub-unit — argmax-dot against unnormalized means is norm-biased (it
    measured WORSE than the seed baseline), while argmin-distance is the
    metric Lloyd actually optimizes. Magnitudes: diff < 2^22, squared
    < 2^44, x dim(64) < 2^50 — no bigint overflow."""
    return F.aggregate(
        F.zip_with(qa, qb, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )


def _argmax_cell(
    qcorpus: DataFrame, centroids: DataFrame, id_col: str, vec_col: str
) -> DataFrame:
    """Nearest-centroid assignment: broadcast crossJoin against K centroids
    (K distances per vector, embarrassingly parallel) + min_by partial
    aggregation keyed by vector id (map-side combine — no sort window).
    Ties break toward the lowest cell via lexicographic (cdist, cell)
    struct ordering. ``qcorpus`` must carry a prequantized ``_qe`` column
    (quantize once, reuse across Lloyd rounds)."""
    qcent = centroids.select("cell", _quantize(F.col("cvec")).alias("_cqe"))
    scored = qcorpus.crossJoin(F.broadcast(qcent)).select(
        F.col(id_col),
        F.col(vec_col),
        "_qe",
        "cell",
        _qe_sqdist(F.col("_qe"), F.col("_cqe")).alias("cdist"),
    )
    return scored.groupBy(id_col).agg(
        F.first(vec_col).alias(vec_col),
        F.first("_qe").alias("_qe"),
        F.min_by("cell", F.struct("cdist", "cell")).alias("cell"),
    )


def ivf_build(
    corpus: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    lloyd_iterations: int = 0,
    lloyd_sample_mod: int | None = None,
    cache_scope=None,
) -> tuple[DataFrame, DataFrame]:
    """IVF (inverted-file) index build: deterministic coarse centroids +
    ``lloyd_iterations`` k-means refinement rounds + nearest-centroid cell
    assignment. Returns (assigned, centroids): assigned = corpus + ``cell``.

    Seeds are the ``n_centroids`` lowest-id corpus vectors; each Lloyd round
    then (a) assigns every vector to its nearest centroid and (b) replaces
    each centroid with its cell's element-wise mean. The mean is computed in
    EXACT integer arithmetic over the quantized components (bigint sums are
    associative — float summation order would make centroids, and therefore
    cell boundaries, nondeterministic across partitionings) and mapped back
    to doubles via an exact power-of-two division, so
    ``floor(cvec * QSCALE)`` round-trips to the integer mean and every
    engine reproduces identical cells. Per round the cluster-side work is
    one posexplode + groupBy((cell, dim)) shuffle of K*dim rows to the
    driver — centroid tables are tiny by construction. Empty cells keep
    their previous centroid.
    """
    from pyspark.sql import Window
    from pyspark.sql import types as T

    spark = corpus.sparkSession
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
    qcorpus = corpus.select(
        F.col(id_col), F.col(vec_col), _quantize(F.col(vec_col)).alias("_qe")
    )
    if lloyd_iterations:
        # assignment passes (rounds + final) read the same quantized
        # vectors — materialize them once; a CacheScope caller owns the
        # lifetime (plans/caching.py), otherwise GC-managed
        from ..plans.caching import scoped_persist

        qcorpus = scoped_persist(qcorpus, cache_scope)
    # Lloyd over a deterministic 1/mod sample (the standard build-time
    # economy: centroids refined on a sample, full corpus assigned once at
    # the end). id-mod sampling — not rand() — so every engine/partitioning
    # sees the identical sample and centroids stay reproducible.
    lloyd_corpus = qcorpus
    if lloyd_sample_mod:
        lloyd_corpus = qcorpus.filter(
            F.col(id_col).cast("bigint") % lloyd_sample_mod == 0
        )
    for _ in range(lloyd_iterations):
        assigned = _argmax_cell(lloyd_corpus, centroids, id_col, vec_col)
        sums = (
            assigned.select("cell", F.posexplode("_qe").alias("pos", "val"))
            .groupBy("cell", "pos")
            .agg(F.sum("val").alias("s"), F.count("*").alias("c"))
            .collect()
        )
        by_cell: dict[int, dict[int, tuple[int, int]]] = {}
        for r in sums:
            by_cell.setdefault(r["cell"], {})[r["pos"]] = (r["s"], r["c"])
        new_rows = []
        for r in centroids.collect():
            cell, prev = r["cell"], r["cvec"]
            if cell in by_cell:
                d = by_cell[cell]
                vec = [(d[p][0] // d[p][1]) / QSCALE for p in range(len(prev))]
            else:
                vec = [float(x) for x in prev]
            new_rows.append((cell, vec))
        centroids = spark.createDataFrame(
            sorted(new_rows),
            T.StructType(
                [
                    T.StructField("cell", T.IntegerType(), False),
                    T.StructField("cvec", T.ArrayType(T.DoubleType()), False),
                ]
            ),
        )
    # keep the quantized column: ivf_search rescoring reuses it
    assigned = _argmax_cell(qcorpus, centroids, id_col, vec_col)
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

    q = queries.select(
        F.col(id_col).alias("query_id"),
        _quantize(F.col(vec_col)).alias("_qq"),
    )
    qcent = centroids.select("cell", _quantize(F.col("cvec")).alias("_cqe"))
    qc = q.crossJoin(F.broadcast(qcent)).select(
        "query_id", "_qq", "cell",
        _qe_sqdist(F.col("_qq"), F.col("_cqe")).alias("cdist"),
    )
    wq = Window.partitionBy("query_id").orderBy(F.asc("cdist"), F.asc("cell"))
    probes = (
        qc.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= n_probe)
        .select("query_id", "_qq", "cell")
    )
    if "_qe" in assigned.columns:
        qassigned = assigned.select(F.col(id_col), "cell", "_qe")
    else:
        qassigned = assigned.select(
            F.col(id_col), "cell", _quantize(F.col(vec_col)).alias("_qe")
        )
    cand = probes.join(qassigned, on="cell")
    scored = cand.select(
        "query_id",
        F.col(id_col),
        F.aggregate(
            F.zip_with(F.col("_qe"), F.col("_qq"), lambda x, y: x * y),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        ).alias("qdot"),
    )
    wk = Window.partitionBy("query_id").orderBy(F.desc("qdot"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(wk))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "qdot", F.col("rank").cast("bigint").alias("rank"))
    )


def _probe_buckets(bucket, n_planes: int, multi_probe: int):
    """Array of bucket ids within Hamming distance ``multi_probe`` of
    ``bucket`` (a bit-string column). multi_probe=1 yields the bucket plus
    its ``n_planes`` single-bit flips — the classic multi-probe LSH trick:
    a near neighbor that disagrees with the query on exactly one hyperplane
    sign still lands in a probed bucket, so recall rises without adding
    planes (which would split buckets further) or tables (which would
    duplicate the corpus). Only distances 0 and 1 are supported: distance-2
    probing is C(n_planes,2) buckets and was not needed to saturate recall
    on the bench corpus (see BENCH/BASELINE.md)."""
    if multi_probe not in (0, 1):
        raise ValueError("multi_probe must be 0 or 1")
    probes = [bucket]
    for i in range(1, n_planes + 1):
        ch = F.substring(bucket, i, 1)
        flipped = F.when(ch == "1", F.lit("0")).otherwise(F.lit("1"))
        probes.append(
            F.concat(
                F.substring(bucket, 1, i - 1),
                flipped,
                F.substring(bucket, i + 1, n_planes - i),
            )
        )
    return F.array(*probes[: 1 + (n_planes if multi_probe else 0)])


def lsh_bucketed_ann(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    multi_probe: int = 0,
) -> DataFrame:
    """Approximate top-k: exact rescoring restricted to the query's bucket
    (plus, with ``multi_probe=1``, every bucket one hyperplane-sign flip
    away — see ``_probe_buckets``).

    At 100 TB this replaces the all-pairs crossJoin with an equi-join on the
    bucket id (2^n_planes buckets); recall is tuned by n_planes and
    multi_probe. Each corpus vector lives in exactly ONE bucket and probe
    bucket ids are distinct, so the probe explosion never duplicates a
    candidate — no distinct() is needed after the join.
    """
    from pyspark.sql import Window

    bucket = lsh_bucket_col(vec_col, n_planes, dim)
    c = corpus.withColumn("bucket", bucket)
    q = (
        queries.withColumn(
            "bucket", F.explode(_probe_buckets(bucket, n_planes, multi_probe))
        )
        .select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"), "bucket"
        )
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
