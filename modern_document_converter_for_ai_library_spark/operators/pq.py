"""Product quantization (PQ) for embedding compression + ADC search.

The missing piece between brute-force rescoring and trillion-row ANN:
IVF (similarity.py) prunes CANDIDATES, PQ compresses the VECTORS — a
64-dim float array (256 B) becomes ``m`` one-byte codes (8 B at m=8),
so a 10^12-vector corpus drops from ~256 TB of vector payload to ~8 TB,
and distance evaluation becomes ``m`` table lookups + adds instead of
64 multiplies (Jégou, Douze, Schmid, "Product Quantization for Nearest
Neighbor Search", IEEE TPAMI 2011 — public paper; no reference-repo
counterpart exists).

Design mirrors the repo's IVF in every determinism-critical choice:

- components quantize once to int64 (floor(x * 2^20)); all distances are
  exact integer sums, bit-identical across engines/partitionings.
- codebooks seed from the ``n_codes`` lowest-id vectors' subvectors and
  refine with exact-integer Lloyd rounds (floor-mean updates) over a
  deterministic id-mod sample; empty codes keep their previous centroid.
- ALL ``m`` subspaces train in ONE pass per round: subvectors explode to
  (id, sub, sv) rows and the codebook is a broadcastable (sub, code)
  table of m x n_codes rows, so a Lloyd round is one assignment join +
  one (sub, code, pos) aggregate whose collect is m*n_codes*subdim rows
  — bounded by construction, never data-scale.
- ADC search: per query, a distance table d[sub, code] (m x n_codes
  integers) is computed against the broadcast codebook; corpus scoring
  is the codes explode joined to the broadcast table and a per-(query,
  id) sum — map-side partial aggregation, no corpus shuffle beyond the
  final top-k window per query.

Approximation contract: PQ distances are asymmetric-distance estimates
(exact distance from the query to each CENTROID, summed per subspace),
not true distances. ``pq_search_rerank`` is the production shape: the
compressed codes produce a C-candidate shortlist, and only those C rows
per query touch the full vectors for an exact rescore — measured
recall@10 on the sf0.01 testdata with non-seed queries
(scripts/ann_recall_bench.py): ADC-only 94/160, shortlist=100 rerank
160/160 at m=16/n_codes=64/2 Lloyd rounds — the best operating point on
the repo's ANN curve (table in BENCH/BASELINE.md). Recall is graded in
tests; cross-engine parity pins the algorithm itself exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .similarity import _quantize


def _sub_explode(df: DataFrame, id_col: str, qcol: str, m: int, subdim: int):
    """(id, sub, sv): one row per subvector. The slice set is a literal
    array of m structs, so the explode stays in whole-stage codegen."""
    slices = F.array(
        *[
            F.struct(
                F.lit(s).cast("int").alias("sub"),
                F.slice(qcol, s * subdim + 1, subdim).alias("sv"),
            )
            for s in range(m)
        ]
    )
    return df.select(F.col(id_col), F.explode(slices).alias("_x")).select(
        id_col, F.col("_x.sub").alias("sub"), F.col("_x.sv").alias("sv")
    )


def _sv_sqdist(a, b, n: int | None = None):
    """Exact integer squared distance between two bigint arrays.

    With ``n`` (the known fixed length) the sum is UNROLLED into plain
    column arithmetic — higher-order functions (zip_with/aggregate) are
    interpreted, not codegen, and the assignment join evaluates this on
    n_codes candidate rows per subvector: the unroll measured 2.9x on
    the sf0.1 pq_build (16.0 -> 5.5 s), bit-identical results. Without
    ``n`` (or for long arrays) it falls back to the zip_with fold."""
    if isinstance(a, str):
        a = F.col(a)
    if isinstance(b, str):
        b = F.col(b)
    if n is not None and n <= 16:
        col = None
        for i in range(1, n + 1):
            d = F.element_at(a, i) - F.element_at(b, i)
            col = d * d if col is None else col + d * d
        return col
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )


def _assign_codes(
    subv: DataFrame, codebook: DataFrame, id_col: str, subdim: int | None = None
) -> DataFrame:
    """Nearest-code assignment within each subspace: broadcast equi-join on
    ``sub`` (n_codes candidate rows per subvector) + min_by partial
    aggregation; ties break toward the lowest code."""
    scored = subv.join(F.broadcast(codebook), "sub").select(
        F.col(id_col),
        "sub",
        "sv",
        "code",
        _sv_sqdist(F.col("sv"), F.col("cvec"), subdim).alias("cdist"),
    )
    return scored.groupBy(id_col, "sub").agg(
        F.first("sv").alias("sv"),
        F.min_by("code", F.struct("cdist", "code")).alias("code"),
    )


def pq_build(
    corpus: DataFrame,
    m: int = 8,
    n_codes: int = 16,
    dim: int = 64,
    lloyd_iterations: int = 1,
    sample_mod: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cache_scope=None,
) -> tuple[DataFrame, DataFrame]:
    """Train per-subspace codebooks and encode the corpus.

    Returns (encoded, codebook): encoded = (id, codes array<int> of
    length m); codebook = (sub, code, cvec array<bigint>) with quantized
    components (m x n_codes rows — broadcastable by construction).
    """
    if dim % m:
        raise ValueError("dim must divide evenly into m subspaces")
    subdim = dim // m
    from pyspark.sql import types as T

    from ..plans.caching import scoped_persist

    spark = corpus.sparkSession
    qcorpus = corpus.select(
        F.col(id_col), _quantize(F.col(vec_col)).alias("_qe")
    )
    subv = _sub_explode(qcorpus, id_col, "_qe", m, subdim)
    if lloyd_iterations:
        subv = scoped_persist(subv, cache_scope)

    # seed: the n_codes lowest-id vectors' subvectors, code = id rank
    # (an n_codes-row collect straight off the corpus projection — no
    # pass over the exploded subvector table)
    seeds = qcorpus.orderBy(id_col).limit(n_codes).collect()
    cb_schema = T.StructType(
        [
            T.StructField("sub", T.IntegerType(), False),
            T.StructField("code", T.IntegerType(), False),
            T.StructField("cvec", T.ArrayType(T.LongType()), False),
        ]
    )
    # the codebook lives as a driver-side row list across rounds (it is
    # created FROM local rows, so collecting it back would just add a
    # Spark job per round); each round materializes it as a broadcastable
    # DataFrame for the assignment join only
    cb_rows = sorted(
        (s, rank + 1, list(row["_qe"][s * subdim : (s + 1) * subdim]))
        for rank, row in enumerate(sorted(seeds, key=lambda r: r[id_col]))
        for s in range(m)
    )
    codebook = spark.createDataFrame(cb_rows, cb_schema)

    lloyd_subv = subv
    if sample_mod:
        lloyd_subv = subv.filter(F.col(id_col).cast("bigint") % sample_mod == 0)
    for _ in range(lloyd_iterations):
        assigned = _assign_codes(lloyd_subv, codebook, id_col, subdim)
        sums = (
            assigned.select("sub", "code", F.posexplode("sv").alias("pos", "val"))
            .groupBy("sub", "code", "pos")
            .agg(F.sum("val").alias("s"), F.count("*").alias("c"))
            .collect()
        )
        means: dict[tuple[int, int], dict[int, int]] = {}
        for r in sums:
            means.setdefault((r["sub"], r["code"]), {})[r["pos"]] = (
                r["s"] // r["c"]
            )
        cb_rows = sorted(
            (
                sub,
                code,
                [means[(sub, code)][p] for p in range(subdim)]
                if (sub, code) in means
                else list(cvec),  # empty code keeps its centroid
            )
            for sub, code, cvec in cb_rows
        )
        codebook = spark.createDataFrame(cb_rows, cb_schema)

    final = _assign_codes(subv, codebook, id_col, subdim)
    encoded = final.groupBy(id_col).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("sub", "code"))),
            lambda x: x["code"],
        ).alias("codes")
    )
    return encoded, codebook


def pq_search(
    encoded: DataFrame,
    codebook: DataFrame,
    queries: DataFrame,
    k: int = 10,
    m: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ADC top-k: exact integer query->centroid distance table, corpus
    scored by m lookups + adds per vector. Returns
    (query_id, id, adist, rank) — adist is the PQ distance ESTIMATE."""
    subdim = dim // m
    q = queries.select(
        F.col(id_col).alias("query_id"), _quantize(F.col(vec_col)).alias("_qq")
    )
    qsub = _sub_explode(q, "query_id", "_qq", m, subdim)
    dtable = qsub.join(F.broadcast(codebook), "sub").select(
        "query_id", "sub", "code",
        _sv_sqdist(F.col("sv"), F.col("cvec"), subdim).alias("d"),
    )
    long = encoded.select(
        F.col(id_col), F.posexplode("codes").alias("sub", "code")
    )
    scored = (
        long.join(F.broadcast(dtable), ["sub", "code"])
        .groupBy("query_id", id_col)
        .agg(F.sum("d").cast("bigint").alias("adist"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.asc("adist"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "adist", F.col("rank").cast("bigint").alias("rank"))
    )


def pq_search_rerank(
    encoded: DataFrame,
    codebook: DataFrame,
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    shortlist: int = 100,
    m: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ADC shortlist + exact rescore (the standard PQ serving pattern).

    The compressed codes rank the WHOLE corpus (cheap: m lookups/vector);
    only the ``shortlist`` best candidates per query join back to the
    full vectors for an exact integer squared-Euclidean rescore. At
    corpus scale the rescore join is queries x shortlist rows against
    the corpus — a selective equi-join on ``id_col`` — so full vectors
    are touched ~C times per query instead of N times. Returns
    (query_id, id, dist, rank) with EXACT distances for the top k.
    """
    from pyspark.sql import Window

    cand = pq_search(
        encoded, codebook, queries, k=shortlist, m=m, dim=dim,
        id_col=id_col, vec_col=vec_col,
    ).select("query_id", id_col)
    qcorpus = corpus.select(
        F.col(id_col), _quantize(F.col(vec_col)).alias("_qe")
    )
    qq = queries.select(
        F.col(id_col).alias("query_id"), _quantize(F.col(vec_col)).alias("_qq")
    )
    rescored = (
        cand.join(qcorpus, id_col)
        .join(F.broadcast(qq), "query_id")
        .select(
            "query_id",
            id_col,
            _sv_sqdist(F.col("_qe"), F.col("_qq")).alias("dist"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("dist"), F.asc(id_col))
    return (
        rescored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "dist", F.col("rank").cast("bigint").alias("rank"))
    )


def ivf_pq_search(
    assigned: DataFrame,
    centroids: DataFrame,
    encoded: DataFrame,
    codebook: DataFrame,
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_probe: int = 4,
    shortlist: int = 100,
    m: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-PQ: the standard trillion-scale ANN layout (FAISS IVFPQ shape).

    Three pruning tiers compose: the IVF coarse quantizer restricts
    candidates to the query's ``n_probe`` nearest cells (~n_probe/K of
    the corpus), PQ codes rank those candidates by ADC (m lookups + adds
    each, 16 B/vector payload), and only the ``shortlist`` best join
    back to full vectors for the exact rescore. ``assigned``/
    ``centroids`` come from similarity.ivf_build; ``encoded``/
    ``codebook`` from pq_build over the SAME corpus. Every stage is an
    equi-join against a broadcast table (probes, distance table) or a
    partial aggregation — no corpus-scale shuffle beyond the candidate
    restriction itself.
    """
    from pyspark.sql import Window

    from .similarity import _qe_sqdist

    subdim = dim // m
    q = queries.select(
        F.col(id_col).alias("query_id"), _quantize(F.col(vec_col)).alias("_qq")
    )
    # tier 1: n_probe nearest coarse cells per query
    qcent = centroids.select("cell", _quantize(F.col("cvec")).alias("_cqe"))
    qc = q.crossJoin(F.broadcast(qcent)).select(
        "query_id", "_qq", "cell", _qe_sqdist("_qq", "_cqe").alias("cdist")
    )
    wq = Window.partitionBy("query_id").orderBy(F.asc("cdist"), F.asc("cell"))
    probes = (
        qc.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= n_probe)
        .select("query_id", "cell")
    )
    cand = assigned.select(id_col, "cell").join(
        F.broadcast(probes), "cell"
    ).select("query_id", id_col)
    # tier 2: ADC over the candidates only
    qsub = _sub_explode(q, "query_id", "_qq", m, subdim)
    dtable = qsub.join(F.broadcast(codebook), "sub").select(
        "query_id", "sub", "code",
        _sv_sqdist(F.col("sv"), F.col("cvec"), subdim).alias("d"),
    )
    long = encoded.select(
        F.col(id_col), F.posexplode("codes").alias("sub", "code")
    )
    adc = (
        cand.join(long, id_col)
        .join(F.broadcast(dtable), ["query_id", "sub", "code"])
        .groupBy("query_id", id_col)
        .agg(F.sum("d").cast("bigint").alias("adist"))
    )
    ws = Window.partitionBy("query_id").orderBy(F.asc("adist"), F.asc(id_col))
    short = (
        adc.withColumn("rn", F.row_number().over(ws))
        .filter(F.col("rn") <= shortlist)
        .select("query_id", id_col)
    )
    # tier 3: exact rescore of the shortlist
    qcorpus = corpus.select(
        F.col(id_col), _quantize(F.col(vec_col)).alias("_qe")
    )
    rescored = (
        short.join(qcorpus, id_col)
        .join(F.broadcast(q), "query_id")
        .select(
            "query_id", id_col, _sv_sqdist("_qe", "_qq").alias("dist")
        )
    )
    wr = Window.partitionBy("query_id").orderBy(F.asc("dist"), F.asc(id_col))
    return (
        rescored.withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "dist", F.col("rank").cast("bigint").alias("rank"))
    )
