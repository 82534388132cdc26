"""Product quantization (operators/pq.py): codebook training, encoding,
ADC search — plus the recall-vs-brute-force grade the oracle cannot see."""

import pytest
from pyspark.sql import functions as F

from modern_document_converter_for_ai_library_spark.operators.pq import (
    pq_build,
    pq_search,
)

SF_DIR = "/root/testdata/sf0.01"


def _corpus(spark, rows, dim=8):
    return spark.createDataFrame(
        [(i, [float(x) for x in vec]) for i, vec in rows],
        "vec_id: bigint, embedding: array<double>",
    )


def test_pq_exact_reconstruction_on_separable_clusters(spark):
    # two well-separated clusters per half-space; with n_codes=2 and one
    # Lloyd round each code converges to its cluster's floor-mean, and
    # every vector's nearest code is its own cluster -> ADC distance to a
    # query AT a centroid is 0 for that cluster's members.
    rows = [
        (0, [1.0] * 8),
        (1, [1.0] * 8),
        (2, [-1.0] * 8),
        (3, [-1.0] * 8),
    ]
    corpus = _corpus(spark, rows)
    encoded, codebook = pq_build(
        corpus, m=2, n_codes=2, dim=8, lloyd_iterations=1
    )
    enc = {r["vec_id"]: list(r["codes"]) for r in encoded.collect()}
    # codes of identical vectors agree; the two clusters get distinct codes
    assert enc[0] == enc[1] and enc[2] == enc[3] and enc[0] != enc[2]

    out = pq_search(
        encoded, codebook, corpus.filter("vec_id = 0"), k=4, m=2, dim=8
    )
    got = {(r["vec_id"]): (r["adist"], r["rank"]) for r in out.collect()}
    assert got[0][0] == 0 and got[1][0] == 0  # own-cluster ADC distance 0
    assert got[2][0] > 0 and got[3][0] > 0
    assert got[0][1] == 1 and got[1][1] == 2  # ties break toward low id


def test_pq_codebook_shape_and_determinism(spark):
    rows = [(i, [((i * 7 + j * 3) % 11) / 11.0 for j in range(8)]) for i in range(30)]
    corpus = _corpus(spark, rows)
    encoded, codebook = pq_build(corpus, m=4, n_codes=4, dim=8,
                                 lloyd_iterations=2)
    cb = codebook.collect()
    assert len(cb) == 4 * 4
    assert all(len(r["cvec"]) == 2 for r in cb)
    enc1 = sorted((r["vec_id"], tuple(r["codes"])) for r in encoded.collect())
    # second build from scratch is bit-identical (exact integer Lloyd)
    encoded2, _ = pq_build(corpus, m=4, n_codes=4, dim=8, lloyd_iterations=2)
    enc2 = sorted((r["vec_id"], tuple(r["codes"])) for r in encoded2.collect())
    assert enc1 == enc2
    assert all(len(c) == 4 and all(1 <= x <= 4 for x in c) for _, c in enc1)


def test_pq_rejects_indivisible_dim(spark):
    corpus = _corpus(spark, [(0, [0.0] * 8)])
    with pytest.raises(ValueError):
        pq_build(corpus, m=3, dim=8)


def test_pq_recall_vs_brute_force_on_testdata(spark):
    """Recall@10 of ADC against the exact squared-Euclidean top-10 on the
    sf0.01 embeddings, averaged over 8 queries. Deterministic pipeline ->
    the measured recall is pinned exactly; the floor guards regressions."""
    from modern_document_converter_for_ai_library_spark.queries import (
        _PQ_CODES,
        _PQ_LLOYD,
        _PQ_M,
        _PQ_SHORTLIST,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    queries = emb.orderBy("vec_id").limit(8)
    encoded, codebook = pq_build(
        emb, m=_PQ_M, n_codes=_PQ_CODES, lloyd_iterations=_PQ_LLOYD,
    )
    approx = pq_search(encoded, codebook, queries, k=10, m=_PQ_M)
    approx_sets: dict[int, set] = {}
    for r in approx.collect():
        approx_sets.setdefault(r["query_id"], set()).add(r["vec_id"])

    # exact ground truth on the quantized vectors (same metric as ADC)
    from modern_document_converter_for_ai_library_spark.operators.similarity import (
        _qe_sqdist,
        _quantize,
    )
    from pyspark.sql import Window

    qc = emb.select("vec_id", _quantize(F.col("embedding")).alias("_qe"))
    qq = queries.select(
        F.col("vec_id").alias("query_id"),
        _quantize(F.col("embedding")).alias("_qq"),
    )
    scored = qc.crossJoin(F.broadcast(qq)).select(
        "query_id", "vec_id", _qe_sqdist("_qe", "_qq").alias("d")
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("d"), F.asc("vec_id"))
    exact = scored.withColumn("rn", F.row_number().over(w)).filter("rn <= 10")
    exact_sets: dict[int, set] = {}
    for r in exact.collect():
        exact_sets.setdefault(r["query_id"], set()).add(r["vec_id"])

    hits = sum(len(approx_sets[q] & exact_sets[q]) for q in exact_sets)
    total = sum(len(s) for s in exact_sets.values())
    # m=16/64-code ADC measured 50/80 here; the assertion is a floor, not
    # a pin, so a Lloyd tweak that IMPROVES recall does not break it.
    assert hits / total >= 0.5, f"ADC recall@10 collapsed: {hits}/{total}"

    # the serving path: 100-candidate ADC shortlist + exact rescore —
    # measured 80/80 at this operating point (floor at 0.9 for noise-free
    # regression slack; the pipeline is deterministic)
    from modern_document_converter_for_ai_library_spark.operators.pq import (
        pq_search_rerank,
    )

    rer = pq_search_rerank(
        encoded, codebook, emb, queries, k=10,
        shortlist=_PQ_SHORTLIST, m=_PQ_M,
    )
    rer_sets: dict[int, set] = {}
    for r in rer.collect():
        rer_sets.setdefault(r["query_id"], set()).add(r["vec_id"])
    rhits = sum(len(rer_sets[q] & exact_sets[q]) for q in exact_sets)
    assert rhits / total >= 0.9, f"rerank recall@10 collapsed: {rhits}/{total}"


def test_ivfpq_matches_ivf_recall_ceiling(spark):
    """IVF-PQ composition: candidates restricted to probed cells, ADC
    ranking inside them, exact rescore. With n_probe = K (probe ALL
    cells) and a shortlist covering the corpus, the result must equal
    exact brute-force top-10 — the composition loses nothing beyond its
    two pruning tiers."""
    from pyspark.sql import Window

    from modern_document_converter_for_ai_library_spark.operators.pq import (
        ivf_pq_search,
    )
    from modern_document_converter_for_ai_library_spark.operators.similarity import (
        _qe_sqdist,
        _quantize,
        ivf_build,
    )
    from pyspark.sql import functions as F

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    queries = emb.filter("vec_id >= 200 and vec_id < 204")
    assigned, cents = ivf_build(emb, n_centroids=4, lloyd_iterations=1)
    encoded, codebook = pq_build(emb, m=16, n_codes=64, lloyd_iterations=2)
    got = ivf_pq_search(
        assigned, cents, encoded, codebook, emb, queries,
        k=10, n_probe=4, shortlist=10_000, m=16,
    )
    got_rows = sorted(
        (r["query_id"], r["rank"], r["vec_id"]) for r in got.collect()
    )

    qc = emb.select("vec_id", _quantize(F.col("embedding")).alias("_qe"))
    qq = queries.select(
        F.col("vec_id").alias("query_id"),
        _quantize(F.col("embedding")).alias("_qq"),
    )
    sc = qc.crossJoin(F.broadcast(qq)).select(
        "query_id", "vec_id", _qe_sqdist("_qe", "_qq").alias("d")
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("d"), F.asc("vec_id"))
    exact = sc.withColumn("rn", F.row_number().over(w)).filter("rn <= 10")
    exact_rows = sorted(
        (r["query_id"], r["rn"], r["vec_id"]) for r in exact.collect()
    )
    assert got_rows == exact_rows
