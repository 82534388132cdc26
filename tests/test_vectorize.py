"""Hashed TF-IDF vectors (operators/vectorize.py): pure-Python twin,
plan-shape claims (map-only TF, bounded DF reduce, no corpus shuffle in
the weighting pass), and composition with the ANN stack."""

import hashlib

import pytest
from pyspark.sql import functions as F

from modern_document_converter_for_ai_library_spark.operators.vectorize import (
    IDF_SCALE,
    doc_tf,
    idf_literals,
    tfidf_vectors,
)

DIM = 16


def _py_bucket(tok: str, dim: int = DIM) -> int:
    return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % dim


def _py_tfidf(rows, dim: int = DIM):
    tfs = {}
    for doc_id, text in rows:
        tf = [0] * dim
        for tok in [t for t in (text or "").split(" ") if t != ""]:
            tf[_py_bucket(tok, dim)] += 1
        tfs[doc_id] = tf
    n = len(rows)
    dfc = [sum(1 for tf in tfs.values() if tf[b] > 0) for b in range(dim)]
    idf = [
        IDF_SCALE * (max((n + 1) // (dfc[b] + 1), 1).bit_length() - 1)
        for b in range(dim)
    ]
    return {d: [t * w for t, w in zip(tf, idf)] for d, tf in tfs.items()}


ROWS = [
    (1, "apple banana apple cherry"),
    (2, "banana banana date"),
    (3, "unrelated words entirely here"),
    (4, ""),
    (5, "apple  banana"),  # double space -> empty token dropped
    (6, None),  # null text -> ZERO vector, never NULLs (ANN nulls-first)
]


def test_matches_python_twin(spark):
    df = spark.createDataFrame(ROWS, ["doc_id", "text"])
    got = {r["doc_id"]: list(r["vec"]) for r in tfidf_vectors(df, dim=DIM).collect()}
    assert got == _py_tfidf(ROWS)
    assert got[6] == [0] * DIM  # zero vector, no NULL elements


def test_idf_downweights_ubiquitous_tokens(spark):
    # a token in EVERY doc gets idf floor(log2((n+1)/(n+1))) = 0 -> zero
    # weight; a rare token keeps positive weight
    rows = [(i, "common rare%d" % i) for i in range(8)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    vecs = {r["doc_id"]: list(r["vec"]) for r in tfidf_vectors(df, dim=DIM).collect()}
    common_b = _py_bucket("common")
    assert all(v[common_b] == 0 for v in vecs.values())
    assert all(any(x > 0 for x in v) for v in vecs.values())


def test_plan_no_corpus_shuffle(spark):
    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    # TF stage: map-only
    tf_plan = doc_tf(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in tf_plan and "BatchEvalPython" not in tf_plan
    # full vectors: the only Exchange is the bounded dim-row DF reduce,
    # which happened at build time (collect); the RETURNED plan is
    # map-only again — literal idf array, no join
    out_plan = tfidf_vectors(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in out_plan
    assert "Join" not in out_plan


def test_composes_with_ann(spark):
    # near-dup texts must land nearer than unrelated texts under exact
    # search over the hashed vectors
    from modern_document_converter_for_ai_library_spark.operators.similarity import brute_force_topk

    rows = [
        (1, "the quick brown fox jumps over the lazy dog by the river bank"),
        (2, "the quick brown fox jumps over the lazy dog by the river shore"),
        (3, "completely different gardening text about tomatoes and soil"),
        (4, "sailing ships cross the harbor under a pale morning sky"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    vecs = tfidf_vectors(df, dim=64).select(
        F.col("doc_id").alias("vec_id"),
        F.transform("vec", lambda x: x.cast("double")).alias("embedding"),
    )
    q = vecs.filter(F.col("vec_id") == 1)
    top = brute_force_topk(vecs.filter(F.col("vec_id") != 1), q, k=1)
    assert [r["vec_id"] for r in top.collect()] == [2]


def test_determinism_across_partitionings(spark):
    df = spark.createDataFrame(ROWS * 5, ["doc_id", "text"]).withColumn(
        "doc_id",
        F.col("doc_id") + F.monotonically_increasing_id() * 0,
    )
    base = spark.createDataFrame(
        [(i, t) for i, (d, t) in enumerate(ROWS * 5)], ["doc_id", "text"]
    )
    a = sorted((r["doc_id"], list(r["vec"])) for r in tfidf_vectors(base.repartition(1), dim=DIM).collect())
    b = sorted((r["doc_id"], list(r["vec"])) for r in tfidf_vectors(base.repartition(7), dim=DIM).collect())
    assert a == b
