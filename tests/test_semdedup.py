"""SemDeDup operator (operators/semdedup.py): planted-duplicate semantics,
the paper's farthest-from-centroid keep rule, cell-size skew guard, and
recompute determinism."""

import math

import pytest
from pyspark.sql import functions as F

from modern_document_converter_for_ai_library_spark.operators.semdedup import (
    oversized_cells,
    semantic_dedup,
)


def _unit(vs):
    n = math.sqrt(sum(v * v for v in vs))
    return [v / n for v in vs]


def _corpus(spark, rows):
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


DIM = 8


def _axis(i, eps=0.0, dim=DIM):
    v = [0.0] * dim
    v[i] = 1.0
    if eps:
        v[(i + 1) % dim] = eps
    return _unit(v)


def test_planted_neardup_drops_exactly_one(spark):
    # two clusters along axes 0 and 1; cluster 0 holds a near-identical
    # pair (cos ~ 0.9995) plus a distant-but-same-cell member
    rows = [
        (1, _axis(0)),
        (2, _axis(0, eps=0.03)),  # near-dup of 1
        (3, _unit([1.0, 0.6, 0, 0, 0, 0, 0, 0])),  # same cell, cos ~0.86 to 1
        (4, _axis(1)),
        (5, _axis(1, eps=0.02)),  # near-dup of 4
    ]
    out = semantic_dedup(
        _corpus(spark, rows),
        n_centroids=2,
        threshold=0.95,
        lloyd_iterations=1,
    ).collect()
    by_id = {r["vec_id"]: r for r in out}
    assert len(by_id) == 5
    # exactly one of each planted pair is dropped; the cos~0.86 member
    # survives a 0.95 threshold
    pair1 = {by_id[1]["kept"], by_id[2]["kept"]}
    pair2 = {by_id[4]["kept"], by_id[5]["kept"]}
    assert pair1 == {True, False}
    assert pair2 == {True, False}
    assert by_id[3]["kept"]
    # pair members share a cell
    assert by_id[1]["cell"] == by_id[2]["cell"]
    assert by_id[4]["cell"] == by_id[5]["cell"]


def test_keep_rule_prefers_farther_from_centroid(spark):
    # a 3-member cell where all pairs exceed the threshold: survivors are
    # exactly the earliest in (cdist DESC, vec_id ASC) order — the paper's
    # lowest-centroid-similarity representative
    base = _axis(0)
    rows = [
        (1, base),
        (2, _axis(0, eps=0.01)),
        (3, _axis(0, eps=0.02)),
    ]
    out = semantic_dedup(
        _corpus(spark, rows),
        n_centroids=1,
        threshold=0.9,
        lloyd_iterations=1,
    ).collect()
    kept = sorted(r["vec_id"] for r in out if r["kept"])
    dropped = sorted(r["vec_id"] for r in out if not r["kept"])
    assert len(kept) == 1 and len(dropped) == 2
    by_id = {r["vec_id"]: r["cdist"] for r in out}
    # the survivor has the maximal centroid distance (ties by lower id)
    surv = kept[0]
    assert all(
        (by_id[surv], -surv) >= (by_id[d], -d) for d in dropped
    )


def test_max_cell_size_guard_keeps_oversized_cells_wholesale(spark):
    rows = [(i, _axis(0, eps=0.001 * i)) for i in range(1, 7)]
    guarded = semantic_dedup(
        _corpus(spark, rows),
        n_centroids=1,
        threshold=0.9,
        lloyd_iterations=0,
        max_cell_size=3,
    ).collect()
    # the single 6-member cell exceeds the cap: no pairwise sweep, all kept
    assert all(r["kept"] for r in guarded)
    audit = oversized_cells(
        _corpus(spark, rows),
        n_centroids=1,
        max_cell_size=3,
        lloyd_iterations=0,
    ).collect()
    assert len(audit) == 1 and audit[0]["cell_size"] == 6


def test_recompute_determinism(spark):
    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    out = semantic_dedup(
        emb, n_centroids=8, threshold=0.35, lloyd_iterations=2, lloyd_sample_mod=5
    )
    a = sorted(map(tuple, out.collect()))
    b = sorted(map(tuple, out.collect()))  # second materialization, no cache
    assert a == b
    # the threshold actually bites on this corpus
    assert any(not r[3] for r in a)
    assert sum(1 for r in a if r[3]) > len(a) // 2


def test_cache_scope_releases(spark):
    from modern_document_converter_for_ai_library_spark.plans.caching import CacheScope

    def _ids():
        return set(
            spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray()
        )

    before = _ids()
    rows = [(i, _axis(i % DIM, eps=0.01)) for i in range(1, 9)]
    with CacheScope() as scope:
        out = semantic_dedup(
            _corpus(spark, rows),
            n_centroids=2,
            threshold=0.99,
            lloyd_iterations=1,
            cache_scope=scope,
        )
        out.collect()
        assert _ids() - before
    assert _ids() == before
