"""Topic clustering (operators/topics.py): pure-Python twin over the full
tfidf -> seeded Lloyd -> summary chain, partitioning invariance, empty-cell
retention, and the map-only assignment plan claim."""

import hashlib

import pytest
from pyspark.sql import functions as F

from modern_document_converter_for_ai_library_spark.operators.topics import (
    topic_clusters,
    topic_summary,
)
from modern_document_converter_for_ai_library_spark.operators.vectorize import IDF_SCALE

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


def _py_cell(v, cents):
    d = [sum((x - y) * (x - y) for x, y in zip(v, c)) for c in cents]
    return d.index(min(d)) + 1  # first minimum -> lowest cell


def _py_topics(rows, k, dim=DIM, rounds=2, weight_cap=1 << 24):
    vecs = {
        d: [min(x, weight_cap) for x in v]
        for d, v in _py_tfidf(rows, dim).items()
    }
    ids = sorted(vecs)
    cents = [list(vecs[i]) for i in ids[: min(k, len(ids))]]
    for _ in range(rounds):
        assign = {i: _py_cell(vecs[i], cents) for i in ids}
        for ci in range(len(cents)):
            members = [vecs[i] for i in ids if assign[i] == ci + 1]
            if members:
                cents[ci] = [
                    sum(col) // len(members) for col in zip(*members)
                ]
    assign = {i: _py_cell(vecs[i], cents) for i in ids}
    return assign, cents


def _py_summary(assign, cents):
    out = {}
    for cell in set(assign.values()):
        c = cents[cell - 1]
        out[cell] = (
            sum(1 for v in assign.values() if v == cell),
            max(range(len(c)), key=lambda p: (c[p], -p)),
            sum(c),
        )
    return out


ROWS = [
    (1, "apple banana apple cherry pie"),
    (2, "apple banana cherry tart"),
    (3, "gardening soil tomatoes compost loam"),
    (4, "soil compost tomatoes greenhouse"),
    (5, "sailing harbor ships morning tide"),
    (6, "ships tide harbor evening sails"),
    (7, ""),
    (8, None),
    (9, "banana cherry apple pie crumble"),
    (10, "compost greenhouse loam beds"),
]


def test_matches_python_twin(spark):
    df = spark.createDataFrame(ROWS, ["doc_id", "text"])
    assigned, cents = topic_clusters(df, n_topics=3, dim=DIM, lloyd_iterations=2)
    got_assign = {r["doc_id"]: r["cell"] for r in assigned.collect()}
    exp_assign, exp_cents = _py_topics(ROWS, 3)
    assert got_assign == exp_assign
    assert cents == exp_cents

    got_sum = {
        r["cell"]: (r["n_docs"], r["top_bucket"], r["cmass"])
        for r in topic_summary(assigned, cents).collect()
    }
    assert got_sum == _py_summary(exp_assign, exp_cents)


def test_partitioning_invariance(spark):
    df = spark.createDataFrame(ROWS, ["doc_id", "text"])
    a1, c1 = topic_clusters(df.repartition(7), n_topics=3, dim=DIM)
    a2, c2 = topic_clusters(df.repartition(2), n_topics=3, dim=DIM)
    assert c1 == c2
    r1 = {(r["doc_id"], r["cell"]) for r in a1.collect()}
    r2 = {(r["doc_id"], r["cell"]) for r in a2.collect()}
    assert r1 == r2


def test_duplicate_seeds_tie_to_lowest_cell(spark):
    # identical texts -> identical seed vectors for cells 1 and 2; every
    # doc ties and must land in the LOWER cell; the empty cell keeps its
    # previous centroid and is absent from the summary
    rows = [(1, "same text here"), (2, "same text here"), (3, "same text here")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    assigned, cents = topic_clusters(df, n_topics=2, dim=DIM, lloyd_iterations=2)
    cells = {r["cell"] for r in assigned.collect()}
    assert cells == {1}
    summary = topic_summary(assigned, cents).collect()
    assert [r["cell"] for r in summary] == [1]
    assert summary[0]["n_docs"] == 3
    # cell 2's centroid survived the empty rounds unchanged (= the seed)
    assert cents[1] == cents[0]


def test_more_topics_than_docs(spark):
    rows = [(1, "alpha beta"), (2, "gamma delta")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    assigned, cents = topic_clusters(df, n_topics=5, dim=DIM)
    assert len(cents) == 2  # seeds bounded by the corpus
    assert assigned.count() == 2


def test_weight_cap_clamps_components(spark):
    # a tiny cap forces clamping on this corpus; the Spark result must
    # equal the twin computed over the clamped vectors (the overflow
    # guard changes values deterministically, not structurally)
    df = spark.createDataFrame(ROWS, ["doc_id", "text"])
    assigned, cents = topic_clusters(
        df, n_topics=3, dim=DIM, lloyd_iterations=2, weight_cap=1024
    )
    exp_assign, exp_cents = _py_topics(ROWS, 3, weight_cap=1024)
    got_assign = {r["doc_id"]: r["cell"] for r in assigned.collect()}
    assert got_assign == exp_assign
    assert cents == exp_cents
    assert max(w for c in cents for w in c) <= 1024
    # and the cap actually bit: the unclamped run has larger weights
    _, cents_full = topic_clusters(df, n_topics=3, dim=DIM)
    assert max(w for c in cents_full for w in c) > 1024


def test_assignment_plan_is_map_only(spark):
    df = spark.createDataFrame(ROWS, ["doc_id", "text"])
    assigned, _ = topic_clusters(df, n_topics=3, dim=DIM)
    plan = assigned._jdf.queryExecution().executedPlan().toString()
    # closure centroids + Arrow UDF assignment: map-only — no Exchange,
    # no Join; the only Python is the VECTORIZED ArrowEvalPython stage
    # (row-at-a-time BatchEvalPython stays banned)
    assert "Exchange" not in plan
    assert "Join" not in plan
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan
