"""kcenter_select (operators/coreset.py): greedy farthest-first
diversity coreset — pure-Python twin over the identical quantized
integer arithmetic, partitioning invariance, k > corpus, duplicate
vectors."""

import math

from modern_document_converter_for_ai_library_spark.operators.coreset import (
    kcenter_select,
)

QSCALE = 1 << 20


def _twin(rows, k):
    q = {
        i: [math.floor(float(v) * QSCALE) for v in vec] for i, vec in rows
    }
    ids = sorted(q)
    picked = [(0, ids[0], 0)]
    dist = {i: None for i in ids}
    for rnd in range(1, k):
        c = q[picked[-1][1]]
        for i in ids:
            d = sum((a - b) * (a - b) for a, b in zip(q[i], c))
            dist[i] = d if dist[i] is None else min(dist[i], d)
        cand = [i for i in ids if i not in {p[1] for p in picked}]
        if not cand:
            break
        far = max(cand, key=lambda i: (dist[i], -i))
        picked.append((rnd, far, dist[far]))
    return picked


ROWS = [
    (1, [0.0, 0.0]),
    (2, [1.0, 0.0]),
    (3, [0.0, 1.0]),
    (4, [10.0, 10.0]),
    (5, [0.1, 0.1]),
]


def _run(spark, rows, k, partitions=None):
    df = spark.createDataFrame(
        rows, "vec_id: bigint, embedding: array<float>"
    )
    if partitions:
        df = df.repartition(partitions)
    return [
        (r["round"], r["vec_id"], r["qdist"])
        for r in kcenter_select(df, k=k).orderBy("round").collect()
    ]


def test_matches_twin_and_is_greedy(spark):
    got = _run(spark, ROWS, k=4)
    assert got == _twin(ROWS, 4)
    # seed is min id; the first pick is the far outlier
    assert got[0][:2] == (0, 1) and got[1][1] == 4


def test_partitioning_invariance(spark):
    assert _run(spark, ROWS, k=5, partitions=7) == _twin(ROWS, 5)


def test_k_exceeds_corpus(spark):
    rows = ROWS[:2]
    got = _run(spark, rows, k=10)
    assert len(got) == 2
    assert got == _twin(rows, 10)


def test_duplicate_vectors_tiebreak_min_id(spark):
    rows = [(1, [0.0, 0.0]), (2, [1.0, 1.0]), (3, [1.0, 1.0])]
    got = _run(spark, rows, k=3)
    assert got == _twin(rows, 3)
    # both duplicates end up selected, the lower id first
    assert [g[1] for g in got] == [1, 2, 3]
    assert got[2][2] == 0  # zero distance to the already-picked twin
