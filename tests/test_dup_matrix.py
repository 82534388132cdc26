"""Cross-source duplicate matrix (operators/dedup.py:
cross_source_dup_matrix): pure-Python twin, the bounded-fanout skew
property, pair-count arithmetic (within vs across source), and
partitioning invariance."""

import hashlib
from itertools import combinations

from modern_document_converter_for_ai_library_spark.operators.dedup import (
    cross_source_dup_matrix,
)


def _py_matrix(rows):
    per = {}
    for _id, text, src in rows:
        h = hashlib.md5((text or "").encode()).hexdigest()
        per[(h, src)] = per.get((h, src), 0) + 1
    out = {}
    hashes = {h for h, _ in per}
    for h in hashes:
        srcs = sorted(s for (hh, s) in per if hh == h)
        for a, b in list(combinations(srcs, 2)) + [(s, s) for s in srcs]:
            ca, cb = per[(h, a)], per[(h, b)]
            pairs = ca * (ca - 1) // 2 if a == b else ca * cb
            if pairs > 0:
                g, p = out.get((a, b), (0, 0))
                out[(a, b)] = (g + 1, p + pairs)
    return out


ROWS = [
    (1, "shared text one", "web"),
    (2, "shared text one", "news"),
    (3, "shared text one", "news"),
    (4, "only here", "web"),
    (5, "pair inside web", "web"),
    (6, "pair inside web", "web"),
    (7, "triple cross", "web"),
    (8, "triple cross", "news"),
    (9, "triple cross", "wiki"),
    (10, None, "wiki"),
    (11, "", "web"),  # null and '' hash identically -> a cross pair
]


def test_matches_python_twin(spark):
    df = spark.createDataFrame(ROWS, ["doc_id", "text", "source"])
    got = {
        (r["source_a"], r["source_b"]): (r["dup_groups"], r["dup_pairs"])
        for r in cross_source_dup_matrix(df).collect()
    }
    assert got == _py_matrix(ROWS)
    # spot-check the arithmetic: news has 2 copies of "shared text one"
    # -> 1 within-news pair; web x news shares that text (1*2) and
    # "triple cross" (1*1) -> 3 cross pairs over 2 groups
    assert got[("news", "news")] == (1, 1)
    assert got[("news", "web")] == (2, 3)


def test_degenerate_group_stays_bounded(spark):
    # one universal text in 300 docs over 3 sources: the matrix must
    # still be at most 3x3 rows with exact pair counts
    rows = [(i, "same boilerplate", ["a", "b", "c"][i % 3]) for i in range(300)]
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    got = {
        (r["source_a"], r["source_b"]): r["dup_pairs"]
        for r in cross_source_dup_matrix(df).collect()
    }
    assert len(got) == 6  # 3 within + 3 cross
    assert got[("a", "a")] == 100 * 99 // 2
    assert got[("a", "b")] == 100 * 100


def test_partitioning_invariance(spark):
    df = spark.createDataFrame(ROWS, ["doc_id", "text", "source"])
    r1 = {tuple(r) for r in cross_source_dup_matrix(df.repartition(7)).collect()}
    r2 = {tuple(r) for r in cross_source_dup_matrix(df.repartition(2)).collect()}
    assert r1 == r2
