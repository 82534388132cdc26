"""line_dedup (operators/dedup.py) and blocklist_filter
(operators/quality.py): RefinedWeb-style corpus-wide repeated-line
removal and the C4 bad-word/phrase screen — pure-Python twins, strike
semantics at the min_count boundary, doc-drop threshold, map-only plan
shape for the blocklist."""

from collections import Counter

from pyspark.sql import functions as F

from modern_document_converter_for_ai_library_spark.operators.dedup import (
    line_dedup,
)
from modern_document_converter_for_ai_library_spark.operators.quality import (
    blocklist_filter,
)

MICRO = 1_000_000


def _twin(docs, min_count=3, max_frac=300_000):
    """Sequential reference: strike every line whose content occurs
    >= min_count times corpus-wide (within-doc repeats count)."""
    counts = Counter(line for _, lines in docs for line in lines)
    out = {}
    for did, lines in docs:
        kept = [l for l in lines if counts[l] < min_count]
        n_removed = len(lines) - len(kept)
        out[did] = (
            len(lines),
            n_removed,
            "\n".join(kept),
            n_removed * MICRO <= max_frac * len(lines),
        )
    return out


def _run(spark, docs, **kw):
    df = spark.createDataFrame(docs, ["doc_id", "lines"])
    return {
        r["doc_id"]: (
            r["n_lines"],
            r["n_removed"],
            r["text_clean"],
            r["keep_doc"],
        )
        for r in line_dedup(df, **kw).collect()
    }


BANNER = "accept all cookies"


def test_line_dedup_matches_twin(spark):
    docs = [
        ("a", [BANNER, "real content one", "more words here"]),
        ("b", [BANNER, "unique thought", BANNER]),
        ("c", ["real content one", BANNER, "tail line"]),
        ("d", ["nothing shared at all"]),
    ]
    got = _run(spark, docs, min_count=3)
    assert got == _twin(docs, min_count=3)
    # the banner occurs 4x -> struck everywhere; "real content one" only
    # twice -> survives under min_count=3
    assert got["a"][1] == 1 and "real content one" in got["a"][2]
    assert got["b"] == (3, 2, "unique thought", False)


def test_min_count_boundary_inclusive(spark):
    docs = [("a", ["x y"]), ("b", ["x y"]), ("c", ["x y", "solo"])]
    # exactly 3 occurrences: >= min_count -> struck
    got = _run(spark, docs, min_count=3)
    assert got == _twin(docs, min_count=3)
    # 1 of 2 lines struck = 500_000 micros > 300_000 -> doc dropped
    assert got["c"] == (2, 1, "solo", False)
    # min_count=4 leaves everything intact
    got4 = _run(spark, docs, min_count=4)
    assert all(v[1] == 0 for v in got4.values())


def test_doc_drop_threshold(spark):
    # 2 of 3 lines struck = 666_667 micros > 300_000 -> keep_doc False;
    # 1 of 4 struck = 250_000 -> True
    docs = [
        ("a", [BANNER, BANNER, "own words"]),
        ("b", [BANNER, "w1", "w2", "w3"]),
        ("c", [BANNER]),
    ]
    got = _run(spark, docs, min_count=3)
    assert got == _twin(docs, min_count=3)
    assert got["a"][3] is False and got["b"][3] is True
    assert got["c"] == (1, 1, "", False)


def test_every_row_survives_and_empty_lines_list(spark):
    docs = [("a", []), ("b", ["one line"])]
    got = _run(spark, docs)
    assert got["a"] == (0, 0, "", True)
    assert got["b"] == (1, 0, "one line", True)


def test_partitioning_invariance(spark):
    docs = [(f"d{i}", [BANNER, f"unique {i}"]) for i in range(20)]
    df = spark.createDataFrame(docs, ["doc_id", "lines"])
    one = {
        r["doc_id"]: r["n_removed"]
        for r in line_dedup(df.coalesce(1)).collect()
    }
    many = {
        r["doc_id"]: r["n_removed"]
        for r in line_dedup(df.repartition(13)).collect()
    }
    assert one == many and all(v == 1 for v in one.values())


# ---------------------------------------------------------------------------
# blocklist_filter
# ---------------------------------------------------------------------------


def _block(spark, docs, terms, phrases=()):
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    return {
        r["doc_id"]: (
            r["n_term_hits"],
            r["n_terms_matched"],
            r["n_phrases_matched"],
            r["flagged"],
        )
        for r in blocklist_filter(df, terms, phrases).collect()
    }


def test_blocklist_terms_and_phrases(spark):
    docs = [
        ("a", "the bad word and BAD again"),
        ("b", "totally clean text"),
        ("c", "a very bad phrase sits here"),
        ("d", "badly does not match bad-word either"),
    ]
    got = _block(spark, docs, terms=("bad",), phrases=("bad phrase",))
    # token matches are case-insensitive whole tokens: "badly"/"bad-word"
    # must NOT match
    assert got["a"] == (2, 1, 0, True)
    assert got["b"] == (0, 0, 0, False)
    assert got["c"] == (1, 1, 1, True)
    assert got["d"] == (0, 0, 0, False)


def test_blocklist_phrase_at_edges_and_multi(spark):
    docs = [("a", "join order first"), ("b", "ends with join order")]
    got = _block(
        spark, docs, terms=("missing",), phrases=("join order", "never here")
    )
    assert got["a"] == (0, 0, 1, True)
    assert got["b"] == (0, 0, 1, True)


def test_blocklist_distinct_vs_occurrence_counts(spark):
    got = _block(
        spark,
        [("a", "x x y z")],
        terms=("x", "y", "q"),
    )
    assert got["a"] == (3, 2, 0, True)


def test_blocklist_is_map_only(spark):
    df = spark.createDataFrame([("a", "t")], ["doc_id", "text"])
    plan = (
        blocklist_filter(df, ("bad",), ("bad phrase",))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan and "BatchEvalPython" not in plan


def test_line_dedup_randomized_twin_sweep(spark):
    import random

    rng = random.Random(7)
    pool = [f"line {i} content words" for i in range(12)]
    docs = [
        (
            f"d{j}",
            [pool[rng.randrange(len(pool))] for _ in range(rng.randrange(1, 7))],
        )
        for j in range(40)
    ]
    for mc in (2, 3, 5):
        assert _run(spark, docs, min_count=mc) == _twin(docs, min_count=mc)
