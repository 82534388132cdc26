"""repeated_ngram_stats (operators/dedup.py): sliding-window duplicated
n-gram exposure — planted cross-doc repeats at a mid-chunk alignment
(the case non-overlapping passage chunking misses), within-doc repeats,
and the short-doc exclusion."""

from modern_document_converter_for_ai_library_spark.operators.dedup import (
    repeated_ngram_stats,
)

PASSAGE = "p1 p2 p3 p4 p5 p6 p7 p8"  # exactly one 8-gram


def _stats(spark, docs, n=8):
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    return {
        r["doc_id"]: (r["n_grams"], r["n_dup_grams"], r["dup_fraction_micros"])
        for r in repeated_ngram_stats(df, n=n).collect()
    }


def test_cross_doc_repeat_at_shifted_alignment(spark):
    # doc b carries the passage after a 3-token prefix — every chunking
    # scheme aligned to doc a misses it; the sliding window does not.
    docs = [
        ("a", PASSAGE),
        ("b", "x1 x2 x3 " + PASSAGE + " y1"),
        ("c", "z1 z2 z3 z4 z5 z6 z7 z8"),
    ]
    got = _stats(spark, docs)
    assert got["a"] == (1, 1, 1_000_000)
    # doc b: 12 tokens -> 5 grams; only the aligned passage gram repeats
    assert got["b"] == (5, 1, 200_000)
    assert got["c"] == (1, 0, 0)


def test_within_doc_repeat_counts_both_occurrences(spark):
    got = _stats(spark, [("a", PASSAGE + " sep " + PASSAGE)])
    # 17 tokens -> 10 grams; the passage gram occurs twice -> both dup
    assert got["a"][0] == 10
    assert got["a"][1] == 2


def test_short_docs_are_excluded(spark):
    got = _stats(spark, [("a", "only three tokens"), ("b", PASSAGE)])
    assert "a" not in got
    assert got["b"] == (1, 0, 0)


def test_empty_tokens_filtered(spark):
    # double spaces produce empty split cells that must not form grams
    got = _stats(spark, [("a", "p1  p2 p3 p4 p5 p6 p7  p8"), ("b", PASSAGE)])
    assert got["a"] == (1, 1, 1_000_000)
    assert got["b"] == (1, 1, 1_000_000)
