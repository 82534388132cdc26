"""chunk_documents (operators/chunking.py): overlap invariants — every
consecutive chunk pair shares exactly `overlap` tokens, coverage is
total, tails are short-but-novel, and empty docs vanish."""

import pytest

from modern_document_converter_for_ai_library_spark.operators.chunking import (
    chunk_documents,
)


def _chunks(spark, text, chunk_tokens=8, overlap=3):
    df = spark.createDataFrame([("d", text)], ["doc_id", "text"])
    out = chunk_documents(df, chunk_tokens=chunk_tokens, overlap=overlap)
    return [
        (r["chunk_idx"], r["n_tokens"], r["chunk_text"])
        for r in sorted(out.collect(), key=lambda r: r["chunk_idx"])
    ]


def test_overlap_and_coverage(spark):
    toks = ["t%02d" % i for i in range(23)]
    got = _chunks(spark, " ".join(toks), chunk_tokens=8, overlap=3)
    step = 5
    # chunk i covers toks[i*step : i*step+8]
    assert len(got) == 5  # starts 0,5,10,15,20 (< 23)
    for idx, n_tokens, text in got:
        exp = toks[idx * step : idx * step + 8]
        assert text.split(" ") == exp
        assert n_tokens == len(exp)
    # consecutive chunks share exactly `overlap` tokens (full chunks)
    for (i1, _, t1), (_, _, t2) in zip(got, got[1:]):
        a, b = t1.split(" "), t2.split(" ")
        if len(a) == 8:
            assert a[-3:] == b[:3]
    # coverage: every token appears in some chunk
    seen = {t for _, _, text in got for t in text.split(" ")}
    assert seen == set(toks)


def test_exact_multiple_has_no_empty_tail(spark):
    # 13 tokens, step 5: starts 0,5,10 — the tail chunk has 3 new tokens
    got = _chunks(spark, " ".join("x%d" % i for i in range(13)))
    assert [g[0] for g in got] == [0, 1, 2]
    assert got[-1][1] == 3


def test_short_and_empty_docs(spark):
    assert _chunks(spark, "a b") == [(0, 2, "a b")]
    empty = spark.createDataFrame([("e", " ")], ["doc_id", "text"])
    assert chunk_documents(empty).count() == 0


def test_invalid_overlap_rejected(spark):
    df = spark.createDataFrame([("d", "a b c")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(df, chunk_tokens=8, overlap=8)
