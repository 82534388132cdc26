"""chunk_documents (operators/chunking.py): overlap invariants — every
consecutive chunk pair shares exactly `overlap` tokens, every non-first
chunk carries at least one NEW token (no fully-redundant tails),
coverage is total, count matches ceil((n - overlap) / step), and empty
docs vanish."""

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


def test_overlap_coverage_and_count(spark):
    toks = ["t%02d" % i for i in range(23)]
    got = _chunks(spark, " ".join(toks), chunk_tokens=8, overlap=3)
    step = 5
    # count = ceil((n - overlap) / step) = ceil(20 / 5) = 4: the start at
    # 20 would cover only tokens already inside the chunk at 15 — dropped
    assert len(got) == 4
    for idx, n_tokens, text in got:
        exp = toks[idx * step : idx * step + 8]
        assert text.split(" ") == exp
        assert n_tokens == len(exp)
    # consecutive chunks share exactly `overlap` tokens, and every
    # non-first chunk adds at least one new token
    for (_, _, t1), (_, n2, t2) in zip(got, got[1:]):
        a, b = t1.split(" "), t2.split(" ")
        assert a[-3:] == b[:3]
        assert n2 > 3
    # coverage: every token appears in some chunk
    seen = {t for _, _, text in got for t in text.split(" ")}
    assert seen == set(toks)


def test_no_fully_redundant_tail(spark):
    # 13 tokens, step 5: the would-be start at 10 covers tokens 10-12,
    # all inside the chunk at 5 (tokens 5-12) — it must not be emitted
    got = _chunks(spark, " ".join("x%d" % i for i in range(13)))
    assert [g[0] for g in got] == [0, 1]
    assert got[-1][1] == 8  # the real tail chunk is the full 5..12 window


def test_tail_shorter_than_overlap_never_emitted(spark):
    # 11 tokens: start 10 would repeat only 1 predecessor token and add
    # none; cap keeps starts at 0 and 5 (chunk 5..10, 6 tokens)
    got = _chunks(spark, " ".join("y%d" % i for i in range(11)))
    assert [(g[0], g[1]) for g in got] == [(0, 8), (1, 6)]


def test_short_and_empty_docs(spark):
    assert _chunks(spark, "a b") == [(0, 2, "a b")]
    empty = spark.createDataFrame([("e", " ")], ["doc_id", "text"])
    assert chunk_documents(empty).count() == 0


def test_invalid_overlap_rejected(spark):
    df = spark.createDataFrame([("d", "a b c")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(df, chunk_tokens=8, overlap=8)
