"""Tests for integer-exact BM25 ranking: a pure-Python twin asserts
bit-exact scores, and rare terms outrank common ones at equal tf."""

from collections import Counter

from modern_document_converter_for_ai_library_spark.operators.search import (
    IDF_SCALE_BITS,
    bm25_rank,
)


def _bm25_py(corpus, terms, top_k=20):
    toks = {d: [t for t in text.split(" ") if t] for d, text in corpus}
    lens = {d: len(ts) for d, ts in toks.items()}
    T, N = sum(lens.values()), len(lens)
    tf = {d: Counter(ts) for d, ts in toks.items()}
    df = {q: sum(1 for d in tf if tf[d][q] > 0) for q in terms}
    out = {}
    for d in tf:
        score = hits = 0
        for q in terms:
            f = tf[d][q]
            if not f:
                continue
            ratio = (2 * (N - df[q]) + 1) * (1 << IDF_SCALE_BITS) // (2 * df[q] + 1)
            idf = ratio.bit_length() - 1
            score += idf * 44 * f * T // (20 * f * T + 6 * T + 18 * lens[d] * N)
            hits += 1
        if hits:
            out[d] = (score, hits)
    ranked = sorted(out.items(), key=lambda kv: (-kv[1][0], kv[0]))[:top_k]
    return [(d, s, h) for d, (s, h) in ranked]


def _corpus():
    rows = []
    for i in range(60):
        body = "filler pad pad pad " * (1 + i % 4) + "common "
        if i % 2 == 0:
            body += "common common "
        if i in (7, 21):
            body += "needle "
        rows.append((i, body.strip()))
    return rows


def test_exact_python_twin(spark):
    corpus = _corpus()
    df = spark.createDataFrame(corpus, ["doc_id", "text"])
    got = [
        (r["doc_id"], r["score"], r["n_hit_terms"])
        for r in bm25_rank(df, ["common", "needle"], top_k=20).collect()
    ]
    assert got == _bm25_py(corpus, ["common", "needle"])


def test_rare_term_outranks_common(spark):
    corpus = _corpus()
    df = spark.createDataFrame(corpus, ["doc_id", "text"])
    top = bm25_rank(df, ["common", "needle"], top_k=2).collect()
    assert {r["doc_id"] for r in top} == {7, 21}


def test_empty_terms_returns_empty_frame(spark):
    df = spark.createDataFrame(_corpus(), ["doc_id", "text"])
    out = bm25_rank(df, [])
    assert out.columns == ["doc_id", "score", "n_hit_terms"]
    assert out.count() == 0


def test_empty_corpus_returns_empty_frame(spark):
    df = spark.createDataFrame([], "doc_id long, text string")
    assert bm25_rank(df, ["needle"]).count() == 0


def test_string_doc_ids_rank(spark):
    rows = [("d%02d" % i, t) for i, (_, t) in enumerate(_corpus())]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    top = bm25_rank(df, ["needle"], top_k=2).collect()
    assert {r["doc_id"] for r in top} == {"d07", "d21"}
