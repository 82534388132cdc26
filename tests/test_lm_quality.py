"""Tests for bigram_lm_scores — the CCNet-shape self-trained LM quality
filter (operators/quality.py): planted fluency separation, exact
pure-Python replication of the integer bit accounting, and the
broadcast-join plan shape."""

import hashlib

import pytest
from pyspark.sql import functions as F

from modern_document_converter_for_ai_library_spark.operators.quality import (
    bigram_lm_scores,
)

B = 1 << 20
SEP = "\u001f"


def _h(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16) % B


def _ilog2(x: int) -> int:
    return x.bit_length() - 1


def _expected(corpus: dict[str, str], smoothing: int = 256):
    """Pure-Python twin of the operator's accounting."""
    dg: dict[tuple[str, int, int], int] = {}
    for doc, text in corpus.items():
        toks = [t for t in text.split(" ") if t]
        for w1, w2 in zip(toks, toks[1:]):
            k = (doc, _h(w1), _h(w1 + SEP + w2))
            dg[k] = dg.get(k, 0) + 1
    c12: dict[int, int] = {}
    c1: dict[int, int] = {}
    for (_, h1, h12), m in dg.items():
        c12[h12] = c12.get(h12, 0) + m
        c1[h1] = c1.get(h1, 0) + m
    out = {}
    for doc in corpus:
        bits = n = 0
        for (d, h1, h12), m in dg.items():
            if d != doc:
                continue
            bits += m * (_ilog2(c1[h1] + smoothing) - _ilog2(c12[h12] + 1))
            n += m
        # truncate toward zero like Spark `div` / DuckDB `//` — Python //
        # floors, which differs by 1 for negative inexact quotients (bits
        # can go negative under feature-hash collisions)
        q = bits * 1_000_000
        bpg = (abs(q) // n) * (1 if q >= 0 else -1) if n else 0
        out[doc] = (bits, n, bpg)
    return out


def test_exact_bit_accounting(spark):
    corpus = {
        "a": "the cat sat on the mat",
        "b": "the cat sat on the mat again and again",
        "c": "zq xv qp zz",
        "d": "",
        "e": "solo",
    }
    df = spark.createDataFrame(
        [(k, v) for k, v in corpus.items()], ["doc_id", "text"]
    )
    rows = {
        r["doc_id"]: r
        for r in bigram_lm_scores(df, id_col="doc_id").collect()
    }
    exp = _expected(corpus)
    for doc, (bits, n, bpg) in exp.items():
        assert rows[doc]["bits"] == bits, doc
        assert rows[doc]["n_bigrams"] == n, doc
        assert rows[doc]["bits_per_gram_micros"] == bpg, doc
    # zero-bigram docs are dropped regardless of threshold
    assert rows["d"]["keep"] is False and rows["e"]["keep"] is False


def test_fluent_text_compresses_better_than_gibberish(spark):
    fluent = "the court held that the judgment of the lower court is affirmed"
    rows = [(str(i), fluent) for i in range(40)]
    rows.append(("gib", "qzx vbn mlp wrt ykj hgf dsa poi uyt rew"))
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    # tiny corpus → tiny context counts: tighten the bits/gram gate so the
    # keep flag separates too, not just the scores
    got = {
        r["doc_id"]: r
        for r in bigram_lm_scores(df, max_bits_per_gram_micros=5_000_000).collect()
    }
    fluent_bpg = got["0"]["bits_per_gram_micros"]
    gib_bpg = got["gib"]["bits_per_gram_micros"]
    assert fluent_bpg < gib_bpg
    assert got["0"]["keep"] is True
    assert got["gib"]["keep"] is False


def test_plan_uses_broadcast_model_joins(spark):
    df = spark.createDataFrame([("1", "a b c a b")], ["doc_id", "text"])
    plan = bigram_lm_scores(df)._jdf.queryExecution().executedPlan().toString()
    # both model joins must be broadcast (map-side); no cartesian products
    assert plan.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in plan


def _expected_dsir(
    corpus: dict[str, str], target_ids: set[str], smoothing: int = 256
):
    """Pure-Python twin of dsir_importance's integer accounting."""
    dg: dict[tuple[str, int, int], int] = {}
    for doc, text in corpus.items():
        toks = [t for t in text.split(" ") if t]
        for w1, w2 in zip(toks, toks[1:]):
            k = (doc, _h(w1), _h(w1 + SEP + w2))
            dg[k] = dg.get(k, 0) + 1
    r12: dict[int, int] = {}
    r1: dict[int, int] = {}
    t12: dict[int, int] = {}
    t1: dict[int, int] = {}
    for (d, h1, h12), m in dg.items():
        r12[h12] = r12.get(h12, 0) + m
        r1[h1] = r1.get(h1, 0) + m
        if d in target_ids:
            t12[h12] = t12.get(h12, 0) + m
            t1[h1] = t1.get(h1, 0) + m
    out = {}
    for doc in corpus:
        bits = n = 0
        for (d, h1, h12), m in dg.items():
            if d != doc:
                continue
            braw = _ilog2(r1[h1] + smoothing) - _ilog2(r12[h12] + 1)
            btgt = _ilog2(t1.get(h1, 0) + smoothing) - _ilog2(
                t12.get(h12, 0) + 1
            )
            bits += m * (braw - btgt)
            n += m
        q = bits * 1_000_000
        ipg = (abs(q) // n) * (1 if q >= 0 else -1) if n else 0
        out[doc] = (bits, n, ipg)
    return out


def test_dsir_exact_integer_accounting(spark):
    from modern_document_converter_for_ai_library_spark.operators.quality import (
        dsir_importance,
    )

    corpus = {
        "t1": "the court held that the judgment is affirmed",
        "t2": "the court held that the appeal is denied",
        "o1": "buy cheap watches online today great deals now",
        "o2": "the court held that the judgment is reversed",
        "z": "",
    }
    target_ids = {"t1", "t2"}
    df = spark.createDataFrame(
        [(k, v) for k, v in corpus.items()], ["doc_id", "text"]
    )
    target = df.filter(F.col("doc_id").isin(*target_ids)).select(
        "doc_id", "text"
    )
    rows = {r["doc_id"]: r for r in dsir_importance(df, target).collect()}
    exp = _expected_dsir(corpus, target_ids)
    for doc, (bits, n, ipg) in exp.items():
        assert rows[doc]["importance_bits"] == bits, doc
        assert rows[doc]["n_bigrams"] == n, doc
        assert rows[doc]["importance_per_gram_micros"] == ipg, doc
    # target-shaped text scores above the off-domain text, and a
    # zero-bigram doc is never kept
    assert (
        rows["o2"]["importance_per_gram_micros"]
        > rows["o1"]["importance_per_gram_micros"]
    )
    assert rows["z"]["keep"] is False


def test_dsir_plan_broadcasts_all_model_joins(spark):
    from modern_document_converter_for_ai_library_spark.operators.quality import (
        dsir_importance,
    )

    df = spark.createDataFrame(
        [("1", "a b c a b"), ("2", "a b d e f")], ["doc_id", "text"]
    )
    target = df.filter(F.col("doc_id") == "1").select("doc_id", "text")
    plan = (
        dsir_importance(df, target)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # all four model joins (raw 1/12, target 1/12) must be broadcast
    assert plan.count("BroadcastHashJoin") >= 4
    assert "CartesianProduct" not in plan
