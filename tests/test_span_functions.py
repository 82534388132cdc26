"""Columnar span-array functions (S8 multizone, S9 limit, S10 image probe)."""

import pytest
from pyspark.sql import functions as F

from modern_document_converter_for_ai_library_spark.functions.spans import (
    doc_text_col,
    is_probably_image_doc,
    limit_spans,
    multizone_spans,
)
from modern_document_converter_for_ai_library_spark.sources import DOCS_SCHEMA


def _doc(doc_id, texts, media_at=()):
    spans, off = [], 0
    for i, t in enumerate(texts):
        if i in media_at:
            spans.append({"kind": "image", "text": "", "media_ref": f"m://{doc_id}/{i}", "offset": off})
            off += 1
        spans.append({"kind": "text", "text": t, "media_ref": "", "offset": off})
        off += 1
    return (doc_id, f"{doc_id}.pdf", spans)


@pytest.fixture(scope="module")
def df(spark):
    rows = [
        _doc("long", [f"page {i} content with enough text here" for i in range(10)]),
        _doc("short", ["only", "two"]),
        _doc("tiny", ["ab"]),
        _doc("media", ["x" * 60, "y" * 60], media_at=(0,)),
    ]
    return spark.createDataFrame(rows, schema=DOCS_SCHEMA)


def test_multizone_slices_and_marks(spark, df):
    out = {r["doc_id"]: r["z"] for r in df.select("doc_id", multizone_spans(first=5, last=2).alias("z")).collect()}
    longz = out["long"]
    assert len(longz) == 8  # 5 + marker + 2
    assert longz[5]["text"] == "...[DOCUMENT MIDDLE OMITTED: 3 pages]..."
    assert [s["offset"] for s in longz] == list(range(8))
    assert longz[0]["text"].startswith("page 0")
    assert longz[-1]["text"].startswith("page 9")
    # short docs pass through untouched
    assert [s["text"] for s in out["short"]] == ["only", "two"]


def test_limit_spans(spark, df):
    out = {r["doc_id"]: r["z"] for r in df.select("doc_id", limit_spans(max_spans=3).alias("z")).collect()}
    assert len(out["long"]) == 3
    assert len(out["tiny"]) == 1


def test_image_probe(spark, df):
    out = {r["doc_id"]: r["p"] for r in df.select("doc_id", is_probably_image_doc().alias("p")).collect()}
    assert out["tiny"] is True  # < 50 chars in first spans
    assert out["long"] is False
    assert out["media"] is False  # 60+60 chars of text


def test_doc_text_roundtrip(spark, df):
    out = {r["doc_id"]: r["t"] for r in df.select("doc_id", doc_text_col().alias("t")).collect()}
    assert out["short"] == "only\ntwo"
    assert out["media"] == "x" * 60 + "\n" + "y" * 60  # media spans excluded


def test_multizone_is_pure_codegen(spark, df):
    plan = df.select(multizone_spans().alias("z"))._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "MapInPandas" not in plan
