"""Window operators: caption finder (W4), heading candidates (W1), batch stats (A6)."""

import pytest

from modern_document_converter_for_ai_library_spark.operators import convert_documents
from modern_document_converter_for_ai_library_spark.operators.windows import (
    batch_stats,
    find_captions,
    heading_candidates,
)
from modern_document_converter_for_ai_library_spark.sources import DOCS_SCHEMA


def _doc(doc_id, lines):
    return (
        doc_id,
        f"{doc_id}.pdf",
        [
            {"kind": "text", "text": ln, "media_ref": "", "offset": i}
            for i, ln in enumerate(lines)
        ],
    )


@pytest.fixture(scope="module")
def df(spark):
    rows = [
        _doc("cap1", ["Noise header", "Smith v. Jones", "Court of Appeals of Georgia"]),
        _doc("cap2", ["x"] * 50 + ["Late v. Caption"]),  # beyond first 40 lines
        _doc("head1", ["", "INTRODUCTION", "", "Body text continues here with many words beyond shape."]),
        _doc("none", ["just prose", "nothing else"]),
    ]
    return spark.createDataFrame(rows, schema=DOCS_SCHEMA)


def test_find_captions(spark, df):
    out = {r["doc_id"]: r for r in find_captions(df).collect()}
    assert out["cap1"]["caption"] == "Smith v. Jones"
    assert out["cap1"]["prev_line"] == "Noise header"
    assert out["cap1"]["next_line"] == "Court of Appeals of Georgia"
    assert "cap2" not in out  # caption after line 40 is out of scope
    assert "none" not in out


def test_heading_candidates(spark, df):
    out = [(r["doc_id"], r["heading"]) for r in heading_candidates(df).collect()]
    assert ("head1", "INTRODUCTION") in out
    texts = [h for d, h in out if d == "head1"]
    assert all("Body text" not in t for t in texts)


def test_batch_stats(spark, df):
    stats = batch_stats(convert_documents(df)).collect()[0]
    assert stats["total_files"] == 4
    assert stats["successful"] == 4
    assert stats["failed"] == 0
    assert stats["success_rate_micros"] == 1_000_000
