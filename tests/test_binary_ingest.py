"""binaryFile-source ingestion plumbing (S3/S5/S6/S7 front end): real Spark
source + Arrow extraction stage + error channel, with the extractors
import-gated (sandbox has no pdf/docx libs)."""

import pytest

from modern_document_converter_for_ai_library_spark.sources.binary_ingest import (
    default_extractor,
    ingest_binary_documents,
)


@pytest.fixture(scope="module")
def raw_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("rawdocs")
    (d / "alpha.pdf").write_bytes(b"PAGE1 line one\nline two\x00PAGE2 more")
    (d / "beta.docx").write_bytes(b"docx bytes here")
    (d / "legacy.doc").write_bytes(b"old word file")
    (d / "notes.xyz").write_bytes(b"unknown format")
    (d / "novel.epub").write_bytes(b"PK fake epub zip")
    return str(d)


def _make_fake_extractor():
    """Deterministic stand-in decoder: pages split on NUL bytes. Built as a
    closure so cloudpickle ships it by value (the tests module is not
    importable on executors)."""

    def _fake(name: str, content: bytes):
        if name.endswith((".xyz", ".epub")):
            raise RuntimeError("Unsupported file format")
        pages = [p.decode("utf-8", "replace") for p in content.split(b"\x00")]
        return pages, len(pages)

    return _fake


_fake_extractor = _make_fake_extractor()


def test_ingest_with_injected_extractor(spark, raw_dir):
    out = {
        r["doc_id"]: r
        for r in ingest_binary_documents(
            spark, raw_dir, extractor=_fake_extractor
        ).collect()
    }
    assert len(out) == 5
    a = out["alpha"]
    assert a["success"] and a["n_pages"] == 2
    texts = [s["text"] for s in a["spans"]]
    # page join is "\n\n": blank line between page 1 and page 2
    assert texts == ["PAGE1 line one", "line two", "", "PAGE2 more"]
    assert all(s["kind"] == "text" for s in a["spans"])
    assert [s["offset"] for s in a["spans"]] == [0, 1, 2, 3]
    bad = out["notes"]
    assert not bad["success"] and "Unsupported file format" in bad["error_message"]


def test_ingest_default_extractor_gates_missing_deps(spark, raw_dir):
    """Without pdfplumber/python-docx/soffice every row fails cleanly with
    the dependency named — no exception escapes the job."""
    rows = ingest_binary_documents(spark, raw_dir).collect()
    assert len(rows) == 5
    by_id = {r["doc_id"]: r for r in rows}
    assert not by_id["alpha"]["success"]
    assert "pdfplumber" in by_id["alpha"]["error_message"]
    assert not by_id["beta"]["success"]
    assert "python-docx" in by_id["beta"]["error_message"]
    assert not by_id["legacy"]["success"]
    assert "soffice" in by_id["legacy"]["error_message"] or "LibreOffice" in by_id["legacy"]["error_message"]
    assert not by_id["notes"]["success"]
    assert not by_id["novel"]["success"]
    assert "calibre" in by_id["novel"]["error_message"] or "ebook-convert" in by_id["novel"]["error_message"]


def test_ingest_plan_is_one_arrow_stage(spark, raw_dir):
    df = ingest_binary_documents(spark, raw_dir, extractor=_fake_extractor)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert plan.count("MapInPandas") == 1


def test_ingest_glob_filter(spark, raw_dir):
    rows = ingest_binary_documents(
        spark, raw_dir, extractor=_fake_extractor, path_glob="*.pdf"
    ).collect()
    assert [r["doc_id"] for r in rows] == ["alpha"]
