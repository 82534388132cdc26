"""WARC ingestion: record framing, HTTP payload split, per-member gzip, and
the full WARC -> boilerplate-strip chain."""

import gzip

import pytest

from modern_document_converter_for_ai_library_spark.sources.warc import (
    parse_warc_bytes,
    read_warc_documents,
)

# two >16-word paragraphs: a single short paragraph sandwiched between
# link-dense blocks is (correctly) classified boilerplate by the WSDM tree
_HTML = (
    "<html><body><nav><a href='/'>Home</a> <a href='/x'>More</a></nav>"
    "<article><p>The court considered the standard of review applicable to "
    "the motion for summary judgment and the full record developed below in "
    "considerable detail before ruling.</p>"
    "<p>Counsel for both parties submitted supplemental briefs addressing "
    "the jurisdictional question raised at oral argument and the panel took "
    "the matter under advisement for several weeks.</p></article>"
    "<footer><a href='/p'>Privacy</a></footer></body></html>"
)


def _record(rec_id: str, url: str, warc_type: str = "response") -> bytes:
    if warc_type == "response":
        http = (
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
            + _HTML.encode()
        )
        payload = http
    else:
        payload = b"warcinfo: data"
    head = (
        f"WARC/1.0\r\n"
        f"WARC-Type: {warc_type}\r\n"
        f"WARC-Record-ID: <urn:uuid:{rec_id}>\r\n"
        f"WARC-Target-URI: {url}\r\n"
        f"Content-Length: {len(payload)}\r\n"
        f"\r\n"
    ).encode()
    return head + payload + b"\r\n\r\n"


def _shard_bytes() -> bytes:
    return (
        _record("info", "-", warc_type="warcinfo")
        + _record("r1", "https://example.com/a")
        + _record("r2", "https://example.com/b")
    )


def test_parse_warc_plain():
    recs = parse_warc_bytes(_shard_bytes(), shard="s1")
    assert [r["warc_type"] for r in recs] == ["warcinfo", "response", "response"]
    r1 = recs[1]
    assert r1["doc_id"] == "<urn:uuid:r1>"
    assert r1["url"] == "https://example.com/a"
    # HTTP headers are stripped from the payload
    assert r1["html"].startswith("<html>") and "200 OK" not in r1["html"]
    assert r1["n_payload_bytes"] == len(
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + _HTML.encode()
    )


def test_parse_warc_per_member_gzip():
    # Common Crawl layout: EACH record its own gzip member
    raw = (
        gzip.compress(_record("info", "-", warc_type="warcinfo"))
        + gzip.compress(_record("r1", "https://example.com/a"))
        + gzip.compress(_record("r2", "https://example.com/b"))
    )
    recs = parse_warc_bytes(raw, shard="s1.gz")
    assert len(recs) == 3
    assert recs[2]["url"] == "https://example.com/b"
    assert recs[2]["html"].startswith("<html>")


def test_parse_warc_missing_content_length_no_phantoms():
    """A record lacking a valid Content-Length cannot be framed; it must be
    SKIPPED (re-sync at the record terminator), not defaulted to length 0 —
    the 0-default re-syncs on the next 'WARC/' SUBSTRING and fabricates
    phantom records from payload bytes (ADVICE r2)."""
    # broken record whose payload contains a 'WARC/' decoy
    payload = b"see WARC/1.0 spec for details"
    broken = (
        b"WARC/1.0\r\n"
        b"WARC-Type: resource\r\n"
        b"WARC-Record-ID: <urn:uuid:bad>\r\n"
        b"\r\n" + payload + b"\r\n\r\n"
    )
    good = _record("ok", "https://example.com/ok")
    recs = parse_warc_bytes(broken + good, shard="s")
    ids = [r["doc_id"] for r in recs]
    assert "<urn:uuid:bad>" not in ids  # unframeable record dropped
    assert ids == ["<urn:uuid:ok>"]  # no phantom record from the decoy

    # non-numeric Content-Length: same skip behavior
    nonnum = (
        b"WARC/1.0\r\n"
        b"WARC-Type: resource\r\n"
        b"WARC-Record-ID: <urn:uuid:nn>\r\n"
        b"Content-Length: banana\r\n"
        b"\r\n" + payload + b"\r\n\r\n"
    )
    recs = parse_warc_bytes(nonnum + good, shard="s")
    assert [r["doc_id"] for r in recs] == ["<urn:uuid:ok>"]


def test_read_warc_to_boilerplate_strip(spark, tmp_path):
    from modern_document_converter_for_ai_library_spark.operators.boilerplate import (
        strip_boilerplate_html,
    )

    (tmp_path / "shard-000.warc").write_bytes(_shard_bytes())
    (tmp_path / "shard-001.warc.gz").write_bytes(
        gzip.compress(_record("r3", "https://example.com/c"))
    )
    docs = read_warc_documents(spark, str(tmp_path))
    rows = docs.collect()
    # warcinfo filtered out by default; 3 responses across both shards
    assert sorted(r["url"] for r in rows) == [
        "https://example.com/a",
        "https://example.com/b",
        "https://example.com/c",
    ]
    plan = docs._jdf.queryExecution().executedPlan().toString()
    assert plan.count("MapInPandas") == 1 and "BatchEvalPython" not in plan

    content = strip_boilerplate_html(docs).collect()
    assert len(content) == 3
    for r in content:
        assert "standard of review" in r["content_text"]
        assert "Home More" not in r["content_text"]


def test_fused_parse_strip_equals_composed(spark, tmp_path):
    """parse_and_strip_warc (one Arrow stage) must equal
    strip_boilerplate_html over read_warc_documents record-for-record."""
    from modern_document_converter_for_ai_library_spark.operators.boilerplate import (
        strip_boilerplate_html,
    )
    from modern_document_converter_for_ai_library_spark.sources.warc import (
        read_warc_content,
    )

    (tmp_path / "shard-000.warc").write_bytes(_shard_bytes())
    composed = strip_boilerplate_html(
        read_warc_documents(spark, str(tmp_path))
    )
    fused = read_warc_content(spark, str(tmp_path))
    key = lambda r: (r["doc_id"], r["content_text"], r["n_blocks"], r["n_content_blocks"])
    assert sorted(map(key, fused.collect())) == sorted(map(key, composed.collect()))
    # fused carries provenance the composed path loses
    assert all(r["shard"] == "shard-000.warc" for r in fused.collect())
