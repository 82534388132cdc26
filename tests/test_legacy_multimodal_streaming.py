"""Legacy-clean operator, multimodal plumbing, and the streaming variant."""

import hashlib

import pytest

from modern_document_converter_for_ai_library_spark.operators.legacy_clean import (
    clean_doc_lines,
    legacy_clean_documents,
)
from modern_document_converter_for_ai_library_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    decode_media,
    media_features_join,
)
from modern_document_converter_for_ai_library_spark.sources import (
    DOCS_SCHEMA,
    synth_documents_pandas,
)
from modern_document_converter_for_ai_library_spark.streaming import convert_stream


# ---------------------------------------------------------------------------
# legacy clean
# ---------------------------------------------------------------------------

LEGACY_TEXT = "\n".join(
    ["SUPREME COURT REPORTS"] * 3
    + ["", "INTRODUCTION", "", "The defend-", "ant argued the case", "17", "xiv"]
)


def test_legacy_clean_matches_kernel(spark):
    df = spark.createDataFrame([("d1", LEGACY_TEXT)], ["doc_id", "text"])
    out = legacy_clean_documents(df).collect()[0]
    golden_paras, n_headers = clean_doc_lines(LEGACY_TEXT.split("\n"))
    assert out["cleaned_text"] == "\n".join(golden_paras)
    assert out["n_running_headers"] == 1
    assert "SUPREME COURT REPORTS" not in out["cleaned_text"]
    assert "The defendant argued the case" in out["cleaned_text"]
    assert "# INTRODUCTION" in out["cleaned_text"]


# ---------------------------------------------------------------------------
# multimodal plumbing
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def media_df(spark):
    rows = [
        ("d1", "media://d1/0", "image", b"\x89PNG fake bytes 0"),
        ("d1", "media://d1/1", "video", b"\x00\x00ftyp fake bytes"),
        ("d2", "media://d2/0", "image", b""),
    ]
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)


def test_fake_decode_deterministic(spark, media_df):
    out = {r["media_ref"]: r for r in decode_media(media_df, decoder="fake").collect()}
    r = out["media://d1/0"]
    expected_hash = hashlib.md5(b"\x89PNG fake bytes 0").hexdigest()
    assert r["content_hash"] == expected_hash
    assert r["decode_ok"] and len(r["features"]) == 8
    assert out["media://d1/1"]["n_frames"] > 1  # video gets frames
    assert out["media://d2/0"]["n_bytes"] == 0
    # rerun -> identical features (determinism)
    again = {r["media_ref"]: r for r in decode_media(media_df, decoder="fake").collect()}
    assert again["media://d1/0"]["features"] == r["features"]


def test_real_decoder_is_marked_stub(spark, media_df):
    with pytest.raises(Exception) as exc_info:
        decode_media(media_df, decoder="pillow").collect()
    assert "STUB" in str(exc_info.value)


def test_media_features_join(spark, media_df):
    docs = spark.createDataFrame([("d1",), ("d2",), ("d3",)], ["doc_id"])
    decoded = decode_media(media_df, decoder="fake")
    out = {r["doc_id"]: r for r in media_features_join(docs, decoded).collect()}
    assert out["d1"]["n_media"] == 2
    assert out["d2"]["n_media"] == 1
    assert out["d3"]["n_media"] is None  # doc without media


def test_resize_media_plumbing(spark, media_df):
    from modern_document_converter_for_ai_library_spark.operators.multimodal import (
        resize_media,
    )

    out = {r["media_ref"]: r for r in resize_media(media_df, 32, 24).collect()}
    assert len(out) == 3
    for r in out.values():
        assert r["resize_ok"] and (r["width"], r["height"]) == (32, 24)
        assert len(bytes(r["content"])) == 32 * 24  # target-area sized blob
    # deterministic across partitionings
    again = {
        r["media_ref"]: bytes(r["content"])
        for r in resize_media(media_df.repartition(3), 32, 24).collect()
    }
    assert {k: bytes(v["content"]) for k, v in out.items()} == again
    plan = resize_media(media_df, 32, 24)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("MapInPandas") == 1 and "BatchEvalPython" not in plan


def test_sample_frames_plumbing(spark, media_df):
    from modern_document_converter_for_ai_library_spark.operators.multimodal import (
        decode_media,
        sample_frames,
    )

    n_frames = {
        r["media_ref"]: r["n_frames"]
        for r in decode_media(media_df, decoder="fake").collect()
    }
    out = sample_frames(media_df, every_n=3).collect()
    # only the video row explodes into frames
    assert {r["media_ref"] for r in out} == {"media://d1/1"}
    expected = len(range(0, n_frames["media://d1/1"], 3))
    assert len(out) == expected
    frames = sorted(out, key=lambda r: r["frame_no"])
    assert [r["frame_no"] for r in frames] == list(
        range(0, n_frames["media://d1/1"], 3)
    )
    # fake timeline: 10 fps
    assert frames[1]["ts_micros"] == 3 * 100_000
    # cap respected
    capped = sample_frames(media_df, every_n=1, max_frames=4).collect()
    assert len(capped) == min(4, n_frames["media://d1/1"])


def test_resize_and_frames_real_decoder_marked_stub(spark, media_df):
    from modern_document_converter_for_ai_library_spark.operators.multimodal import (
        resize_media,
        sample_frames,
    )

    with pytest.raises(NotImplementedError, match="STUB"):
        resize_media(media_df, 8, 8, decoder="pillow")
    with pytest.raises(NotImplementedError, match="STUB"):
        sample_frames(media_df, decoder="ffmpeg")


# ---------------------------------------------------------------------------
# streaming variant
# ---------------------------------------------------------------------------

def test_streaming_convert_matches_batch(spark, tmp_path):
    from modern_document_converter_for_ai_library_spark.operators import (
        convert_documents,
    )

    pdf = synth_documents_pandas(40, seed=5)
    inp = str(tmp_path / "stream_in")
    outp = str(tmp_path / "stream_out")
    ckpt = str(tmp_path / "ckpt")
    df = spark.createDataFrame(pdf, schema=DOCS_SCHEMA)
    df.write.mode("overwrite").parquet(inp)

    q = convert_stream(spark, inp, outp, ckpt, available_now=True)
    q.awaitTermination(120)

    got = {
        r["doc_id"]: [(s["kind"], s["text"], s["media_ref"]) for s in r["spans"]]
        for r in spark.read.parquet(outp).collect()
    }
    want = {
        r["doc_id"]: [(s["kind"], s["text"], s["media_ref"]) for s in r["spans"]]
        for r in convert_documents(df).collect()
    }
    assert got == want

    # restart with no new files -> no duplicates (checkpointed offsets)
    q2 = convert_stream(spark, inp, outp, ckpt, available_now=True)
    q2.awaitTermination(120)
    assert spark.read.parquet(outp).count() == len(want)
