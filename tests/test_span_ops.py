"""Unit tests for the interleaved-span structural operators
(operators/span_ops.py): reflow run-merging, caption pairing branches,
media dedup, and the reassemble round-trip — on crafted span arrays that
hit every boundary case (media-first, adjacent media, trailing media,
text-only, single-media docs)."""

from pyspark.sql import functions as F

from modern_document_converter_for_ai_library_spark.operators.span_ops import (
    caption_pairs,
    explode_spans,
    media_dedup,
    reassemble_spans,
    reflow_spans,
)
from modern_document_converter_for_ai_library_spark.sources.synth import SPANS_SCHEMA


def _t(text, off):
    return ("text", text, "", off)


def _m(ref, off):
    return ("image", "", ref, off)


def _spans_df(spark, docs):
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField("spans", SPANS_SCHEMA),
        ]
    )
    return spark.createDataFrame(list(docs.items()), schema)


DOCS = {
    # two-run doc: text,text | media | text | media,media (adjacent)
    "a": [_t("a0", 0), _t("a1", 1), _m("m://a/1", 1), _t("a2", 2),
          _m("m://a/2", 2), _m("m://a/3", 3)],
    # media-only doc
    "b": [_m("m://b/0", 0)],
    # media-first then text
    "c": [_m("m://c/0", 0), _t("c0", 0)],
    # text-only doc
    "d": [_t("d0", 0), _t("d1", 1)],
}


def test_reflow_merges_adjacent_text_runs(spark):
    out = reflow_spans(_spans_df(spark, DOCS))
    rows = {
        (r["doc_id"], r["offset"]): (r["kind"], r["text"], r["media_ref"], r["n_merged"])
        for r in out.collect()
    }
    assert rows[("a", 0)] == ("text", "a0\na1", "", 2)
    assert rows[("a", 1)] == ("image", "", "m://a/1", 1)
    assert rows[("a", 2)] == ("text", "a2", "", 1)
    assert rows[("a", 3)] == ("image", "", "m://a/2", 1)
    assert rows[("a", 4)] == ("image", "", "m://a/3", 1)
    assert rows[("b", 0)] == ("image", "", "m://b/0", 1)
    assert rows[("c", 0)] == ("image", "", "m://c/0", 1)
    assert rows[("c", 1)] == ("text", "c0", "", 1)
    assert rows[("d", 0)] == ("text", "d0\nd1", "", 2)
    assert len(rows) == 9


def test_reassemble_round_trip(spark):
    flat = reflow_spans(_spans_df(spark, DOCS))
    nested = reassemble_spans(flat)
    got = {r["doc_id"]: [tuple(s) for s in r["spans"]] for r in nested.collect()}
    assert got["a"] == [
        ("text", "a0\na1", "", 0),
        ("image", "", "m://a/1", 1),
        ("text", "a2", "", 2),
        ("image", "", "m://a/2", 3),
        ("image", "", "m://a/3", 4),
    ]
    assert got["d"] == [("text", "d0\nd1", "", 0)]
    # idempotence: reflowing an already-reflowed doc is a no-op on the
    # span content (n_merged is per-pass metadata — 1 on the second pass)
    span_cols = ["doc_id", "offset", "kind", "text", "media_ref"]
    again = reflow_spans(reassemble_spans(reflow_spans(nested))).select(*span_cols)
    assert sorted(map(tuple, again.collect())) == sorted(
        map(tuple, flat.select(*span_cols).collect())
    )


def test_caption_pairs_branches(spark):
    out = caption_pairs(_spans_df(spark, DOCS))
    got = {r["media_ref"]: (r["caption"], r["caption_src"]) for r in out.collect()}
    assert got == {
        "m://a/1": ("a2", "after"),      # following text span wins
        "m://a/2": ("a2", "before"),     # next is media -> preceding text
        "m://a/3": ("", "none"),         # boxed in by media / end of doc
        "m://b/0": ("", "none"),         # media-only doc
        "m://c/0": ("c0", "after"),      # media-first doc captions forward
    }


def test_media_dedup_catalog(spark):
    media = spark.createDataFrame(
        [
            ("d1", "m://d1/0", "k1"),
            ("d1", "m://d1/4", "k1"),  # same asset twice in one doc
            ("d2", "m://d2/0", "k1"),  # and in another doc
            ("d2", "m://d2/4", "k2"),
        ],
        ["doc_id", "media_ref", "content_key"],
    )
    got = {
        r["content_key"]: (r["canonical_ref"], r["n_refs"], r["n_docs"])
        for r in media_dedup(media).collect()
    }
    assert got == {"k1": ("m://d1/0", 3, 2), "k2": ("m://d2/4", 1, 1)}


def test_explode_spans_positions(spark):
    ex = explode_spans(_spans_df(spark, {"a": DOCS["a"]}))
    rows = sorted((r["pos"], r["kind"]) for r in ex.collect())
    assert rows == [
        (0, "text"), (1, "text"), (2, "image"),
        (3, "text"), (4, "image"), (5, "image"),
    ]


def test_reflow_plan_windows_are_partitioned(spark):
    plan = reflow_spans(_spans_df(spark, DOCS))._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "PythonUDF" not in plan
