"""Distributed code assignment + rename flow tests (C4 determinism,
discover-or-generate, atomic skip)."""

import pytest
from pyspark.sql import functions as F

from modern_document_converter_for_ai_library_spark.operators.codes import assign_codes
from modern_document_converter_for_ai_library_spark.operators.rename import (
    rename_documents,
)
from modern_document_converter_for_ai_library_spark.reference_semantics import (
    index_to_code,
)
from modern_document_converter_for_ai_library_spark.sources import (
    DOCS_SCHEMA,
    synth_documents_pandas,
)


@pytest.fixture(scope="module")
def corpus_df(spark):
    return spark.createDataFrame(synth_documents_pandas(150, seed=42), schema=DOCS_SCHEMA)


def test_assign_codes_matches_sequential_reference(spark):
    df = spark.range(0, 500).select(
        F.format_string("doc_%05d", F.col("id")).alias("doc_id")
    ).repartition(7)  # scramble placement on purpose
    out = assign_codes(df, order_col="doc_id", start_index=0, num_partitions=5)
    rows = {r["doc_id"]: (r["code_index"], r["unique_code"]) for r in out.collect()}
    for i in range(500):
        doc = f"doc_{i:05d}"
        assert rows[doc] == (i, index_to_code(i)), doc


def test_assign_codes_start_index_continuation(spark):
    df = spark.createDataFrame([("a",), ("b",), ("c",)], ["doc_id"])
    out = {
        r["doc_id"]: r["unique_code"]
        for r in assign_codes(df, start_index=249_025).collect()
    }
    assert out["a"] == index_to_code(249_025)
    assert out["c"] == index_to_code(249_027)


def test_assign_codes_deterministic_across_runs(spark):
    df = spark.range(0, 300).select(
        F.format_string("d%04d", (F.col("id") * 7919) % 300).alias("doc_id")
    )
    a = {r["doc_id"]: r["code_index"] for r in assign_codes(df, num_partitions=4).collect()}
    b = {r["doc_id"]: r["code_index"] for r in assign_codes(df, num_partitions=9).collect()}
    assert a == b  # partition count must not affect assignment


def test_rename_flow(spark, corpus_df):
    out = rename_documents(corpus_df, start_index=0).collect()
    by_id = {r["doc_id"]: r for r in out}
    assert len(by_id) == 150  # no docs lost across the three-way split

    # legacy codes preserved bit-for-bit — but codes are UNIQUE (the
    # registry's codes table is one row per code, registrar.py:96-101), so
    # when several files carry the same ----ABXCD suffix only the first
    # claimant (min doc_id, the reference's alphabetical order) keeps it;
    # the rest are treated like invalid codes and get fresh allocations
    legacy = sorted(
        (r for r in out if "----ABXCD" in r["source_file"]),
        key=lambda r: r["doc_id"],
    )
    assert legacy, "corpus should contain legacy-coded filenames"
    assert legacy[0]["unique_code"] == "ABXCD"
    for r in legacy[1:]:
        # losers either got a fresh allocation (renameable docs) or None
        # (failed rename: the file keeps its old name on disk, nothing to
        # link) — never the duplicate code
        assert r["unique_code"] != "ABXCD"
        if r["rename_success"]:
            assert r["unique_code"] is not None

    # invalid ----WWWWW codes are NOT preserved
    invalid = [r for r in out if "----WWWWW" in r["source_file"]]
    assert invalid
    for r in invalid:
        assert r["unique_code"] != "WWWWW"

    # successful renames carry the code inside the filename
    for r in out:
        if r["new_filename"] is not None:
            assert "----" + r["unique_code"] in r["new_filename"]
            assert r["new_filename"].startswith("c.")
        if not r["rename_success"] and r["discovered_code"] is None:
            assert r["unique_code"] is None  # atomic skip: no code burned


def test_rename_codes_dense_and_unique(spark, corpus_df):
    out = rename_documents(corpus_df, start_index=0).collect()
    fresh = sorted(
        r["code_index"] for r in out if r["code_index"] is not None
    )
    assert fresh == list(range(len(fresh)))  # dense 0..n-1
    codes = [r["unique_code"] for r in out if r["unique_code"] is not None]
    legacy = sum(1 for r in out if r["discovered_code"] is not None)
    assert len(codes) == len(fresh) + legacy
