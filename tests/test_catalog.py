"""Iceberg-or-parquet table adapter: path fallback round-trip, identifier
detection, runtime gating, and snapshot lineage markers."""

import pytest

from modern_document_converter_for_ai_library_spark.sources.catalog import (
    current_snapshot_id,
    iceberg_available,
    is_table_identifier,
    read_documents,
    write_documents,
)


def test_identifier_detection():
    assert is_table_identifier("lake.docs.documents")
    assert is_table_identifier("db.tbl")
    assert not is_table_identifier("/data/docs.parquet")
    assert not is_table_identifier("relative/dir")
    assert not is_table_identifier("plainname")


def test_parquet_roundtrip_and_snapshot(spark, tmp_path):
    target = str(tmp_path / "docs")
    df = spark.range(0, 10).selectExpr("cast(id as string) as doc_id")
    write_documents(df, target, mode="overwrite")
    back = read_documents(spark, target)
    assert back.count() == 10

    snap1 = current_snapshot_id(spark, target)
    assert snap1.startswith("dir:")
    # appending changes the snapshot marker; re-reading sees both writes
    write_documents(df, target, mode="append")
    assert read_documents(spark, target).count() == 20
    assert current_snapshot_id(spark, target) != snap1


def test_iceberg_target_gated_without_runtime(spark, tmp_path):
    df = spark.range(0, 3).selectExpr("cast(id as string) as doc_id")
    if iceberg_available(spark):  # pragma: no cover - not in this sandbox
        pytest.skip("iceberg runtime present; gating path not applicable")
    with pytest.raises(RuntimeError, match="Iceberg"):
        write_documents(df, "lake.db.documents")
    with pytest.raises(RuntimeError, match="Iceberg"):
        read_documents(spark, "lake.db.documents")
