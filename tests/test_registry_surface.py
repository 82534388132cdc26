"""Registry read-surface parity (registrar.py:487-516, 639-676, 678-693):
list/order/limit, statistics, JSON export over the rename-output registry."""

import json
import os

import pytest

from modern_document_converter_for_ai_library_spark.operators.registry import (
    export_registry_json,
    list_documents,
    registry_statistics,
)
from modern_document_converter_for_ai_library_spark.operators.rename import (
    rename_documents,
)
from modern_document_converter_for_ai_library_spark.sources import (
    DOCS_SCHEMA,
    synth_documents_pandas,
)


@pytest.fixture(scope="module")
def registry(spark):
    corpus = spark.createDataFrame(
        synth_documents_pandas(120, seed=7), schema=DOCS_SCHEMA
    )
    return rename_documents(corpus, start_index=0).persist()


def test_list_documents_order_and_limit(spark, registry):
    rows = list_documents(registry, limit=10).collect()
    assert len(rows) == 10
    ids = [r["doc_id"] for r in rows]
    assert ids == sorted(ids, reverse=True)  # newest (highest doc_id) first


def test_list_documents_type_filter(spark, registry):
    rows = list_documents(registry, document_type="caselaw").collect()
    assert rows and all(r["document_type"] == "caselaw" for r in rows)


def test_registry_statistics(spark, registry):
    reg_rows = registry.collect()
    stats = {}
    for r in registry_statistics(registry).collect():
        stats[(r["metric"], r["key"])] = r["value"]

    n = len(reg_rows)
    assert stats[("total_documents", "")] == n
    by_type = {}
    for r in reg_rows:
        by_type[r["document_type"]] = by_type.get(r["document_type"], 0) + 1
    for t, c in by_type.items():
        assert stats[("by_type", t)] == c

    held = {r["unique_code"] for r in reg_rows if r["unique_code"]}
    discovered = {r["discovered_code"] for r in reg_rows if r["discovered_code"]}
    assert stats[("allocated_codes", "")] == len(held | discovered)
    assert stats[("code_status", "in_use")] == len(held)
    assert stats[("code_status", "allocated")] == len((held | discovered) - held)

    max_idx = max(
        (r["code_index"] for r in reg_rows if r["code_index"] is not None),
        default=-1,
    )
    assert stats[("next_code_index", "")] == max_idx + 1


def test_export_registry_json_roundtrip(spark, registry, tmp_path):
    out = str(tmp_path / "export")
    export_registry_json(registry, out, single_file=True)
    docs = []
    for part in os.listdir(os.path.join(out, "documents")):
        if part.endswith(".json"):
            with open(os.path.join(out, "documents", part)) as f:
                docs += [json.loads(ln) for ln in f if ln.strip()]
    assert len(docs) == registry.count()
    stats = []
    for part in os.listdir(os.path.join(out, "statistics")):
        if part.endswith(".json"):
            with open(os.path.join(out, "statistics", part)) as f:
                stats += [json.loads(ln) for ln in f if ln.strip()]
    assert {"metric", "key", "value"} <= set(stats[0])
    assert any(s["metric"] == "total_documents" for s in stats)
