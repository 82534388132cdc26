"""Physical-plan audit for every driver-contract query.

Guards the scale constraints that correctness tests cannot see:

  - no row-at-a-time Python (``BatchEvalPython``) anywhere — the north
    rule's vectorization constraint (BASELINE.md);
  - no accidental cartesian product — the only nested-loop join allowed is
    the intentional 1-row broadcast crossJoin in q_ann_topk;
  - the documents/events/embeddings scans must be column-pruned: a query
    that only needs (doc_id, text) must not read lang/source/n_chars.
"""

import re

import pytest

from modern_document_converter_for_ai_library_spark.queries import SPARK_QUERIES

SF_DIR = "/root/testdata/sf0.001"

# q_ann_topk broadcasts a single query vector against the corpus and
# q_ivf_topk broadcasts the 16-centroid table for cell assignment: a
# BroadcastNestedLoopJoin over a tiny build side is the intended plan.
CARTESIAN_OK = {"q_ann_topk", "q_ivf_topk"}

# columns each query legitimately needs from the documents table; queries
# not listed here read other tables or the full row by design
_DOCS_NEEDED = {
    "q_token_stats": {"doc_id", "text"},
    "q_fingerprint": {"doc_id", "text"},
    "q_exact_dedup": {"doc_id", "text"},
    "q_minhash": {"doc_id", "text"},
    "q_line_ops": {"doc_id", "text"},
    "q_code_assign": {"doc_id"},
    "q_court_lookup": {"doc_id"},
    "q_source_stats": {"source", "n_chars", "doc_id"},
}


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.mark.parametrize("name", sorted(SPARK_QUERIES))
def test_no_row_python_and_no_cartesian(spark, name):
    plan = _plan(SPARK_QUERIES[name](spark, SF_DIR))
    assert "BatchEvalPython" not in plan, f"{name}: row-at-a-time Python UDF"
    if name not in CARTESIAN_OK:
        assert "CartesianProduct" not in plan, f"{name}: cartesian product"
        assert "BroadcastNestedLoopJoin" not in plan, f"{name}: nested-loop join"


@pytest.mark.parametrize("name", sorted(_DOCS_NEEDED))
def test_documents_scan_is_column_pruned(spark, name):
    plan = _plan(SPARK_QUERIES[name](spark, SF_DIR))
    scans = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    doc_scans = [s for s in scans if "text" in s or "doc_id" in s or "n_chars" in s]
    assert doc_scans, f"{name}: no parquet scan found in plan"
    for s in doc_scans:
        cols = {c.split(":")[0] for c in s.split(",") if c}
        assert cols <= _DOCS_NEEDED[name], (
            f"{name}: scan reads {cols}, needs only {_DOCS_NEEDED[name]}"
        )
