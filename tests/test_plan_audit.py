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
# q_ivf_topk / q_semantic_dedup broadcast the 16-centroid table for cell
# assignment: a BroadcastNestedLoopJoin over a tiny build side is the
# intended plan.
# q_temperature_mix cross-joins the single-row weight-total aggregate onto
# the bounded per-source frame: a 1-row build side is the intended plan.
CARTESIAN_OK = {
    "q_ann_topk",
    "q_ivf_topk",
    "q_semantic_dedup",
    "q_temperature_mix",
    # composes temperature_sample, whose 1-row w_total total joins the
    # bounded per-source weight table — the same tiny cross as above
    "q_training_layout",
    # the IVF coarse-probe tier broadcasts the 16-centroid table against
    # the 1-row query — the intended tiny-build-side plan
    "q_ivfpq_topk",
}

# columns each query legitimately needs from the documents table; queries
# not listed here read other tables or the full row by design
_DOCS_NEEDED = {
    "q_token_stats": {"doc_id", "text"},
    "q_fingerprint": {"doc_id", "text"},
    "q_exact_dedup": {"doc_id", "text"},
    "q_minhash": {"doc_id", "text"},
    "q_line_ops": {"doc_id", "text"},
    "q_code_assign": {"doc_id"},
    "q_corpus_shuffle": {"doc_id"},
    "q_training_layout": {"doc_id", "source"},
    "q_court_lookup": {"doc_id"},
    "q_source_stats": {"source", "n_chars", "doc_id"},
    "q_boilerplate": {"doc_id", "text"},
    "q_boilerplate_density": {"doc_id", "text"},
    "q_langid_ngram": {"doc_id", "text"},
    "q_simhash_pairs": {"doc_id", "text"},
    "q_near_dedup_chain": {"doc_id"},
    "q_bloom_dedup": {"doc_id", "text"},
    "q_line_dedup": {"doc_id", "text"},
    "q_blocklist": {"doc_id", "text"},
    "q_unigram_seed": {"text"},
    "q_pagerank": {"doc_id"},
    "q_link_degrees": {"doc_id"},
    "q_anchor_text": {"doc_id", "text"},
    "q_snapshot_diff": {"doc_id", "text", "lang"},
    # q_perceptron / q_kcenter return bounded driver-side tables (the
    # training/selection plans run inside the builder), so no scan is
    # visible in the returned frame; the generic audits still apply.
}


_WINDOW_OK = {
    # ivf_build ranks its <=16-row post-limit centroid seed with a global
    # row_number: a bounded-input window, not a corpus-wide reducer.
    "q_ivf_topk",
    "q_semantic_dedup",
    "q_ivfpq_topk",
    # corpus_shuffle's bucket-offset prefix sum runs over <= n_buckets
    # aggregated rows (same bounded-input class); the corpus-side rank
    # window is partitioned by bucket.
    "q_corpus_shuffle",
    "q_training_layout",
    # shuffled_shard_assign shares the same decomposition: one <=
    # n_buckets-row offsets window (now carrying both the count and the
    # token prefix sums); rank + cumsum windows are bucket-partitioned.
    "q_shuffled_shards",
    "q_shuffled_shard_manifest",
}


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _unpartitioned_windows(df) -> list[str]:
    """Window nodes in the optimized logical plan with an EMPTY partition
    spec — the 'Moving all data to a single partition' scale killer."""
    bad = []
    stack = [df._jdf.queryExecution().optimizedPlan()]
    while stack:
        node = stack.pop()
        if (
            node.getClass().getSimpleName() == "Window"
            and node.partitionSpec().isEmpty()
        ):
            bad.append(node.simpleString(120))
        children = node.children()
        for i in range(children.size()):
            stack.append(children.apply(i))
        # subquery plans (innerChildren) are not reachable via children()
        inner = node.innerChildren()
        for i in range(inner.size()):
            stack.append(inner.apply(i))
    return bad


@pytest.mark.parametrize("name", sorted(SPARK_QUERIES))
def test_no_row_python_and_no_cartesian(spark, name):
    df = SPARK_QUERIES[name](spark, SF_DIR)
    plan = _plan(df)
    assert "BatchEvalPython" not in plan, f"{name}: row-at-a-time Python UDF"
    if name not in CARTESIAN_OK:
        assert "CartesianProduct" not in plan, f"{name}: cartesian product"
        assert "BroadcastNestedLoopJoin" not in plan, f"{name}: nested-loop join"
    if name not in _WINDOW_OK:
        bad = _unpartitioned_windows(df)
        assert not bad, f"{name}: unpartitioned window(s): {bad}"


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
