"""Deterministic global training-order shuffle
(operators/sampling.py:corpus_shuffle): exact 0-based rank in the seeded
(hash_micros, id) permutation via the two-phase bucketed form — python
twin, permutation validity, partitioning invariance, salt independence,
and the no-global-window plan shape."""

import hashlib

import pytest
from pyspark.sql import functions as F

from modern_document_converter_for_ai_library_spark.operators.sampling import (
    corpus_shuffle,
)

N = 500


def _hm(doc_id, salt=""):
    h = hashlib.md5((str(doc_id) + salt).encode()).hexdigest()
    return int(h[:8], 16) % 1_000_000


def _expected_ranks(ids, salt=""):
    order = sorted(ids, key=lambda i: (_hm(i, salt), i))
    return {i: r for r, i in enumerate(order)}


@pytest.fixture(scope="module")
def docs(spark):
    return spark.range(N).select(F.col("id").alias("doc_id"))


def test_matches_python_twin(spark, docs):
    got = {
        r["doc_id"]: r["shuffle_rank"]
        for r in corpus_shuffle(docs, salt="s1").collect()
    }
    assert got == _expected_ranks(range(N), "s1")


def test_is_a_permutation(spark, docs):
    ranks = [r["shuffle_rank"] for r in corpus_shuffle(docs).collect()]
    assert sorted(ranks) == list(range(N))


def test_partitioning_invariance(spark, docs):
    a = {
        r["doc_id"]: r["shuffle_rank"]
        for r in corpus_shuffle(docs.repartition(7), salt="x").collect()
    }
    b = {
        r["doc_id"]: r["shuffle_rank"]
        for r in corpus_shuffle(docs.repartition(2), salt="x").collect()
    }
    assert a == b


def test_bucket_count_does_not_change_permutation(spark, docs):
    a = {
        r["doc_id"]: r["shuffle_rank"]
        for r in corpus_shuffle(docs, salt="x", n_buckets=8).collect()
    }
    b = {
        r["doc_id"]: r["shuffle_rank"]
        for r in corpus_shuffle(docs, salt="x", n_buckets=512).collect()
    }
    assert a == b


def test_salt_changes_permutation(spark, docs):
    a = [r["shuffle_rank"] for r in corpus_shuffle(docs, salt="a").orderBy("doc_id").collect()]
    b = [r["shuffle_rank"] for r in corpus_shuffle(docs, salt="b").orderBy("doc_id").collect()]
    assert a != b  # both are permutations of 0..N-1, but different ones


def test_invalid_buckets_raise(spark, docs):
    with pytest.raises(ValueError, match="n_buckets"):
        corpus_shuffle(docs, n_buckets=0)


def test_plan_has_no_corpus_wide_window(spark, docs):
    # the ONLY unpartitioned window is the bucket-offset prefix sum over
    # the bounded per-bucket aggregate (<= n_buckets rows); the
    # corpus-side rank window is partitioned by bucket and no Python
    # appears anywhere
    from test_plan_audit import _unpartitioned_windows

    out = corpus_shuffle(docs)
    phys = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in phys
    bad = _unpartitioned_windows(out)
    assert len(bad) == 1  # exactly the bounded offsets window
    assert "_bucket" in bad[0] and "_n" in bad[0].replace("#", " ")
