"""Link-graph operators (operators/graph.py): exact-integer PageRank,
degree/reciprocity stats, anchor rollup.

PageRank values are checked against a hand-computed tiny graph (the exact
integer recurrence is simple enough to evaluate on paper), plus the
structural invariants the oracle cannot see: determinism across repeated
materializations (recompute safety) and cache-scope ownership of the
persisted degree-annotated edge table.
"""

import pytest
from pyspark.sql import functions as F

from modern_document_converter_for_ai_library_spark.operators.graph import (
    MICRO,
    anchor_rollup,
    degree_stats,
    pagerank,
)
from modern_document_converter_for_ai_library_spark.plans.caching import CacheScope


def _graph(spark, edges, nodes=None):
    e = spark.createDataFrame(edges, "src: bigint, dst: bigint")
    if nodes is None:
        nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    n = spark.createDataFrame([(x,) for x in nodes], "node: bigint")
    return n, e


def test_pagerank_hand_computed_triangle_plus_dangler(spark):
    # 0 -> 1, 1 -> 2, 2 -> 0 (a 3-cycle) and 0 -> 3 (3 is dangling).
    # outdeg: 0 -> 2, 1 -> 1, 2 -> 1; node 3 has none.
    nodes, edges = _graph(spark, [(0, 1), (1, 2), (2, 0), (0, 3)])
    got = {
        r["node"]: r["rank_micros"]
        for r in pagerank(nodes, edges, n_iter=1, damping_micros=850_000).collect()
    }
    # round 1 from r=1_000_000 everywhere, base=150_000, d=850_000:
    #   share(0)=500_000, share(1)=1_000_000, share(2)=1_000_000
    #   r(0)=150000+850000*1000000//1e6=1_000_000   (from 2)
    #   r(1)=150000+850000*500000//1e6 = 575_000    (from 0)
    #   r(2)=150000+850000*1000000//1e6=1_000_000   (from 1)
    #   r(3)=575_000 (from 0's half share); dangling mass just drops
    assert got == {0: 1_000_000, 1: 575_000, 2: 1_000_000, 3: 575_000}


def test_pagerank_second_round_uses_updated_ranks(spark):
    nodes, edges = _graph(spark, [(0, 1), (1, 2), (2, 0), (0, 3)])
    got = {
        r["node"]: r["rank_micros"]
        for r in pagerank(nodes, edges, n_iter=2, damping_micros=850_000).collect()
    }
    # round 2 from (1_000_000, 575_000, 1_000_000, 575_000):
    #   r(0) <- 2's full rank:   150000 + 850000*1000000//1e6 = 1_000_000
    #   r(1) <- 0's half:        150000 + 850000*500000//1e6  =   575_000
    #   r(2) <- 1's full 575000: 150000 + 850000*575000//1e6  =   638_750
    #   r(3) <- 0's half       =   575_000
    assert got == {0: 1_000_000, 1: 575_000, 2: 638_750, 3: 575_000}


def test_pagerank_isolated_node_and_zero_damping(spark):
    # damping 0 => every node pins to base = MICRO regardless of edges.
    nodes, edges = _graph(spark, [(0, 1)], nodes=[0, 1, 7])
    got = {
        r["node"]: r["rank_micros"]
        for r in pagerank(nodes, edges, n_iter=3, damping_micros=0).collect()
    }
    assert got == {0: MICRO, 1: MICRO, 7: MICRO}


def test_pagerank_rejects_bad_damping(spark):
    nodes, edges = _graph(spark, [(0, 1)])
    with pytest.raises(ValueError):
        pagerank(nodes, edges, damping_micros=MICRO + 1)


def test_pagerank_deterministic_across_materializations(spark):
    # The persisted edge table may be evicted and recomputed; integer
    # arithmetic guarantees two materializations agree row-for-row.
    edges = [(i, (i * 7 + 1) % 50) for i in range(50) if i != (i * 7 + 1) % 50]
    nodes, e = _graph(spark, edges, nodes=list(range(50)))
    out = pagerank(nodes, e, n_iter=3)
    first = sorted(map(tuple, out.collect()))
    out.unpersist()  # no-op on the frame; exercises re-run below
    second = sorted(map(tuple, out.collect()))
    assert first == second


def _cached_rdd_ids(spark):
    return set(spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray())


def _settled_ids(spark, before, want_leaked, timeout=20.0):
    """Poll until async unpersists settle (same rationale as
    test_cache_hygiene.py — kept inline because cross-test-module imports
    break under pytest's default import mode without a tests package)."""
    import time

    deadline = time.monotonic() + timeout
    leaked = _cached_rdd_ids(spark) - before
    while len(leaked) != want_leaked and time.monotonic() < deadline:
        time.sleep(0.2)
        leaked = _cached_rdd_ids(spark) - before
    return leaked


def test_pagerank_cache_scope_releases(spark):
    before = _cached_rdd_ids(spark)
    nodes, edges = _graph(spark, [(0, 1), (1, 0), (1, 2)])
    with CacheScope() as scope:
        ranks = pagerank(nodes, edges, n_iter=2, cache_scope=scope)
        # collect(), not count(): a bare count lets Catalyst ELIMINATE the
        # left join onto the contribution aggregate (aggregate keys are
        # unique, no right-side columns referenced), pruning the cached
        # edge subtree out of the plan entirely — the cache is then never
        # built. A values materialization exercises the real plan.
        assert len(ranks.collect()) == 3
        assert _cached_rdd_ids(spark) - before  # edge table cached in-scope
    assert _settled_ids(spark, before, want_leaked=0) == set()


def test_degree_stats_counts_and_reciprocity(spark):
    # 0<->1 reciprocal; 0->2 and 2->1 one-way.
    _, edges = _graph(spark, [(0, 1), (1, 0), (0, 2), (2, 1)])
    got = {
        r["node"]: (r["outdeg"], r["indeg"], r["n_reciprocal"])
        for r in degree_stats(edges).collect()
    }
    assert got == {0: (2, 1, 1), 1: (1, 2, 1), 2: (1, 1, 0)}


def test_anchor_rollup_counts_and_tiebreak(spark):
    rows = [
        (1, 9, "alpha"),
        (2, 9, "alpha"),
        (3, 9, "beta"),
        (4, 9, "beta"),  # tie at 2-2 -> lexicographically greatest wins
        (5, 8, "solo"),
    ]
    ea = spark.createDataFrame(rows, "src: bigint, dst: bigint, anchor: string")
    got = {r["dst"]: r.asDict() for r in anchor_rollup(ea).collect()}
    assert got[9]["n_inlinks"] == 4
    assert got[9]["n_anchors"] == 2
    assert got[9]["top_anchor"] == "beta"
    assert got[9]["top_anchor_count"] == 2
    assert got[8]["top_anchor"] == "solo"
    assert got[8]["n_inlinks"] == 1


def test_anchor_rollup_higher_count_beats_lexicographic(spark):
    rows = [(1, 9, "zzz"), (2, 9, "aaa"), (3, 9, "aaa")]
    ea = spark.createDataFrame(rows, "src: bigint, dst: bigint, anchor: string")
    (row,) = anchor_rollup(ea).collect()
    assert row["top_anchor"] == "aaa"
    assert row["top_anchor_count"] == 2
