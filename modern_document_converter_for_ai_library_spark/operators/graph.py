"""Link-graph operators: exact-integer PageRank, anchor rollup, degrees.

A web-scale curation pipeline keeps a link graph next to the document
corpus: in-link counts and PageRank feed quality scoring (the original
"use the web graph to rank what to crawl/keep" signal), and aggregated
anchor text is a classic weak-label source for training data. The
reference converter has no graph stage (it is a single-machine file
pipeline), so this family is part of the beyond-the-reference
training-data layer, same tier as dedup/mixing/DSIR.

Scale design (10^12 nodes / edges):

- Every structure is a slim 2-3 column BIGINT DataFrame; no adjacency
  lists are ever collected or broadcast.
- ``pagerank`` is the textbook synchronous iteration expressed as
  join + aggregate: each round shuffles the (node, rank) table once on
  ``src`` (join against the degree-annotated edge table, which is
  persisted and reused across rounds so its own shuffle happens once)
  and once on ``dst`` (the contribution sum). The contribution sum is
  an associative ``sum`` -> Spark's partial aggregation absorbs
  in-degree skew (a hub node's millions of in-edges partial-sum
  map-side; only one row per partition reaches the hot reducer), so no
  explicit salting is needed on the aggregate.
- Arithmetic is exact integer (micros, floor division) so results are
  bit-identical across engines, partitionings, and retries — the same
  cross-engine determinism rule the rest of the repo uses (no float
  sums whose value depends on reduction order).
- Iterations are FIXED (default 3), not convergence-tested: at corpus
  scale a rank signal for quality weighting needs stable relative
  ordering, not 1e-9 convergence, and a fixed plan keeps lineage
  bounded (cf. the fixpoint loop + checkpoint machinery that
  connected components in dedup.py needs).

Semantics (documented, deliberately simple variant):

- rank_0(v) = 1_000_000 (i.e. 1.0 in micros; total mass n * MICRO).
- share(s) = rank(s) div outdeg(s)  (integer floor division).
- rank_{i+1}(v) = (MICRO - d) + d * sum_in_shares(v) div MICRO, with
  d = damping_micros (default 850_000 = 0.85).
- Dangling-node mass is dropped, not redistributed (the common
  simplification; redistribution would add a driver-side scalar per
  round). Isolated nodes therefore converge to MICRO - d + d = base.

Overflow: shares are bounded by the incoming ranks (~MICRO scale), and
d * contrib stays far below int64 for any in-degree the partial
aggregation can produce per node (contrib <= n * MICRO would need a
node receiving the entire corpus mass; at 10^12 nodes that still fits:
1e12 * 1e6 * 85e4 overflows — callers at that extreme should lower the
rank scale; the operator documents rather than hides this bound).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.caching import CacheScope, scoped_persist

MICRO = 1_000_000


def out_degrees(edges: DataFrame) -> DataFrame:
    """Out-degree per source node: (src, outdeg). One shuffle on src."""
    return edges.groupBy("src").agg(F.count("*").cast("bigint").alias("outdeg"))


def degree_stats(edges: DataFrame) -> DataFrame:
    """Per-node (node, outdeg, indeg, n_reciprocal).

    ``n_reciprocal`` counts this node's out-edges whose reverse edge also
    exists — a crawl-quality signal (link farms are reciprocal-heavy).
    Plan: two degree aggregates plus one self-equi-join of the edge set
    on the reversed key — all hash-partitioned on node ids, no windows,
    no broadcast of anything data-scale.
    """
    out_d = edges.groupBy("src").agg(F.count("*").cast("bigint").alias("outdeg"))
    in_d = edges.groupBy("dst").agg(F.count("*").cast("bigint").alias("indeg"))
    rev = edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    recip = (
        edges.join(rev, ["src", "dst"], "left_semi")
        .groupBy("src")
        .agg(F.count("*").cast("bigint").alias("n_reciprocal"))
    )
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    return (
        nodes.join(out_d.withColumnRenamed("src", "node"), "node", "left")
        .join(in_d.withColumnRenamed("dst", "node"), "node", "left")
        .join(recip.withColumnRenamed("src", "node"), "node", "left")
        .select(
            "node",
            F.coalesce("outdeg", F.lit(0)).cast("bigint").alias("outdeg"),
            F.coalesce("indeg", F.lit(0)).cast("bigint").alias("indeg"),
            F.coalesce("n_reciprocal", F.lit(0)).cast("bigint").alias("n_reciprocal"),
        )
    )


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    n_iter: int = 3,
    damping_micros: int = 850_000,
    cache_scope: CacheScope | None = None,
) -> DataFrame:
    """Fixed-iteration exact-integer PageRank.

    ``nodes``: one column ``node`` (bigint) — the full node universe, so
    nodes with no in-edges keep their base rank and dangling nodes are
    ranked. ``edges``: (src, dst), assumed deduplicated and self-loop
    free (callers: ``.distinct()`` + ``src <> dst``).

    Returns (node, rank_micros). The degree-annotated edge table AND the
    node universe are persisted (registered with ``cache_scope`` when
    given, GC-managed otherwise): every iteration re-joins both, and when
    ``nodes`` is itself derived (a distinct over edge endpoints) the
    n_iter+1 references would otherwise recompute that shuffle each time.
    A recompute on eviction is deterministic — integer
    arithmetic, no sampling — so it costs time, never correctness.
    """
    if not 0 <= damping_micros <= MICRO:
        raise ValueError("damping_micros must be within [0, 1e6]")
    base = MICRO - damping_micros
    ed = scoped_persist(edges.join(out_degrees(edges), "src"), cache_scope)
    nodes = scoped_persist(nodes, cache_scope)
    ranks = nodes.select("node", F.lit(MICRO).cast("bigint").alias("rank_micros"))
    for _ in range(n_iter):
        contrib = (
            ed.join(ranks.withColumnRenamed("node", "src"), "src")
            .select("dst", F.expr("rank_micros div outdeg").alias("share"))
            .groupBy("dst")
            .agg(F.sum("share").cast("bigint").alias("contrib"))
        )
        ranks = (
            nodes.join(contrib.withColumnRenamed("dst", "node"), "node", "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.expr(
                        f"({damping_micros} * coalesce(contrib, 0)) div {MICRO}"
                    )
                )
                .cast("bigint")
                .alias("rank_micros"),
            )
        )
    return ranks


def anchor_rollup(edges_with_anchor: DataFrame) -> DataFrame:
    """Aggregate anchor text per link target.

    Input: (src, dst, anchor). Output per target:
    (dst, n_inlinks, n_anchors, top_anchor, top_anchor_count) where
    ``top_anchor`` is the most frequent anchor string, ties broken by
    the lexicographically GREATEST anchor (max-struct semantics — a
    deterministic rule both engines can state exactly).

    Plan: one (dst, anchor) count aggregate, then one per-dst aggregate
    taking ``max(struct(count, anchor))`` — the argmax-without-a-sort
    pattern (same as IVF's min_by assignment). No windows: a hot target
    (every page links to the home page) partial-aggregates map-side in
    both phases.

    Edges with a NULL anchor are dropped up front (real link data has
    missing anchor text routinely; a NULL group would inflate n_anchors
    and could win top_anchor, a useless weak label).
    """
    per_anchor = (
        edges_with_anchor.filter(F.col("anchor").isNotNull())
        .groupBy("dst", "anchor")
        .agg(F.count("*").cast("bigint").alias("cnt"))
    )
    return (
        per_anchor.groupBy("dst")
        .agg(
            F.sum("cnt").cast("bigint").alias("n_inlinks"),
            F.count("*").cast("bigint").alias("n_anchors"),
            F.max(F.struct("cnt", "anchor")).alias("_top"),
        )
        .select(
            "dst",
            "n_inlinks",
            "n_anchors",
            F.col("_top.anchor").alias("top_anchor"),
            F.col("_top.cnt").alias("top_anchor_count"),
        )
    )
