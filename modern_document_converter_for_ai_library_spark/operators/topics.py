"""Integer-exact k-means topic clustering over hashed TF-IDF vectors.

The cluster-based curation loop (SemDeDup-style clustering, DoReMi-style
domain reweighting) needs the corpus partitioned into topical groups so a
mix policy can upsample/downsample per group. ``operators/semdedup.py``
runs that loop over a provided embedding column; this operator closes the
no-encoder gap by clustering the MODEL-FREE hashed TF-IDF vectors
(``operators/vectorize.py``) — fresh text in, topic cells out, no
external model anywhere. No reference-repo counterpart (the reference has
no vector or clustering pipeline); this is part of the LLM-training-data
surface the Spark rebuild adds on top.

100 TB plan shape — the corpus is NEVER shuffled:

- The TF-IDF stage is map-only + one bounded dim-row reduce
  (vectorize.py docstring).
- Seeds and all refined centroids are DRIVER-side values (K x dim
  bigints, bounded by construction), so nearest-centroid assignment
  re-enters the plan as LITERAL arrays: per row, K zip_with/aggregate
  folds + array_position — pure codegen, ZERO Exchange. This is strictly
  narrower than the broadcast-crossJoin + min_by shape ``similarity.py``
  uses (there the centroids are a runtime DataFrame; here each Lloyd
  round has already collected them).
- Per Lloyd round the only shuffle is the centroid update: posexplode to
  (cell, pos, val) partial-aggregates map-side down to K x dim rows.
- Centroid means are exact bigint floor-divisions — associative integer
  sums, so cells are bit-identical across engines and partitionings
  (the determinism contract every oracle in this repo leans on;
  float summation order would make cell boundaries nondeterministic).

The TF-IDF vector frame is consumed by every round plus the final
assignment, so it is persisted; pass ``cache_scope`` (plans/caching.py)
to own the lifetime, else the persist is GC-managed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.caching import CacheScope
from .vectorize import tfidf_vectors

# component clamp: keeps every unrolled squared-distance term inside
# int64 under ANSI mode no matter how degenerate a document is (see
# topic_clusters docstring)
WEIGHT_CAP = 1 << 24


def _lit_vec(vec: list[int]):
    return F.array(*[F.lit(int(w)).cast("bigint") for w in vec])


def _sqdist_sql(vec_col: str, c: list[int]) -> str:
    """Squared distance against ONE literal centroid, UNROLLED into plain
    SQL arithmetic: higher-order folds are interpreted row-at-a-time, the
    unroll stays in whole-stage codegen (the ``pq._sv_sqdist`` finding).
    Built as a parsed SQL STRING, not a Column tree — K x dim x ~6 py4j
    calls per rebuild measured ~4-5 s of pure driver latency per Lloyd
    round (the simhash64 finding, operators/dedup.py); one F.expr parse
    is ~0."""
    terms = [
        "(element_at({v}, {i}) - {w}L) * (element_at({v}, {i}) - {w}L)".format(
            v=vec_col, i=i, w=int(w)
        )
        for i, w in enumerate(c, start=1)
    ]
    return "(" + " + ".join(terms) + ")"


def _cell_expr(vec_col: str, centroids: list[list[int]]):
    """1-based nearest-centroid cell from LITERAL centroids — squared
    Euclidean over bigint components, first-minimum tie-break (= lowest
    cell). Magnitudes under the WEIGHT_CAP clamp: components <= 2^24,
    squared diffs < 2^48, x dim(64) < 2^54 — no bigint overflow, even
    under ANSI mode. Codegen CSE dedups the two ``array(...)``
    references inside one projection."""
    arr = "array(%s)" % ", ".join(_sqdist_sql(vec_col, c) for c in centroids)
    return F.expr(
        "CAST(array_position({a}, array_min({a})) AS INT)".format(a=arr)
    )


def topic_clusters(
    df: DataFrame,
    n_topics: int = 8,
    dim: int = 64,
    lloyd_iterations: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    cache_scope: CacheScope | None = None,
    weight_cap: int = WEIGHT_CAP,
) -> tuple[DataFrame, list[list[int]]]:
    """Cluster documents into ``n_topics`` cells over hashed TF-IDF vectors.

    Returns ``(assigned, centroids)``: ``assigned`` = (id, vec, cell) with
    ``cell`` in 1..n_topics, and ``centroids`` the final driver-side
    K x dim bigint centroid list (bounded).

    Seeds are the ``n_topics`` lowest-id documents' vectors (deterministic,
    the ``ivf_build`` convention); each Lloyd round assigns every vector to
    its nearest centroid (map-only, literal centroids) and replaces each
    centroid with its cell's element-wise floor-mean. Empty cells keep
    their previous centroid.

    Overflow discipline (enforced, not assumed): components are CLAMPED
    to ``WEIGHT_CAP`` = 2^24 — tf is unbounded by document length, so an
    unclamped degenerate doc (500k tokens in one bucket x idf) could push
    a squared-distance term past int64 and raise under ANSI mode. With
    the clamp, a term is < 2^48 and the 64-dim sum < 2^54. Clamping
    saturates the topical signal, it does not distort ordering for the
    normal range. Centroid sums aggregate in DECIMAL(38,0) — a bigint
    sum of 2^24-bounded components overflows at ~2^39 rows per cell,
    below this module's stated corpus scale (the content_checksum
    precedent, operators/compaction.py).
    """
    # persist the slim (id, tf) frame INSIDE tfidf_vectors — every round
    # plus the final assignment re-reads it, and the single-scan form
    # hashes each token exactly once for the whole clustering job; the
    # returned vec frame is a cheap 64-element map over that cache, so it
    # needs no persist of its own
    vecs = tfidf_vectors(
        df,
        dim=dim,
        text_col=text_col,
        id_col=id_col,
        cache_scope=cache_scope,
        persist_tf=True,
    )
    cap = F.lit(int(weight_cap)).cast("bigint")
    vecs = vecs.select(
        F.col(id_col),
        F.transform("vec", lambda x: F.least(x, cap)).alias("vec"),
    )

    seed_rows = vecs.orderBy(id_col).limit(n_topics).collect()
    centroids = [[int(w) for w in r["vec"]] for r in seed_rows]
    if not centroids:
        return vecs.withColumn("cell", F.lit(None).cast("int")), []

    # centroid update: dim columnar SUM aggregates + a count per cell — no
    # posexplode (the exploded form shuffles dim rows per doc and measured
    # ~6 s/round at sf0.1 vs ~1.5 s for this shape; the aggregate output
    # is K rows either way). All dim+1 buffers partial-aggregate map-side.
    aggs = [F.count("*").alias("c")] + [
        F.sum(F.element_at("vec", i).cast("decimal(38,0)")).alias(f"s{i}")
        for i in range(1, dim + 1)
    ]
    for _ in range(lloyd_iterations):
        cell = _cell_expr("vec", centroids)
        rows = vecs.groupBy(cell.alias("cell")).agg(*aggs).collect()
        by_cell = {
            int(r["cell"]): (
                int(r["c"]),
                [int(r[f"s{i}"]) for i in range(1, dim + 1)],
            )
            for r in rows
        }
        centroids = [
            [s // by_cell[k + 1][0] for s in by_cell[k + 1][1]]
            if (k + 1) in by_cell
            else prev
            for k, prev in enumerate(centroids)
        ]

    assigned = vecs.withColumn("cell", _cell_expr("vec", centroids))
    return assigned, centroids


def topic_summary(
    assigned: DataFrame, centroids: list[list[int]]
) -> DataFrame:
    """Bounded per-cell digest for mix policies: (cell, n_docs, top_bucket,
    cmass). ``top_bucket`` is the centroid's highest-weight feature bucket
    (0-based, ties -> lowest bucket) — the cell's dominant hashed term;
    ``cmass`` the centroid's total weight (a topical-density proxy). Both
    come from the driver-side centroid list and re-enter as literals via a
    K-row lookup frame; the only data-side work is one partial-aggregated
    count per cell."""
    spark = assigned.sparkSession
    meta = [
        (
            k + 1,
            max(range(len(c)), key=lambda p: (c[p], -p)) if c else 0,
            sum(c),
        )
        for k, c in enumerate(centroids)
    ]
    meta_df = spark.createDataFrame(meta, "cell int, top_bucket int, cmass bigint")
    counts = assigned.groupBy("cell").agg(F.count("*").alias("n_docs"))
    return (
        counts.join(F.broadcast(meta_df), "cell")
        .select(
            F.col("cell").cast("bigint").alias("cell"),
            F.col("n_docs").cast("bigint").alias("n_docs"),
            F.col("top_bucket").cast("bigint").alias("top_bucket"),
            F.col("cmass").cast("bigint").alias("cmass"),
        )
    )
