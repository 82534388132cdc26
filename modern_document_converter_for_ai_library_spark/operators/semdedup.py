"""Semantic deduplication over embedding columns (SemDeDup).

Re-implements the published SemDeDup procedure (Abbas et al., 2023,
arXiv:2303.09540 — "SemDeDup: Data-efficient learning at web-scale through
semantic deduplication") Spark-first:

  1. k-means cluster the embedding corpus (the deterministic exact-integer
     Lloyd build shared with the IVF index, ``similarity.ivf_build``);
  2. within each cluster, compare members pairwise by cosine similarity
     (quantized integer dot products — unit vectors, so dot == cosine);
  3. rank members by distance to their cluster centroid, FARTHEST FIRST
     (the paper keeps "the image with the lowest cosine similarity to the
     cluster centroid", §3), and drop any member whose similarity to an
     earlier-ranked member meets the threshold — the upper-triangular
     pairwise sweep the reference SemDeDup implementation uses, so exactly
     one representative per semantic near-duplicate group survives.

Scale shape (the reason SemDeDup works at web scale at all): the pairwise
term is confined to one cluster, so with K chosen ~ N / target_cell the
quadratic cost is N * target_cell, linear in the corpus. The self-join is
an equi-join on ``cell`` — never all-pairs — and a ``max_cell_size`` guard
caps the degenerate-cluster blowup exactly like the LSH bucket cap
(`lsh_candidate_pairs`): oversized cells skip the pairwise sweep (all
members kept) and are auditable via ``oversized_cells``.

Determinism contract (same as the rest of the similarity family): cluster
seeds/means, distances, and dots are exact integers (bigint) over
floor(x * 2^20) quantized components, so every engine and every summation
order reproduces identical clusters, ranks, and drop decisions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .similarity import _qe_sqdist, _quantize, ivf_build


def semantic_dedup(
    corpus: DataFrame,
    n_centroids: int = 16,
    threshold_q: int | None = None,
    threshold: float = 0.7,
    lloyd_iterations: int = 2,
    lloyd_sample_mod: int | None = None,
    max_cell_size: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cache_scope=None,
) -> DataFrame:
    """Per-vector SemDeDup verdicts: (id, cell, cdist, kept).

    ``kept = false`` iff some same-cell member ranked earlier — farther
    from the centroid, ties toward the lower id — has quantized dot >=
    the threshold. ``threshold_q`` is the integer dot threshold (defaults
    to ``floor(threshold * 2^40)``, the quantized-unit-vector cosine).

    The returned plan: one IVF build (broadcast-K assignment behind an
    Aggregate barrier), one broadcast join to re-attach centroid distance,
    one equi-self-join on ``cell`` for the pairwise sweep, one left-anti
    style aggregation marking dropped members. No all-pairs path exists.
    """
    if threshold_q is None:
        threshold_q = int(threshold * (1 << 40))

    assigned, centroids = ivf_build(
        corpus,
        n_centroids=n_centroids,
        id_col=id_col,
        vec_col=vec_col,
        lloyd_iterations=lloyd_iterations,
        lloyd_sample_mod=lloyd_sample_mod,
        cache_scope=cache_scope,
    )
    qcent = centroids.select(
        "cell", _quantize(F.col("cvec")).alias("_cqe")
    )
    ranked = (
        assigned.join(F.broadcast(qcent), on="cell")
        .select(
            F.col(id_col),
            "cell",
            "_qe",
            _qe_sqdist(F.col("_qe"), F.col("_cqe")).alias("cdist"),
        )
    )
    from ..plans.caching import scoped_persist

    # read 3x below (cell sizes, both sides of the sweep, final verdicts)
    ranked = scoped_persist(ranked, cache_scope)

    if max_cell_size is not None:
        sizes = ranked.groupBy("cell").agg(F.count("*").alias("_csz"))
        eligible = ranked.join(
            F.broadcast(sizes.filter(F.col("_csz") <= max_cell_size)), on="cell"
        ).drop("_csz")
    else:
        eligible = ranked

    a = eligible.select(
        "cell",
        F.col(id_col).alias("_a_id"),
        F.col("_qe").alias("_a_qe"),
        F.col("cdist").alias("_a_d"),
    )
    b = eligible.select(
        "cell",
        F.col(id_col).alias("_b_id"),
        F.col("_qe").alias("_b_qe"),
        F.col("cdist").alias("_b_d"),
    )
    # b ranked earlier than a: farther from centroid first, then lower id
    earlier = (F.col("_b_d") > F.col("_a_d")) | (
        (F.col("_b_d") == F.col("_a_d")) & (F.col("_b_id") < F.col("_a_id"))
    )
    dot = F.aggregate(
        F.zip_with(F.col("_a_qe"), F.col("_b_qe"), lambda x, y: x * y),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    dropped = (
        a.join(b, on="cell")
        .filter(earlier)
        .filter(dot >= F.lit(threshold_q))
        .select(F.col("_a_id").alias(id_col))
        .distinct()
    )
    return (
        ranked.join(
            dropped.withColumn("_drop", F.lit(True)), on=id_col, how="left"
        )
        .select(
            F.col(id_col),
            "cell",
            "cdist",
            F.coalesce(~F.col("_drop"), F.lit(True)).alias("kept"),
        )
    )


def oversized_cells(
    corpus: DataFrame,
    n_centroids: int = 16,
    max_cell_size: int = 10_000,
    lloyd_iterations: int = 2,
    lloyd_sample_mod: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Audit: cells whose size exceeds ``max_cell_size`` (skipped by the
    guarded sweep, members kept wholesale). Mirrors ``oversized_buckets``."""
    assigned, _ = ivf_build(
        corpus,
        n_centroids=n_centroids,
        id_col=id_col,
        vec_col=vec_col,
        lloyd_iterations=lloyd_iterations,
        lloyd_sample_mod=lloyd_sample_mod,
    )
    return (
        assigned.groupBy("cell")
        .agg(F.count("*").alias("cell_size"))
        .filter(F.col("cell_size") > max_cell_size)
    )
