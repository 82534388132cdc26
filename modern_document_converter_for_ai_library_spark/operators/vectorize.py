"""Hashed TF-IDF document vectors — the text→vector bridge with NO model.

Every vector-space operator in this repo (ANN brute/LSH/IVF/PQ, SemDeDup,
k-center coresets, embedding near-dup) consumes an embedding column; real
deployments often have none for fresh text. The hashing trick (Weinberger
et al., ICML 2009 — feature hashing; the HashingTF shape) closes the gap:
token -> md5-derived bucket in [0, dim), per-doc term frequencies over the
buckets, corpus IDF per bucket, weight = tf * idf. Deterministic,
model-free, and integer-exact end-to-end, so it is cross-engine oracled
like everything else (``q_tfidf_vectors``).

100 TB plan shape — ZERO corpus-scale shuffle:

- TF is computed INSIDE each row with array expressions (tokens ->
  buckets -> per-bucket counts via one codegen fold), not by
  explode+groupBy: for bounded ``dim`` the O(dim x tokens) local fold
  beats shuffling one row per token by orders of magnitude at corpus
  scale. The TF stage is map-only.
- DF (documents containing bucket b) is ONE bounded aggregate: the
  per-doc presence arrays partial-aggregate position-wise map-side
  (posexplode of a dim-length array -> groupBy(pos) over <= dim keys);
  the reduce output is ``dim`` rows regardless of corpus size.
- IDF is computed on the DRIVER from those dim (bucket, df) rows with
  exact integer arithmetic — floor-log2 of (N+1)/(df_b+1), the bm25
  idiom (operators/search.py) — and re-enters the plan as a LITERAL
  array: no join at all on the weighting pass, which is again map-only.

Weights are raw integers (tf x idf_log2 x 2^10); cosine consumers
normalize downstream (the ANN operators quantize/normalize their inputs
anyway — see ``similarity._quantize``). Collisions are the hashing
trick's documented trade: two tokens sharing a bucket add their mass,
which preserves inner products in expectation (the cited paper's result).

No reference-repo counterpart (the reference has no vector pipeline);
composition with the ANN stack is pinned by test
(tests/test_vectorize.py: near-dup texts land nearer than unrelated
texts under ivf/brute search over these vectors).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

IDF_SCALE = 1024  # 2^10 — keeps floor-log2 idf distinctions after tf scaling


def _bucket(col, dim: int):
    """md5-derived feature bucket in [0, dim): first 8 hex chars of the
    token digest as an integer, mod dim — the engine-portable hash this
    repo uses everywhere (identical bytes in Spark and DuckDB)."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("bigint") % dim


def doc_tf(
    df: DataFrame,
    dim: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, tf array<bigint> of length dim): per-doc hashed term
    frequencies, computed entirely inside the row (map-only). Null text
    coalesces to '' -> a ZERO vector, not an all-NULL one: split(NULL)
    is NULL and every per-bucket size would be NULL, and NULL distances
    rank FIRST under the ANN windows' ascending order — a null-text doc
    would become everyone's nearest neighbor (corpus_audit models
    null-text docs as a first-class corpus state, so the input is
    realistic)."""
    tokens = F.filter(
        F.split(F.coalesce(F.col(text_col), F.lit("")), " "),
        lambda x: x != "",
    )
    buckets = F.transform(tokens, lambda t: _bucket(t, dim))
    # ONE fold over the bucket array, not dim filter passes: the naive
    # transform(sequence(0, dim-1), i -> size(filter(buckets, b -> b==i)))
    # references ``buckets`` dim times and Catalyst INLINES the md5 chain
    # into every use — dim md5 evaluations per token (measured 29 s for the
    # sf0.1 contract query vs ~2 s for this form). The fold hashes each
    # token once and pays O(dim) cheap bigint conditionals per token to
    # rebuild the count array.
    tf = F.aggregate(
        buckets,
        F.array_repeat(F.lit(0).cast("bigint"), dim),
        lambda acc, b: F.transform(
            acc, lambda c, i: F.when(i.cast("bigint") == b, c + 1).otherwise(c)
        ),
    )
    return df.select(F.col(id_col), tf.alias("tf"))


def bucket_df(tf_frame: DataFrame, dim: int) -> DataFrame:
    """(bucket, df): number of docs with tf[bucket] > 0 — ONE bounded
    aggregate (<= dim rows out, partial-aggregated map-side)."""
    return (
        tf_frame.select(
            F.posexplode(
                F.transform("tf", lambda c: (c > 0).cast("bigint"))
            ).alias("bucket", "present")
        )
        .groupBy("bucket")
        .agg(F.sum("present").alias("df"))
    )


def idf_literals(df_rows, n_docs: int, dim: int) -> list[int]:
    """Exact integer idf per bucket: IDF_SCALE * floor(log2((N+1)/(df+1))),
    driver-side from the bounded (bucket, df) rows (the bm25 floor-log2
    idiom — no floating point anywhere)."""
    by_bucket = {int(r["bucket"]): int(r["df"]) for r in df_rows}
    out = []
    for b in range(dim):
        ratio = (n_docs + 1) // (by_bucket.get(b, 0) + 1)
        out.append(IDF_SCALE * (max(ratio, 1).bit_length() - 1))
    return out


def tfidf_vectors(
    df: DataFrame,
    dim: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
    cache_scope=None,
    persist_tf: bool = False,
) -> DataFrame:
    """(id, vec array<bigint> of length dim): hashed TF-IDF vectors.

    Plan: map-only TF -> one bounded DF reduce (dim rows collected) ->
    map-only weighting against the broadcast-as-literal idf array. The
    corpus is shuffled never and scanned twice (both scans column-pruned
    to (id, text)) — or ONCE with ``persist_tf``/``cache_scope``, which
    persists the slim (id, tf) frame so the DF reduce, the doc count, and
    the returned weighting pass all read the cache instead of re-hashing
    every token (the clustering caller iterates over the output, so the
    single-scan form is its default; pass ``cache_scope``
    (plans/caching.py) to own the cache lifetime, else it is GC-managed).
    """
    tf_frame = doc_tf(df, dim=dim, text_col=text_col, id_col=id_col)
    if persist_tf or cache_scope is not None:
        from ..plans.caching import scoped_persist

        tf_frame = scoped_persist(tf_frame, cache_scope)
    # same value as df.count() (one tf row per doc) but reads/warms the
    # cache when persisted
    n_docs = tf_frame.count()
    idf = idf_literals(bucket_df(tf_frame, dim).collect(), n_docs, dim)
    idf_arr = F.array(*[F.lit(v).cast("bigint") for v in idf])
    vec = F.zip_with("tf", idf_arr, lambda t, w: t * w)
    return tf_frame.select(F.col(id_col), vec.alias("vec"))
