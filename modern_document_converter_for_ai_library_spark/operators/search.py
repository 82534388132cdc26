"""BM25 document ranking — the retrieval half of the search story
(inverted_index.py builds the index; this ranks documents for a query).

Integer-exact BM25: with k1 = 6/5 and b = 3/4 (the standard defaults as
exact rationals) the per-term score

    idf * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))

clears to a single integer division once avgdl = T/N is substituted and
the denominator is multiplied through by 20*N*avgdl:

    term_score = idf_scaled * 44 * tf * T  div  (20*tf*T + 6*T + 18*dl*N)

where T = total corpus tokens, N = corpus docs, dl = doc length — every
intermediate a BIGINT, no float and no early division, so a DuckDB
oracle reproduces identical scores. idf is the floor-log2 proxy
``ilog2((2*(N - df) + 1) * 2^20 div (2*df + 1))`` of the classic
(N - df + 0.5)/(df + 0.5) ratio — log2-floor instead of ln keeps it
integral (same trick as the LM quality stage; ranking order is preserved
up to the integer quantization, which both engines share exactly).

Overflow headroom: numerator ~ idf(<=40) * 44 * tf * T; at T beyond
~1e15 tokens rescale T and N by a common factor first (they only ever
appear in ratios).

Scale shape: corpus stats are two scalar aggregates; the query-term df
table is |terms| rows (broadcast); scoring is a broadcast semi-join of
the exploded tokens against the terms, one partial-aggregated groupBy
per (doc, term), one per doc — no data-scale window. Top-k is a global
TakeOrdered (no full sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

IDF_SCALE_BITS = 20


def bm25_rank(
    df: DataFrame,
    terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    top_k: int = 20,
) -> DataFrame:
    """Rank documents for ``terms`` by integer-exact BM25; returns the
    top ``top_k`` rows (doc_id, score, n_hit_terms) ordered by
    (score DESC, doc_id ASC)."""
    from pyspark.sql.functions import broadcast

    spark = df.sparkSession
    toks = df.select(
        F.col(id_col).cast("bigint").alias("did"),
        F.explode(F.filter(F.split(F.col(text_col), " "), lambda x: x != "")).alias(
            "token"
        ),
    )
    lens = toks.groupBy("did").agg(F.count("*").cast("bigint").alias("dl"))
    # two scalar corpus stats (driver-side, O(1) rows)
    stats = lens.agg(
        F.sum("dl").cast("bigint").alias("T"), F.count("*").cast("bigint").alias("N")
    ).collect()[0]
    T, N = stats["T"], stats["N"]

    terms_df = spark.createDataFrame([(t,) for t in sorted(set(terms))], ["token"])
    hits = toks.join(broadcast(terms_df), on="token")
    tf = hits.groupBy("did", "token").agg(F.count("*").cast("bigint").alias("tf"))
    dfreq = tf.groupBy("token").agg(F.count("*").cast("bigint").alias("df"))
    # idf proxy: floor-log2 of the scaled classic ratio
    idf = dfreq.select(
        "token",
        (
            F.length(
                F.bin(
                    F.expr(
                        "(2 * (%d - df) + 1) * %d div (2 * df + 1)"
                        % (N, 1 << IDF_SCALE_BITS)
                    )
                )
            )
            - 1
        )
        .cast("bigint")
        .alias("idf"),
    )
    scored = (
        tf.join(broadcast(idf), on="token")
        .join(lens, on="did")
        .select(
            "did",
            F.expr(
                "idf * 44 * tf * %d div (20 * tf * %d + 6 * %d + 18 * dl * %d)"
                % (T, T, T, N)
            ).alias("term_score"),
        )
    )
    per_doc = scored.groupBy("did").agg(
        F.sum("term_score").cast("bigint").alias("score"),
        F.count("*").cast("bigint").alias("n_hit_terms"),
    )
    return (
        per_doc.orderBy(F.col("score").desc(), F.col("did").asc())
        .limit(top_k)
        .select(F.col("did").alias(id_col), "score", "n_hit_terms")
    )
