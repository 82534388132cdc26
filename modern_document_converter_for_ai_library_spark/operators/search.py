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

Overflow safety (exact, not best-effort): T and N are right-shifted by
the same s = max(0, bit_length(T) - 31) before scoring (they only enter
the cleared form as the ratio-preserving products tf*T and dl*N), and tf
/ dl are clamped at 2^20 / 2^24 — BM25 saturates in tf, so the clamp
moves a score only past the point where the term contribution is within
rounding of its asymptote. With those bounds idf<=62, so the numerator
is <= 62*44*2^20*2^31 < 2^63 and each denominator term is < 2^60: no
BIGINT wrap at any corpus size. The shift and clamps are part of the
scoring definition and are replicated verbatim in the SQL oracle.

Scale shape: corpus stats are two scalar aggregates; the query-term df
table is |terms| rows (broadcast); scoring is a broadcast semi-join of
the exploded tokens against the terms, one partial-aggregated groupBy
per (doc, term), one per doc — no data-scale window. Top-k is a global
TakeOrdered (no full sort). Document ids are used as-is (never cast), so
string ids rank fine and cannot silently null out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import tokens_col

IDF_SCALE_BITS = 20
TF_CLAMP = 1 << 20
DL_CLAMP = 1 << 24
_T_BITS = 31


def bm25_rank(
    df: DataFrame,
    terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    top_k: int = 20,
) -> DataFrame:
    """Rank documents for ``terms`` by integer-exact BM25; returns the
    top ``top_k`` rows (doc_id, score, n_hit_terms) ordered by
    (score DESC, doc_id ASC). Empty term lists and empty corpora return
    an empty frame of the same shape."""
    from pyspark.sql import types as T_
    from pyspark.sql.functions import broadcast

    spark = df.sparkSession
    out_schema = T_.StructType(
        [
            T_.StructField(id_col, df.schema[id_col].dataType),
            T_.StructField("score", T_.LongType()),
            T_.StructField("n_hit_terms", T_.LongType()),
        ]
    )
    uniq_terms = sorted({t for t in terms if t})
    if not uniq_terms:
        return spark.createDataFrame([], out_schema)

    toks = df.select(
        F.col(id_col).alias("did"), F.explode(tokens_col(text_col)).alias("token")
    )
    lens = toks.groupBy("did").agg(F.count("*").cast("bigint").alias("dl"))
    # two scalar corpus stats (driver-side, O(1) rows)
    stats = lens.agg(
        F.sum("dl").cast("bigint").alias("T"), F.count("*").cast("bigint").alias("N")
    ).collect()[0]
    T, N = stats["T"], stats["N"]
    if not T or not N:
        return spark.createDataFrame([], out_schema)
    # ratio-preserving common shift keeps every product below 2^63
    shift = max(0, T.bit_length() - _T_BITS)
    Ts, Ns = T >> shift, max(N >> shift, 1)

    terms_df = spark.createDataFrame([(t,) for t in uniq_terms], ["token"])
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
                "idf * 44 * least(tf, %d) * %d div "
                "(20 * least(tf, %d) * %d + 6 * %d + 18 * least(dl, %d) * %d)"
                % (TF_CLAMP, Ts, TF_CLAMP, Ts, Ts, DL_CLAMP, Ns)
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
