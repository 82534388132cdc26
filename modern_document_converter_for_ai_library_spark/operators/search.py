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

Scale shape: because the query-term list is small and fixed, per-term
term frequencies ride the ONE per-document aggregate as conditional
sums (tf_i = sum(token = t_i)) — a single groupBy(did) exchange carries
dl and every tf. Corpus stats (T, N, per-term df) all come out of one
scalar aggregate over that table, idf is then pure driver-side integer
math, and scoring is a single Project over the per-doc table — no
data-scale joins, no windows. Top-k is a global TakeOrdered (no full
sort). Document ids are used as-is (never cast), so string ids rank
fine and cannot silently null out.
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
    # ONE per-doc aggregate carries dl and every per-term tf
    tf_cols = ["_tf_%d" % i for i in range(len(uniq_terms))]
    per_doc = toks.groupBy("did").agg(
        F.count("*").cast("bigint").alias("dl"),
        *[
            F.sum(F.when(F.col("token") == t, 1).otherwise(0))
            .cast("bigint")
            .alias(c)
            for t, c in zip(uniq_terms, tf_cols)
        ],
    )
    # one scalar aggregate yields T, N, and every per-term df
    stats = per_doc.agg(
        F.sum("dl").cast("bigint").alias("T"),
        F.count("*").cast("bigint").alias("N"),
        *[
            F.sum(F.when(F.col(c) > 0, 1).otherwise(0)).cast("bigint").alias("df" + c)
            for c in tf_cols
        ],
    ).collect()[0]
    T, N = stats["T"], stats["N"]
    if not T or not N:
        return spark.createDataFrame([], out_schema)
    # ratio-preserving common shift keeps every product below 2^63
    shift = max(0, T.bit_length() - _T_BITS)
    Ts, Ns = T >> shift, max(N >> shift, 1)
    # idf proxy (floor-log2 of the scaled classic ratio): exact driver-side
    # integer math — df is already in hand, no join needed
    idfs = []
    for c in tf_cols:
        dfq = stats["df" + c]
        ratio = (2 * (N - dfq) + 1) * (1 << IDF_SCALE_BITS) // (2 * dfq + 1) if dfq else 0
        idfs.append(ratio.bit_length() - 1 if ratio else 0)

    term_score = lambda c, idf: (  # noqa: E731
        "%d * 44 * least(%s, %d) * %d div "
        "(20 * least(%s, %d) * %d + 6 * %d + 18 * least(dl, %d) * %d)"
        % (idf, c, TF_CLAMP, Ts, c, TF_CLAMP, Ts, Ts, DL_CLAMP, Ns)
    )
    score = " + ".join(
        "if(%s > 0, %s, 0)" % (c, term_score(c, idf))
        for c, idf in zip(tf_cols, idfs)
    )
    n_hit = " + ".join("if(%s > 0, 1, 0)" % c for c in tf_cols)
    scored = per_doc.select(
        "did",
        F.expr(score).cast("bigint").alias("score"),
        F.expr(n_hit).cast("bigint").alias("n_hit_terms"),
    ).filter(F.col("n_hit_terms") > 0)
    return (
        scored.orderBy(F.col("score").desc(), F.col("did").asc())
        .limit(top_k)
        .select(F.col("did").alias(id_col), "score", "n_hit_terms")
    )
