"""Inverted-index construction — token -> (doc-frequency, capped posting
list) at corpus scale.

The hazard at 100 TB is token skew: stopword-class tokens appear in
nearly every document, so a single window over ``token`` puts one task on
a posting list the size of the corpus. The top-K cap here is computed
with the EXACT two-phase pattern instead:

  phase 1  per (token, salt) partial top-K — salt = pmod(hash(doc_id),
           n_salts) spreads a hot token across n_salts tasks; each keeps
           its local top-K under the total order (tf DESC, doc_id ASC),
           and the same partition carries the (token, salt) posting
           count as an unordered window aggregate — one shuffle pays for
           both.
  phase 2  global top-K over the <= n_salts * K survivors per token;
           doc_frequency = the sum of the per-salt counts carried on
           each salt's rank-1 survivor (every salt group has one).

Phase 2's window input is bounded by construction (n_salts * K rows per
token, regardless of corpus size), so no task ever sorts a corpus-sized
partition, and the corpus is tokenized/shuffled exactly ONCE (the
df-count no longer recomputes the posting aggregate — the single-scan
shape is asserted in tests). Exactness: every global top-K row is a
phase-1 survivor of its own salt bucket (anything that beats it globally
also beats it locally), so the two-phase result equals the single-window
result — the equivalence is asserted in tests and the DuckDB oracle
computes the single-window form.

Document ids are used as-is (never cast): string ids order fine under
the total order and cannot silently null out into one merged posting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import tokens_col


def build_inverted_index(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_k: int = 5,
    n_salts: int = 16,
) -> DataFrame:
    """Returns (token, doc_frequency, top_docs) where ``top_docs`` is the
    comma-joined top-``top_k`` document ids by (tf DESC, doc_id ASC)."""
    toks = df.select(
        F.col(id_col).alias("did"), F.explode(tokens_col(text_col)).alias("token")
    )
    postings = toks.groupBy("token", "did").agg(
        F.count("*").cast("bigint").alias("tf")
    )

    # phase 1: salted partial top-K (bounds every task at skewed tokens);
    # the salt is materialized as a column so BOTH window specs bind to
    # the same attribute and share one Exchange (an inline expression is
    # instantiated per-window and forces a second shuffle)
    salted = postings.withColumn("_salt", F.pmod(F.hash("did"), F.lit(n_salts)))
    w1 = Window.partitionBy("token", "_salt").orderBy(
        F.col("tf").desc(), F.col("did").asc()
    )
    w1_all = Window.partitionBy("token", "_salt")
    local = (
        salted.withColumn("_r", F.row_number().over(w1))
        .withColumn("_salt_cnt", F.count("*").over(w1_all))
        .filter(F.col("_r") <= top_k)
    )

    # phase 2: global top-K over the bounded survivor set
    w2 = Window.partitionBy("token").orderBy(F.col("tf").desc(), F.col("did").asc())
    survivors = local.withColumn(
        "_g", F.row_number().over(w2)
    )
    top_agg = survivors.groupBy("token").agg(
        F.concat_ws(
            ",",
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            F.col("_g") <= top_k,
                            F.struct(F.col("_g").alias("r"), F.col("did")),
                        )
                    )
                ),
                lambda s: s["did"].cast("string"),
            ),
        ).alias("top_docs"),
        # each salt's rank-1 survivor carries that salt's posting count
        F.sum(F.when(F.col("_r") == 1, F.col("_salt_cnt")).otherwise(0))
        .cast("bigint")
        .alias("doc_frequency"),
    )
    return top_agg.select("token", "doc_frequency", "top_docs")
