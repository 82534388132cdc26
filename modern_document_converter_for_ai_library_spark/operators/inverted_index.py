"""Inverted-index construction — token -> (doc-frequency, capped posting
list) at corpus scale.

The hazard at 100 TB is token skew: stopword-class tokens appear in
nearly every document, so a single window over ``token`` puts one task on
a posting list the size of the corpus. The top-K cap here is computed
with the EXACT two-phase pattern instead:

  phase 1  per (token, salt) partial top-K — salt = doc_id % n_salts
           spreads a hot token across n_salts tasks; each keeps its local
           top-K under the total order (tf DESC, doc_id ASC)
  phase 2  global top-K over the <= n_salts * K survivors per token

Phase 2's window input is bounded by construction (n_salts * K rows per
token, regardless of corpus size), so no task ever sorts a corpus-sized
partition. Exactness: every global top-K row is a phase-1 survivor of
its own salt bucket (anything that beats it globally also beats it
locally), so the two-phase result equals the single-window result — the
equivalence is asserted in tests and the DuckDB oracle computes the
single-window form.

``doc_frequency`` is counted over the FULL posting set (one
partial-aggregated groupBy), not the capped list.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


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
        F.col(id_col).cast("bigint").alias("did"),
        F.explode(F.filter(F.split(F.col(text_col), " "), lambda x: x != "")).alias(
            "token"
        ),
    )
    postings = toks.groupBy("token", "did").agg(
        F.count("*").cast("bigint").alias("tf")
    )

    # phase 1: salted partial top-K (bounds every task at skewed tokens)
    w1 = Window.partitionBy("token", F.col("did") % n_salts).orderBy(
        F.col("tf").desc(), F.col("did").asc()
    )
    local = postings.withColumn("_r", F.row_number().over(w1)).filter(
        F.col("_r") <= top_k
    )

    # phase 2: global top-K over the bounded survivor set
    w2 = Window.partitionBy("token").orderBy(F.col("tf").desc(), F.col("did").asc())
    top = (
        local.drop("_r")
        .withColumn("_r", F.row_number().over(w2))
        .filter(F.col("_r") <= top_k)
    )
    top_agg = top.groupBy("token").agg(
        F.concat_ws(
            ",",
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("_r").alias("r"), F.col("did")))
                ),
                lambda s: s["did"].cast("string"),
            ),
        ).alias("top_docs")
    )
    df_count = postings.groupBy("token").agg(
        F.count("*").cast("bigint").alias("doc_frequency")
    )
    return df_count.join(top_agg, on="token").select(
        "token", "doc_frequency", "top_docs"
    )
