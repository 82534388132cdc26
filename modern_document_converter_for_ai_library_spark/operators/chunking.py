"""Sliding-window document chunking with overlap — the retrieval/
context-prep counterpart to sequence packing (packing.py packs many
short docs INTO a budget; chunking splits long docs ACROSS budgets while
preserving context at the seams).

Pure columnar: chunk starts are the multiples of step = chunk_tokens -
overlap up to n - overlap - 1 (the cap drops would-be tail chunks that
lie ENTIRELY inside their predecessor — a start s with n - s <= overlap
adds zero new tokens and would only duplicate index entries), each chunk
a token slice — one higher-order-function projection and one explode,
no shuffles at all until the caller aggregates. Every chunk after the
first repeats exactly ``overlap`` tokens of its predecessor and carries
at least one new token (both tested), so a retriever hitting a chunk
boundary still sees the seam context; chunk count is
ceil((n - overlap) / step) and coverage is total.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import tokens_col


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 64,
    overlap: int = 8,
) -> DataFrame:
    """Explode each document into overlapping token-window chunks.

    Output: (id, chunk_idx, n_tokens, chunk_text) — chunk_idx dense from
    0 in document order; docs with no tokens yield no rows."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(
            "overlap must satisfy 0 <= overlap < chunk_tokens; got %d/%d"
            % (overlap, chunk_tokens)
        )
    step = chunk_tokens - overlap
    toks = tokens_col(text_col)
    n = F.size("_toks")
    starts = F.sequence(
        F.lit(0), F.greatest(n - overlap - 1, F.lit(0)), F.lit(step)
    )
    chunks = F.transform(
        starts,
        lambda s, i: F.struct(
            i.cast("bigint").alias("chunk_idx"),
            F.least(n - s, F.lit(chunk_tokens)).cast("bigint").alias("n_tokens"),
            F.concat_ws(" ", F.slice("_toks", s + 1, chunk_tokens)).alias(
                "chunk_text"
            ),
        ),
    )
    return (
        df.withColumn("_toks", toks)
        .filter(F.size("_toks") > 0)
        .select(F.col(id_col), F.explode(chunks).alias("_c"))
        .select(
            id_col,
            F.col("_c.chunk_idx").alias("chunk_idx"),
            F.col("_c.n_tokens").alias("n_tokens"),
            F.col("_c.chunk_text").alias("chunk_text"),
        )
    )
