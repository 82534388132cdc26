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


def cdc_dup_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 4,
    divisor: int = 16,
) -> DataFrame:
    """Content-defined chunking (CDC) duplicate statistics — the
    rsync/LBFS boundary trick over tokens: a chunk boundary falls AFTER
    token i when the 60-bit md5 of the last ``window`` tokens is 0 mod
    ``divisor`` (expected chunk length = divisor tokens). Because
    boundaries depend only on LOCAL content, an insertion or deletion
    re-synchronizes within one window — shifted copies share all chunks
    outside the edit neighborhood, which fixed-offset passage/gram dedup
    (passage_dedup, repeated_ngram_stats) structurally misses.

    Output: (id, n_chunks, dup_chunks, dup_micros) for EVERY input doc —
    ``dup_chunks`` counts this doc's chunks whose content hash occurs in
    >= 2 (doc, chunk) instances corpus-wide; ``dup_micros`` =
    10^6 * dup_chunks // n_chunks exact-integer (0 for token-less docs).

    100 TB plan shape: one hash shuffle on the doc id feeds ALL THREE
    per-doc windows (gram lag, running boundary sum, running
    chunk-start max — one sort, same partitioning; hot tasks bounded by
    the largest single document, the accepted per-doc-window caveat
    suite-wide). The chunk identity is an O(1)-STATE fingerprint: each
    token contributes the 40-bit md5 of (position-within-chunk, token)
    and the chunk key is (sum, length) — order-sensitive, commutative,
    partial-aggregating with one bigint of state. The first version
    reassembled chunk TEXT via collect_list and md5; per-group array
    buffers over the token-exploded corpus blew executor memory at the
    1M-doc scaling probe (SparkOutOfMemoryError in the reassembly
    stage) — list-valued aggregation states do not belong on a
    token-exploded corpus. Sum bound: 2^40 per token x chunk length —
    int64-safe to ~8M-token chunks, far past any document. Chunk-
    frequency is a partial-aggregated groupBy + equi-join (NOT a
    count-over-window partitioned by hash, which could not
    partial-aggregate and would melt on a degenerate boilerplate
    chunk); the final per-doc rollup partial-aggregates again. No
    per-row Python anywhere.
    """
    from pyspark.sql import Window

    sep = "\x1f"
    toks = df.select(
        F.col(id_col), F.posexplode(tokens_col(text_col)).alias("pos", "tok")
    )
    w = Window.partitionBy(id_col).orderBy("pos")
    gram = F.concat_ws(
        sep, *[F.lag("tok", window - 1 - j).over(w) for j in range(window)]
    )
    flagged = toks.withColumn(
        "_flag",
        F.when(
            (F.col("pos") >= window - 1)
            & (
                F.conv(F.substring(F.md5(gram), 1, 15), 16, 10).cast("bigint")
                % divisor
                == 0
            ),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .cast("bigint"),
    )
    w_prev = w.rowsBetween(Window.unboundedPreceding, -1)
    cid = F.coalesce(F.sum("_flag").over(w_prev), F.lit(0)).cast("bigint")
    # start of the current chunk = last boundary position before this
    # row + 1 (same window spec -> same single sort)
    start = (
        F.coalesce(
            F.max(F.when(F.col("_flag") == 1, F.col("pos"))).over(w_prev),
            F.lit(-1),
        )
        + 1
    )
    tok_fp = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    sep, (F.col("pos") - start).cast("string"), F.col("tok")
                )
            ),
            1,
            10,
        ),
        16,
        10,
    ).cast("bigint")
    chunks = (
        flagged.withColumn("_cid", cid)
        .withColumn("_fp", tok_fp)
        .groupBy(id_col, "_cid")
        .agg(
            F.concat_ws(
                "_",
                F.sum("_fp").cast("string"),
                F.count("*").cast("string"),
            ).alias("chunk_hash")
        )
    )
    freq = chunks.groupBy("chunk_hash").agg(F.count("*").alias("_n"))
    per_doc = (
        chunks.join(freq, "chunk_hash")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_chunks"),
            F.sum(F.when(F.col("_n") >= 2, 1).otherwise(0)).alias("dup_chunks"),
        )
    )
    return (
        df.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_chunks", F.lit(0)).cast("bigint").alias("n_chunks"),
            F.coalesce("dup_chunks", F.lit(0)).cast("bigint").alias("dup_chunks"),
            # exact bigint DIV — no double round-trip (suite convention)
            F.coalesce(
                F.expr("CAST(1000000 AS BIGINT) * dup_chunks DIV n_chunks"),
                F.lit(0),
            )
            .cast("bigint")
            .alias("dup_micros"),
        )
    )
