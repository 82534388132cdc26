"""Distributed unigram-LM tokenizer training + encoding (the
SentencePiece unigram model of Kudo 2018, Subword Regularization,
arXiv:1804.10959), as the deterministic hard-EM (Viterbi) variant.

Shaped for Spark exactly like the BPE trainer (operators/bpe.py): the
corpus is touched by ONE shuffle — the shared word-frequency groupBy —
and every training round runs on that bounded table:

    1. Seed vocabulary: every substring of length 1..max_piece_len of
       every DISTINCT word, occurrence-counted weighted by word
       frequency (one bounded explode — |word| * L cells per distinct
       word, never corpus-scale). All single characters are kept
       unconditionally (coverage guarantee); multi-char pieces keep the
       top ``seed_size`` by (count desc, piece asc).
    2. Hard-EM rounds: the E-step Viterbi-segments each distinct word
       under the current piece costs inside one Arrow-batched pandas
       UDF (the piece table is a broadcast-sized dict; per-word DP is
       O(|word| * max_piece_len)); piece counts re-aggregate with ONE
       partial-aggregated groupBy over the bounded segmentation rows.
       The M-step + prune run on the DRIVER over the bounded vocab
       (keep top ``vocab_size`` multi-char pieces by re-estimated
       count, singles always survive).

Determinism: Viterbi costs are integer micros (-1e6 * ln p, rounded
once on the driver from exact integer counts), DP sums integers, and
ties break on (cost, longer-piece-first, piece) — so the learned vocab
and every segmentation are a pure function of the corpus, independent
of partitioning, core count, or cluster size. The sequential
pure-Python twin in tests/test_unigram.py replays the identical
algorithm; q_unigram_seed oracles the seed-count round in DuckDB with
the same integer arithmetic.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .bpe import word_frequencies

MICRO = 1_000_000


def seed_piece_counts(
    wf: DataFrame, max_piece_len: int = 6
) -> DataFrame:
    """(piece, count) over every substring of length 1..max_piece_len of
    each distinct word, each occurrence weighted by the word's corpus
    frequency. Runs entirely on the bounded word table: the explode is
    ~|word| * max_piece_len rows per DISTINCT word."""
    n = F.length("word")
    ex = (
        wf.select("word", "freq", F.explode(F.sequence(F.lit(1), n)).alias("_i"))
        .select(
            "word",
            "freq",
            "_i",
            F.explode(
                F.sequence(
                    F.lit(1),
                    F.least(F.lit(max_piece_len), n - F.col("_i") + 1),
                )
            ).alias("_l"),
        )
        .select(
            F.col("word").substr(F.col("_i"), F.col("_l")).alias("piece"),
            "freq",
        )
    )
    return ex.groupBy("piece").agg(
        F.sum("freq").cast("bigint").alias("count")
    )


def _costs_from_counts(counts: dict[str, int]) -> dict[str, int]:
    """Integer-micro Viterbi costs from exact integer counts: one float
    ln per piece, computed ONCE on the driver over the bounded vocab —
    the only float in training, identical on every run."""
    total = sum(counts.values())
    return {
        p: int(round(-MICRO * math.log(c / total)))
        for p, c in counts.items()
    }


def viterbi_segment(
    word: str, costs: dict[str, int], max_piece_len: int
) -> list[str]:
    """Min-total-cost segmentation; ties prefer the LONGER last piece,
    then the lexicographically smaller one — the sequential twin and
    the distributed E-step share this exact function."""
    n = len(word)
    INF = float("inf")
    best: list = [None] * (n + 1)
    best[0] = (0, 0, "")  # (cost, -last_piece_len, last_piece)
    back = [0] * (n + 1)
    for i in range(1, n + 1):
        cand = None
        arg = 0
        for l in range(1, min(max_piece_len, i) + 1):
            piece = word[i - l : i]
            c = costs.get(piece)
            if c is None or best[i - l] is None:
                continue
            key = (best[i - l][0] + c, -l, piece)
            if cand is None or key < cand:
                cand = key
                arg = i - l
        best[i] = cand
        back[i] = arg
    if best[n] is None:  # unreachable when all single chars are in vocab
        return list(word)
    out: list[str] = []
    i = n
    while i > 0:
        j = back[i]
        out.append(word[j:i])
        i = j
    return out[::-1]


def _estep_counts(
    wf: DataFrame, costs: dict[str, int], max_piece_len: int
) -> DataFrame:
    """Distributed E-step: Viterbi-segment every distinct word under the
    broadcast cost dict, explode the chosen pieces weighted by word
    frequency, ONE partial-aggregated groupBy -> (piece, count)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<string>")
    def _seg(words: pd.Series) -> pd.Series:
        return words.map(
            lambda w: viterbi_segment(w or "", costs, max_piece_len)
        )

    return (
        wf.select(F.explode(_seg(F.col("word"))).alias("piece"), "freq")
        .groupBy("piece")
        .agg(F.sum("freq").cast("bigint").alias("count"))
    )


def unigram_train(
    df: DataFrame,
    text_col: str = "text",
    max_piece_len: int = 6,
    seed_size: int = 2000,
    vocab_size: int = 500,
    rounds: int = 2,
    min_freq: int = 1,
) -> list[tuple[str, int, int]]:
    """Learn a unigram-LM vocabulary; returns [(piece, count,
    cost_micros)] sorted by (count desc, piece asc). The driver holds
    only bounded state (seed_size + alphabet rows); the corpus is
    shuffled exactly once, inside :func:`word_frequencies`."""
    wf = word_frequencies(df, text_col=text_col, min_freq=min_freq).persist()
    wf.count()
    try:
        seed = seed_piece_counts(wf, max_piece_len).collect()
        singles = {r["piece"]: int(r["count"]) for r in seed if len(r["piece"]) == 1}
        multi = sorted(
            ((r["piece"], int(r["count"])) for r in seed if len(r["piece"]) > 1),
            key=lambda t: (-t[1], t[0]),
        )[:seed_size]
        counts = dict(singles)
        counts.update(multi)
        for _ in range(rounds):
            costs = _costs_from_counts(counts)
            est = {
                r["piece"]: int(r["count"])
                for r in _estep_counts(wf, costs, max_piece_len).collect()
            }
            kept_multi = sorted(
                ((p, c) for p, c in est.items() if len(p) > 1),
                key=lambda t: (-t[1], t[0]),
            )[: max(0, vocab_size - len(singles))]
            counts = {
                p: max(est.get(p, 0), 1) for p in singles
            }  # coverage floor: alphabet never leaves the vocab
            counts.update(kept_multi)
    finally:
        wf.unpersist(blocking=True)
    costs = _costs_from_counts(counts)
    return sorted(
        ((p, c, costs[p]) for p, c in counts.items()),
        key=lambda t: (-t[1], t[0]),
    )


def unigram_encode(
    df: DataFrame,
    vocab: list[tuple[str, int, int]],
    text_col: str = "text",
    id_col: str = "doc_id",
    max_piece_len: int = 6,
) -> DataFrame:
    """Per-document Viterbi piece count under a learned vocab: (id,
    n_words, n_pieces). One Arrow-batched map stage, no shuffle — the
    vocab is a closure-broadcast dict, exactly like bpe_encode."""
    from pyspark.sql.functions import pandas_udf

    costs = {p: cost for p, _, cost in vocab}

    @pandas_udf("struct<n_words: bigint, n_pieces: bigint>")
    def _encode(texts: pd.Series) -> pd.DataFrame:
        n_words, n_pieces = [], []
        for t in texts:
            words = [w for w in (t or "").split(" ") if w]
            n_words.append(len(words))
            n_pieces.append(
                sum(
                    len(viterbi_segment(w, costs, max_piece_len))
                    for w in words
                )
            )
        return pd.DataFrame({"n_words": n_words, "n_pieces": n_pieces})

    out = df.select(F.col(id_col), _encode(F.col(text_col)).alias("_e"))
    return out.select(
        id_col,
        F.col("_e.n_words").alias("n_words"),
        F.col("_e.n_pieces").alias("n_pieces"),
    )
