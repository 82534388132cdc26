"""unigram_train / unigram_encode (operators/unigram.py): the
SentencePiece unigram-LM trainer (Kudo 2018) as deterministic hard-EM —
full-training differential against a sequential pure-Python twin,
partitioning invariance, alphabet-coverage guarantee, encoder bounds."""

from collections import Counter

from modern_document_converter_for_ai_library_spark.operators.unigram import (
    _costs_from_counts,
    seed_piece_counts,
    unigram_encode,
    unigram_train,
    viterbi_segment,
)
from modern_document_converter_for_ai_library_spark.operators.bpe import (
    word_frequencies,
)

CORPUS = [
    ("a", "lowering lower lowest low low lower newer newest new"),
    ("b", "wider wide widest new newer lowering wide wide low"),
    ("c", "the newest lower the the wide new low lowering"),
]


def twin_train(
    docs,
    max_piece_len=6,
    seed_size=2000,
    vocab_size=500,
    rounds=2,
):
    """Sequential replay of the exact training algorithm: Counter word
    freqs, substring seed counts, hard-EM rounds via the shared
    single-word Viterbi (the per-word DP is the semantic spec; the twin
    checks every DISTRIBUTED aggregation around it)."""
    wf = Counter(w for _, t in docs for w in t.split(" ") if w)
    seed: Counter = Counter()
    for w, f in wf.items():
        for i in range(len(w)):
            for l in range(1, min(max_piece_len, len(w) - i) + 1):
                seed[w[i : i + l]] += f
    singles = {p: c for p, c in seed.items() if len(p) == 1}
    multi = sorted(
        ((p, c) for p, c in seed.items() if len(p) > 1),
        key=lambda t: (-t[1], t[0]),
    )[:seed_size]
    counts = dict(singles)
    counts.update(multi)
    for _ in range(rounds):
        costs = _costs_from_counts(counts)
        est: Counter = Counter()
        for w, f in wf.items():
            for piece in viterbi_segment(w, costs, max_piece_len):
                est[piece] += f
        kept_multi = sorted(
            ((p, c) for p, c in est.items() if len(p) > 1),
            key=lambda t: (-t[1], t[0]),
        )[: max(0, vocab_size - len(singles))]
        counts = {p: max(est.get(p, 0), 1) for p in singles}
        counts.update(kept_multi)
    costs = _costs_from_counts(counts)
    return sorted(
        ((p, c, costs[p]) for p, c in counts.items()),
        key=lambda t: (-t[1], t[0]),
    )


def test_train_matches_sequential_twin(spark):
    df = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    got = unigram_train(df, vocab_size=30, rounds=2)
    assert got == twin_train(CORPUS, vocab_size=30, rounds=2)
    # multi-char pieces were actually learned
    assert any(len(p) > 1 for p, _, _ in got)


def test_partitioning_invariance(spark):
    df = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    one = unigram_train(df.coalesce(1), vocab_size=25, rounds=2)
    many = unigram_train(df.repartition(7), vocab_size=25, rounds=2)
    assert one == many


def test_alphabet_always_covered(spark):
    df = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    vocab = unigram_train(df, vocab_size=12, rounds=1)
    pieces = {p for p, _, _ in vocab}
    alphabet = {ch for _, t in CORPUS for ch in t if ch != " "}
    assert alphabet <= pieces
    # every corpus word is segmentable under the final costs
    costs = {p: cost for p, _, cost in vocab}
    for _, t in CORPUS:
        for w in t.split(" "):
            seg = viterbi_segment(w, costs, 6)
            assert "".join(seg) == w


def test_seed_counts_weighted_by_freq(spark):
    df = spark.createDataFrame([("a", "ab ab b")], ["doc_id", "text"])
    wf = word_frequencies(df)
    got = {
        r["piece"]: r["count"]
        for r in seed_piece_counts(wf, max_piece_len=2).collect()
    }
    # "ab" word occurs twice -> substrings a, b, ab each weighted 2;
    # the lone "b" word adds 1 more b
    assert got == {"a": 2, "b": 3, "ab": 2}


def test_encode_bounds_and_roundtrip(spark):
    df = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    vocab = unigram_train(df, vocab_size=30, rounds=2)
    rows = {
        r["doc_id"]: (r["n_words"], r["n_pieces"])
        for r in unigram_encode(df, vocab).collect()
    }
    for did, text in CORPUS:
        words = [w for w in text.split(" ") if w]
        n_words, n_pieces = rows[did]
        assert n_words == len(words)
        assert n_words <= n_pieces <= sum(len(w) for w in words)
    # trained pieces compress below character-level for this corpus
    for did, text in CORPUS:
        assert rows[did][1] < sum(len(w) for w in text.split(" ") if w)


def test_viterbi_tie_prefers_longer_piece():
    costs = {"a": 5, "b": 5, "ab": 10}
    # "ab" as one piece costs 10, as two pieces costs 10 -> tie: the
    # longer last piece wins
    assert viterbi_segment("ab", costs, 6) == ["ab"]
