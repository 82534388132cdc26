"""perceptron_train (operators/quality.py): full-batch perceptron
training of the linear quality classifier — sequential pure-Python twin
equality (weights, bias, mistake history), partitioning invariance,
early stop, and composition with classifier_score."""

from collections import Counter

from modern_document_converter_for_ai_library_spark.operators.quality import (
    classifier_score,
    perceptron_train,
)

MICRO = 1_000_000


def twin_train(rows, epochs=3, lr=MICRO):
    """Sequential replay: same full-batch updates, same <=0 mistake
    margin, same zero-weight pruning."""
    tf = {
        did: Counter(t for t in text.split(" ") if t)
        for did, text, _ in rows
    }
    y = {did: lab for did, _, lab in rows}
    w: Counter = Counter()
    bias = 0
    history = []
    for epoch in range(epochs):
        mistakes = [
            did
            for did in tf
            if y[did]
            * (sum(c * w.get(t, 0) for t, c in tf[did].items()) + bias)
            <= 0
        ]
        history.append({"epoch": epoch, "n_mistakes": len(mistakes)})
        if not mistakes:
            break
        bias += lr * sum(y[d] for d in mistakes)
        for d in mistakes:
            for t, c in tf[d].items():
                w[t] += lr * y[d] * c
        w = Counter({t: v for t, v in w.items() if v != 0})
    return dict(w), bias, history


ROWS = [
    (1, "good clean prose with spark inside", 1),
    (2, "spark and more spark again", 1),
    (3, "dull spam spam spam text", -1),
    (4, "noise words without signal", -1),
    (5, "spark appears here too", 1),
    (6, "spam noise dull words", -1),
]


def _train(spark, rows, epochs=3, partitions=None, hash_tokens=True):
    df = spark.createDataFrame(rows, "doc_id: bigint, text: string, label: int")
    if partitions:
        df = df.repartition(partitions)
    w, bias, hist = perceptron_train(df, epochs=epochs, hash_tokens=hash_tokens)
    got = {r["token"]: r["weight_micros"] for r in w.collect()}
    w.unpersist()
    return got, bias, hist


def test_matches_sequential_twin(spark):
    got = _train(spark, ROWS, epochs=3)
    assert got == twin_train(ROWS, epochs=3)


def test_partitioning_invariance(spark):
    assert _train(spark, ROWS, epochs=2, partitions=5) == twin_train(
        ROWS, epochs=2
    )


def test_learns_planted_rule_and_stops(spark):
    w, bias, hist = _train(spark, ROWS, epochs=10)
    # the planted discriminative token carries the largest weight
    assert max(w, key=lambda t: w[t]) == "spark"
    # separable data: training reaches zero mistakes and stops early
    assert hist[-1]["n_mistakes"] == 0 and len(hist) < 10


def test_composes_with_classifier_score(spark):
    df = spark.createDataFrame(
        ROWS, "doc_id: bigint, text: string, label: int"
    )
    weights, bias, _ = perceptron_train(df, epochs=10)
    scored = classifier_score(
        df, weights=weights, bias_micros=bias, threshold_micros=1
    )
    got = {r["doc_id"]: r["keep"] for r in scored.collect()}
    weights.unpersist()
    assert got == {d: (lab == 1) for d, _, lab in ROWS}


def test_empty_and_whitespace_docs_twin(spark):
    # empty/whitespace-only docs never enter the tf cache (explode emits
    # no rows) but full-batch semantics still count them as mistakes
    # whenever y*(0+bias) <= 0 and fold their labels into the bias —
    # exercised here across epochs where bias moves through both signs
    rows = ROWS + [(7, "", 1), (8, "   ", -1), (9, "", -1)]
    for epochs in (1, 2, 3):
        assert _train(spark, rows, epochs=epochs) == twin_train(
            rows, epochs=epochs
        )


def test_randomized_twin_sweep(spark):
    import random

    rng = random.Random(11)
    vocab = [f"w{i}" for i in range(15)] + ["spark", "spam"]
    rows = []
    for i in range(30):
        toks = [vocab[rng.randrange(len(vocab))] for _ in range(rng.randrange(3, 12))]
        rows.append((i, " ".join(toks), 1 if "spark" in toks else -1))
    for epochs in (1, 2, 4):
        assert _train(spark, rows, epochs=epochs) == twin_train(
            rows, epochs=epochs
        )


def test_string_key_path_identical(spark):
    # hash_tokens=False keeps the string-keyed epochs (the collision-proof
    # escape hatch); both paths must be the same pure function of the corpus
    rows = ROWS + [(7, "", 1), (8, "   ", -1)]
    for epochs in (1, 3):
        assert _train(spark, rows, epochs=epochs, hash_tokens=False) == _train(
            spark, rows, epochs=epochs, hash_tokens=True
        ) == twin_train(rows, epochs=epochs)
