"""Content-defined chunking dedup stats (operators/chunking.py:
cdc_dup_stats): pure-Python twin, the resynchronization property a
shifted near-copy exercises (the reason CDC exists), null/empty docs,
and partitioning invariance."""

import hashlib
import random

from modern_document_converter_for_ai_library_spark.operators.chunking import cdc_dup_stats

WINDOW = 4
DIVISOR = 16


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _py_chunks(text, window=WINDOW, divisor=DIVISOR):
    toks = [t for t in (text or "").split(" ") if t]
    chunks, cur = [], []
    for i, tok in enumerate(toks):
        cur.append(tok)
        if i >= window - 1:
            gram = "\x1f".join(toks[i - window + 1 : i + 1])
            if _h60(gram) % divisor == 0:
                chunks.append(cur)
                cur = []
    if cur:
        chunks.append(cur)
    # the operator's O(1)-state chunk key: (sum of 40-bit md5 of
    # (rel-position, token), length) — order-sensitive, commutative
    keys = []
    for c in chunks:
        s = sum(
            int(
                hashlib.md5(("%d\x1f%s" % (rel, tok)).encode()).hexdigest()[:10],
                16,
            )
            for rel, tok in enumerate(c)
        )
        keys.append("%d_%d" % (s, len(c)))
    return keys


def _py_cdc(rows):
    by_doc = {d: _py_chunks(t) for d, t in rows}
    freq: dict = {}
    for chunks in by_doc.values():
        for c in chunks:
            freq[c] = freq.get(c, 0) + 1
    out = {}
    for d, chunks in by_doc.items():
        n = len(chunks)
        dup = sum(1 for c in chunks if freq[c] >= 2)
        out[d] = (n, dup, (1000000 * dup // n) if n else 0)
    return out


def _words(seed, n):
    rng = random.Random(seed)
    return " ".join("w%03d" % rng.randrange(400) for _ in range(n))


ROWS = [
    ("a", _words(1, 200)),
    ("b", "PREFIX INSERTED " + _words(1, 200)),  # shifted near-copy of a
    ("c", _words(2, 150)),
    ("d", _words(3, 3)),  # shorter than the window: one whole-doc chunk
    ("e", ""),
    ("f", None),
]


def test_matches_python_twin(spark):
    df = spark.createDataFrame(ROWS, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["n_chunks"], r["dup_chunks"], r["dup_micros"])
        for r in cdc_dup_stats(df, window=WINDOW, divisor=DIVISOR).collect()
    }
    assert got == _py_cdc(ROWS)


def test_shifted_copy_resynchronizes(spark):
    # the CDC property: after the edit neighborhood, boundaries depend
    # only on local content, so the shifted copy shares most chunks
    exp = _py_cdc(ROWS)
    n_a, dup_a, _ = exp["a"]
    n_b, dup_b, _ = exp["b"]
    assert n_a > 5  # corpus long enough for several boundaries
    # most of a's chunks recur in b (and vice versa)
    assert dup_a >= n_a - 2
    assert dup_b >= n_b - 2
    # and the unrelated doc shares nothing
    assert exp["c"][1] == 0
    # Spark agrees (twin equality already asserted; pin the property on
    # the Spark output too so a twin bug cannot hide it)
    df = spark.createDataFrame(ROWS, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["n_chunks"], r["dup_chunks"])
        for r in cdc_dup_stats(df).collect()
    }
    assert got["a"][1] >= got["a"][0] - 2
    assert got["c"][1] == 0


def test_tokenless_docs_present_with_zero_stats(spark):
    df = spark.createDataFrame(ROWS, ["doc_id", "text"])
    got = {r["doc_id"]: tuple(r)[1:] for r in cdc_dup_stats(df).collect()}
    assert got["e"] == (0, 0, 0)
    assert got["f"] == (0, 0, 0)
    assert len(got) == len(ROWS)  # every doc present exactly once


def test_partitioning_invariance(spark):
    df = spark.createDataFrame(ROWS, ["doc_id", "text"])
    r1 = {tuple(r) for r in cdc_dup_stats(df.repartition(7)).collect()}
    r2 = {tuple(r) for r in cdc_dup_stats(df.repartition(2)).collect()}
    assert r1 == r2
