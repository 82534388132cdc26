"""exact_substring_removal — cross-document duplicated-span excision
(the ExactSubstr move of Lee et al. 2022, arXiv:2107.06499, over sliding
token n-grams). Checked against a sequential pure-Python twin on planted
corpora: cross-doc repeats at arbitrary alignment, within-doc repeats,
overlapping windows merging into one cut, short and empty docs."""

import hashlib

import pytest

from modern_document_converter_for_ai_library_spark.operators.dedup import (
    exact_substring_removal,
)


def _twin(docs: dict[int, str], n: int) -> dict[int, tuple[int, int, str]]:
    """Sequential reference: same winner rule (global min (doc_id, pos)),
    same coverage semantics, no Spark."""
    occ: dict[str, list[tuple[int, int]]] = {}
    toks = {d: [t for t in text.split(" ") if t] for d, text in docs.items()}
    for d in sorted(toks):
        ts = toks[d]
        for p in range(1, len(ts) - n + 2):
            g = hashlib.md5(" ".join(ts[p - 1 : p - 1 + n]).encode()).hexdigest()
            occ.setdefault(g, []).append((d, p))
    out = {}
    for d, ts in toks.items():
        removed = set()
        for g, places in occ.items():
            if len(places) < 2:
                continue
            first = min(places)
            for dd, p in places:
                if dd == d and (dd, p) != first:
                    removed.update(range(p, p + n))
        kept = [t for i, t in enumerate(ts, start=1) if i not in removed]
        out[d] = (len(ts), len(ts) - len(kept), " ".join(kept))
    return out


def _run(spark, docs: dict[int, str], n: int):
    df = spark.createDataFrame(
        sorted(docs.items()), ["doc_id", "text"]
    )
    rows = exact_substring_removal(df, n=n).collect()
    return {r["doc_id"]: (r["n_tokens"], r["n_removed"], r["text_clean"]) for r in rows}


def test_cross_doc_span_removed_first_copy_survives(spark):
    shared = " ".join(f"s{i}" for i in range(25))
    docs = {
        1: "alpha beta " + shared + " gamma delta",
        2: "x1 x2 x3 x4 x5 " + shared + " y1 y2",
        3: "plain unique words only here nothing shared at all",
    }
    got = _run(spark, docs, n=20)
    assert got == _twin(docs, 20)
    # doc 1 holds the global first occurrence -> intact
    assert got[1][1] == 0 and got[1][2] == docs[1]
    # doc 2 loses exactly the shared run (coverage of the duplicate grams)
    assert got[2][1] == 25
    assert "s0" not in got[2][2] and got[2][2].startswith("x1")
    assert got[3] == (9, 0, docs[3])


def test_within_doc_repeat_keeps_first_occurrence(spark):
    run = " ".join(f"r{i}" for i in range(20))
    docs = {7: run + " middle filler words " + run}
    got = _run(spark, docs, n=20)
    assert got == _twin(docs, 20)
    n_tokens, n_removed, clean = got[7]
    assert n_tokens == 43 and n_removed == 20
    assert clean == run + " middle filler words"


def test_overlapping_duplicate_windows_merge_into_one_cut(spark):
    # 22 shared tokens -> three overlapping duplicate 20-grams in doc 2;
    # the folded intervals must merge, not double-remove
    shared = " ".join(f"o{i}" for i in range(22))
    docs = {1: shared, 2: "pre " + shared + " post"}
    got = _run(spark, docs, n=20)
    assert got == _twin(docs, 20)
    assert got[2] == (24, 22, "pre post")


def test_short_and_empty_docs_pass_through(spark):
    docs = {1: "just a few tokens", 2: "", 3: "   ", 4: "single"}
    got = _run(spark, docs, n=20)
    assert got == _twin(docs, 20)
    assert got[1] == (4, 0, "just a few tokens")
    assert got[2] == (0, 0, "")
    assert got[3] == (0, 0, "")


def test_bloom_prefilter_is_semantically_invisible(spark):
    """prefilter_bits only thins the dup-join's shuffle input; false
    positives fail the inner join, the bloom has no false negatives —
    so the output must be IDENTICAL to the unfiltered plan, token for
    token, including with a deliberately tiny (collision-rich) filter."""
    import random

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(8)]
    docs = {
        d: " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 15)))
        for d in range(1, 30)
    }
    shared = " ".join(f"s{i}" for i in range(23))
    docs[100] = "aa bb " + shared
    docs[101] = shared + " zz"
    df = spark.createDataFrame(sorted(docs.items()), ["doc_id", "text"])
    for bits in (64, 1 << 16):  # 64 bits = near-total FP saturation
        plain = {
            r["doc_id"]: tuple(r)
            for r in exact_substring_removal(df, n=3).collect()
        }
        pre = {
            r["doc_id"]: tuple(r)
            for r in exact_substring_removal(
                df, n=3, prefilter_bits=bits
            ).collect()
        }
        assert pre == plain


@pytest.mark.parametrize("n", [2, 3])
def test_randomized_against_twin(spark, n):
    import random

    rng = random.Random(42)
    vocab = [f"w{i}" for i in range(6)]
    docs = {
        d: " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 12)))
        for d in range(1, 25)
    }
    assert _run(spark, docs, n=n) == _twin(docs, n)
