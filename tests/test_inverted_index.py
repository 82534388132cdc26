"""Tests for the skew-safe inverted-index builder: the two-phase top-K
must equal the single-window form on any input, including a planted
stopword-class token that hits every document."""

from pyspark.sql import Window
from pyspark.sql import functions as F

from modern_document_converter_for_ai_library_spark.operators.inverted_index import (
    build_inverted_index,
)


def _single_window(df, top_k=5):
    toks = df.select(
        F.col("doc_id").cast("bigint").alias("did"),
        F.explode(F.filter(F.split("text", " "), lambda x: x != "")).alias("token"),
    )
    postings = toks.groupBy("token", "did").agg(F.count("*").cast("bigint").alias("tf"))
    w = Window.partitionBy("token").orderBy(F.col("tf").desc(), F.col("did").asc())
    top = postings.withColumn("_r", F.row_number().over(w)).filter(F.col("_r") <= top_k)
    top_agg = top.groupBy("token").agg(
        F.concat_ws(
            ",",
            F.transform(
                F.array_sort(F.collect_list(F.struct(F.col("_r").alias("r"), "did"))),
                lambda s: s["did"].cast("string"),
            ),
        ).alias("top_docs")
    )
    dfreq = postings.groupBy("token").agg(
        F.count("*").cast("bigint").alias("doc_frequency")
    )
    return dfreq.join(top_agg, on="token").select("token", "doc_frequency", "top_docs")


def _corpus(spark):
    rows = []
    for i in range(120):
        # 'the' in every doc with tf varying; 'rare{i%7}' clustered;
        # tf ties on 'the' force the doc_id tie-break
        body = ("the " * (1 + i % 3)) + f"rare{i % 7} " + f"uniq{i}"
        rows.append((i, body.strip()))
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_two_phase_equals_single_window(spark):
    df = _corpus(spark)
    got = {r["token"]: r for r in build_inverted_index(df).collect()}
    exp = {r["token"]: r for r in _single_window(df).collect()}
    assert set(got) == set(exp)
    for t in exp:
        assert got[t]["doc_frequency"] == exp[t]["doc_frequency"], t
        assert got[t]["top_docs"] == exp[t]["top_docs"], t


def test_hot_token_caps_and_counts(spark):
    df = _corpus(spark)
    row = [r for r in build_inverted_index(df).collect() if r["token"] == "the"][0]
    assert row["doc_frequency"] == 120  # every doc
    docs = row["top_docs"].split(",")
    assert len(docs) == 5
    # tf=3 docs (i % 3 == 2) win, lowest doc_id first
    assert docs == ["2", "5", "8", "11", "14"]


def test_salt_boundaries(spark):
    # n_salts larger than docs and equal to 1 both reduce to the exact form
    df = _corpus(spark)
    base = {r["token"]: r["top_docs"] for r in _single_window(df).collect()}
    for n_salts in (1, 256):
        got = {
            r["token"]: r["top_docs"]
            for r in build_inverted_index(df, n_salts=n_salts).collect()
        }
        assert got == base, n_salts


def test_string_doc_ids_do_not_collapse(spark):
    # ids that are not numeric must not null out into one merged posting
    df = spark.createDataFrame(
        [("doc_a", "the x"), ("doc_b", "the y"), ("doc_c", "the the z")],
        ["doc_id", "text"],
    )
    got = {r["token"]: r for r in build_inverted_index(df).collect()}
    assert got["the"]["doc_frequency"] == 3
    assert got["the"]["top_docs"] == "doc_c,doc_a,doc_b"  # tf desc, id asc
    assert got["x"]["top_docs"] == "doc_a"


def test_single_corpus_scan(spark):
    # doc_frequency must ride the phase-1 shuffle, not re-tokenize the
    # corpus: exactly one Generate (explode) in the final adaptive plan,
    # and the two phase-1 windows share one (token, salt) Exchange
    df = _corpus(spark)
    out = build_inverted_index(df)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    final = plan.split("+- == Initial Plan ==")[0]
    assert final.count("Generate") == 1, final
    assert final.count("Exchange hashpartitioning") <= 3, final
