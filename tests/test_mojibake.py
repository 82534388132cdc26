"""Mojibake repair (functions/mojibake.py): codec-computed table, full
round-trip recovery, ASCII no-op, idempotence on clean text, and the
cp1252-undefined-byte fallback path."""

from modern_document_converter_for_ai_library_spark.functions.mojibake import (
    _mojibake_of,
    fix_mojibake_col,
    mojibake_pairs,
)


def _py_fix(s: str) -> str:
    for m, f in mojibake_pairs():
        s = s.replace(m, f)
    return s


def test_table_is_codec_derived_and_longest_first():
    pairs = mojibake_pairs()
    assert len(pairs) == len({m for m, _ in pairs})  # keys unique
    lens = [len(m) for m, _ in pairs]
    assert lens == sorted(lens, reverse=True)
    # every key is the actual UTF-8->cp1252 image of its repair
    for moji, fixed in pairs:
        assert _mojibake_of(fixed) == moji
        assert len(fixed) == 1


def test_roundtrip_recovers_exact_text(spark):
    texts = [
        "café — très “étrange” … ßü€",
        "naïve façade: 3€ • «déjà» ‘vu’",
        "Größe · ±nothing±",  # ± not in the table: untouched either way
        "",
    ]
    rows = [(i, _mojibake_of(t)) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, ["id", "text"])
    got = {
        r["id"]: r["fixed"]
        for r in df.select("id", fix_mojibake_col("text").alias("fixed")).collect()
    }
    table = {f for _, f in mojibake_pairs()}
    for i, t in enumerate(texts):
        assert got[i] == _py_fix(_mojibake_of(t))
        if all(ord(c) < 128 or c in table for c in t):
            # full recovery whenever every non-ASCII char is in the table
            assert got[i] == t
    assert any(c not in table and ord(c) >= 128 for c in texts[2])  # ± case


def test_ascii_and_clean_text_untouched(spark):
    rows = [(1, "plain ascii text, nothing here"), (2, "already clean café — fine")]
    df = spark.createDataFrame(rows, ["id", "text"])
    got = {
        r["id"]: r["fixed"]
        for r in df.select("id", fix_mojibake_col("text").alias("fixed")).collect()
    }
    assert got[1] == rows[0][1]
    assert got[2] == rows[1][1]  # repaired chars are not re-damaged


def test_ambiguous_clean_digraph_policy():
    # a mojibake key is itself valid text: clean "Â©" is
    # indistinguishable from mis-decoded "©" and the table takes the
    # mis-decode reading (the ftfy default) — pinned so the trade-off
    # stays a decision, not an accident
    assert _py_fix("Â© 2020") == "© 2020"
    # one pass peels ONE damage layer: double-mojibake © needs a second
    # pass, and double-mojibake é is out of this table's reach entirely
    # (its outer layer exposes "Ãƒ", whose target Ã is not covered)
    m2 = _mojibake_of(_mojibake_of("©"))
    assert _py_fix(m2) == "Â©"
    assert _py_fix(_py_fix(m2)) == "©"


def test_cp1252_undefined_bytes_fall_back_to_latin1():
    # ” is E2 80 9D; 0x9D is undefined in cp1252 and must pass through
    # as U+009D (the lenient-decoder behavior), not raise
    moji = _mojibake_of("”")
    assert moji[-1] == "\x9d"
    assert _py_fix(moji) == "”"


def test_plan_is_map_only(spark):
    df = spark.createDataFrame([(1, "x")], ["id", "text"])
    plan = (
        df.select(fix_mojibake_col("text"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan and "BatchEvalPython" not in plan
