"""Broadcast court/reporter dimension joins (J1/J2)."""

import pytest

from modern_document_converter_for_ai_library_spark.operators.dims import (
    courts_dim,
    reporters_dim,
    resolve_courts,
    resolve_reporters,
)


def test_dims_load(spark):
    c = courts_dim(spark)
    r = reporters_dim(spark)
    assert c.count() > 200  # 202 courts, more (court, pattern) rows
    assert r.count() == 51
    assert {"bluebook", "filename_code", "pattern_lc"} <= set(c.columns)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "Before the Supreme Court of the United States in October"),
        (2, "Appeal from the Eleventh Circuit panel decision"),
        (3, "No court is mentioned in this text at all"),
        (4, "Cited as 328 Ga. App. 524 and later 759 S.E.2d 654"),
        (5, "See 564 U.S. 91 (2011) and 131 S. Ct. 2541"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_resolve_courts(spark, docs):
    out = {r["doc_id"]: r for r in resolve_courts(docs).collect()}
    assert out[1]["bluebook"] == "U.S."
    assert out[1]["filename_code"] == "US"
    assert out[2]["bluebook"] == "11th Cir."
    assert out[3]["bluebook"] is None
    assert len(out) == 5  # left join keeps all docs


def test_resolve_courts_plan_is_broadcast(spark, docs):
    plan = resolve_courts(docs)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_resolve_reporters(spark, docs):
    out = {r["doc_id"]: r for r in resolve_reporters(docs).collect()}
    assert out[4]["reporter_abbrev"] is not None
    # doc 5 cites U.S. (official, priority 1) and S. Ct. (priority 2):
    # priority order must pick U.S.
    assert out[5]["reporter_abbrev"] == "U.S."
    assert out[5]["reporter_official"] is True
    assert out[3]["reporter_abbrev"] is None
