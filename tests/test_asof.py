"""As-of join: hand cases (equal-timestamp inclusion, no-match, per-key
isolation), a randomized differential against pandas.merge_asof, and the
plan shape (one window shuffle, no join node, no fan-out)."""

import numpy as np
import pandas as pd

from modern_document_converter_for_ai_library_spark.operators.asof import (
    asof_join,
)


def test_asof_hand_cases(spark):
    left = spark.createDataFrame(
        [
            (1, 10, "l-a"),   # matched by the equal-ts right row
            (1, 5, "l-b"),    # before every right row -> NULL
            (2, 100, "l-c"),  # other key: matched by key-2 row only
            (3, 50, "l-d"),   # key with no right rows -> NULL
        ],
        ["k", "ts", "lv"],
    )
    right = spark.createDataFrame(
        [(1, 8, "r-early"), (1, 10, "r-equal"), (2, 99, "r-two")],
        ["k", "ts", "rv"],
    )
    out = {
        r["lv"]: r["r_rv"]
        for r in asof_join(left, right, by="k", ts_col="ts").collect()
    }
    assert out == {
        "l-a": "r-equal",  # at-or-before includes the equal timestamp
        "l-b": None,
        "l-c": "r-two",
        "l-d": None,
    }


def test_asof_matches_pandas_merge_asof(spark):
    rng = np.random.RandomState(7)
    n_l, n_r = 400, 300
    lp = pd.DataFrame(
        {
            "k": rng.randint(0, 12, n_l).astype("int64"),
            "ts": rng.randint(0, 1000, n_l).astype("int64"),
            "lid": np.arange(n_l, dtype="int64"),
        }
    )
    rp = pd.DataFrame(
        {
            "k": rng.randint(0, 12, n_r).astype("int64"),
            "ts": rng.randint(0, 1000, n_r).astype("int64"),
            "rid": np.arange(n_r, dtype="int64"),
        }
    )
    # dedupe right per (k, ts) with max rid — the deterministic tie policy
    rp = rp.sort_values(["k", "ts", "rid"]).groupby(["k", "ts"], as_index=False).last()
    expect = pd.merge_asof(
        lp.sort_values("ts"),
        rp.sort_values("ts"),
        on="ts",
        by="k",
        direction="backward",
    ).set_index("lid")["rid"]
    out = asof_join(
        spark.createDataFrame(lp), spark.createDataFrame(rp), by="k"
    ).toPandas().set_index("lid")["r_rid"]
    for lid in lp["lid"]:
        e = expect.loc[lid]
        g = out.loc[lid]
        assert (pd.isna(e) and pd.isna(g)) or e == g, (lid, e, g)


def test_asof_plan_one_shuffle_no_join(spark):
    left = spark.createDataFrame([(1, 10, 5)], ["k", "ts", "lv"])
    right = spark.createDataFrame([(1, 8, 6)], ["k", "ts", "rv"])
    plan = (
        asof_join(left, right, by="k")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan
    assert plan.count("Exchange") == 1  # the single key shuffle
    assert "Window" in plan
