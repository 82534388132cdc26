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


def test_interval_count_join_boundaries(spark):
    from datetime import datetime

    from modern_document_converter_for_ai_library_spark.operators.asof import (
        interval_count_join,
    )

    t = lambda s, us=0: datetime(2024, 1, 1, 0, 0, s, us)
    left = spark.createDataFrame(
        [(1, 1, t(30)), (2, 1, t(50)), (3, 2, t(30))],
        ["event_id", "k", "ts"],
    )
    right = spark.createDataFrame(
        [
            (1, t(20)),          # within [20, 30) of left 1? 20 >= 30-10 -> yes
            (1, t(30)),          # == l.ts -> excluded (half-open)
            (1, t(20, 1)),       # 20.000001 -> within for left 1
            (1, t(40)),          # == l.ts - W for left 2 -> included (closed
                                 # lower bound), and sits in the PRIOR bin
            (1, t(5)),           # too early for everyone
            (2, t(29)),          # other key, within for left 3
        ],
        ["k", "ts"],
    )
    out = {
        r["event_id"]: r["n_in_window"]
        for r in interval_count_join(
            left, right, by="k", window_seconds=10
        ).collect()
    }
    assert out == {1: 2, 2: 1, 3: 1}


def test_interval_count_join_matches_pandas(spark):
    import numpy as np
    import pandas as pd

    from modern_document_converter_for_ai_library_spark.operators.asof import (
        interval_count_join,
    )

    rng = np.random.RandomState(11)
    base = pd.Timestamp("2024-01-01")
    lp = pd.DataFrame(
        {
            "event_id": np.arange(300, dtype="int64"),
            "k": rng.randint(0, 8, 300).astype("int64"),
            "ts": base + pd.to_timedelta(rng.randint(0, 5000, 300), unit="s")
            + pd.to_timedelta(rng.randint(0, 1_000_000, 300), unit="us"),
        }
    )
    rp = pd.DataFrame(
        {
            "k": rng.randint(0, 8, 500).astype("int64"),
            "ts": base + pd.to_timedelta(rng.randint(0, 5000, 500), unit="s")
            + pd.to_timedelta(rng.randint(0, 1_000_000, 500), unit="us"),
        }
    )
    W = pd.Timedelta(seconds=60)
    expect = {
        row.event_id: int(
            (
                (rp["k"] == row.k)
                & (rp["ts"] >= row.ts - W)
                & (rp["ts"] < row.ts)
            ).sum()
        )
        for row in lp.itertuples()
    }
    out = {
        r["event_id"]: r["n_in_window"]
        for r in interval_count_join(
            spark.createDataFrame(lp),
            spark.createDataFrame(rp),
            by="k",
            window_seconds=60,
        ).collect()
    }
    assert out == expect and sum(out.values()) > 0


def test_asof_chunked_equals_unchunked(spark):
    import numpy as np
    import pandas as pd

    rng = np.random.RandomState(23)
    base = pd.Timestamp("2024-01-01")
    mk = lambda n, payload: pd.DataFrame(
        {
            "k": rng.randint(0, 6, n).astype("int64"),
            "ts": base + pd.to_timedelta(rng.randint(0, 3600, n), unit="s")
            + pd.to_timedelta(rng.randint(0, 1_000_000, n), unit="us"),
            payload: np.arange(n, dtype="int64"),
        }
    )
    lp, rp = mk(250, "lid"), mk(200, "rid")
    # gap-bridging case: key 7 has rights only in the first minute,
    # lefts half an hour later (many right-free chunks in between)
    lp = pd.concat([lp, pd.DataFrame(
        {"k": [7, 7], "ts": [base + pd.Timedelta(minutes=30),
                             base + pd.Timedelta(minutes=40)],
         "lid": [9001, 9002]})])
    rp = pd.concat([rp, pd.DataFrame(
        {"k": [7], "ts": [base + pd.Timedelta(seconds=10)], "rid": [9003]})])
    left, right = spark.createDataFrame(lp), spark.createDataFrame(rp)
    plain = {
        r["lid"]: r["r_rid"]
        for r in asof_join(left, right, by="k").collect()
    }
    chunked = {
        r["lid"]: r["r_rid"]
        for r in asof_join(left, right, by="k", chunk_seconds=60).collect()
    }
    assert plain == chunked
    assert chunked[9001] == 9003 and chunked[9002] == 9003  # bridged gap


def test_interval_count_join_duplicate_left_rows_and_numeric_ts(spark):
    from modern_document_converter_for_ai_library_spark.operators.asof import (
        interval_count_join,
    )

    # two IDENTICAL left rows must each get their own output row with the
    # un-doubled count (regression: grouping on left columns collapsed
    # them into one row with n=2); ts here is numeric epoch seconds,
    # which the binning must also accept
    left = spark.createDataFrame([(1, 30), (1, 30)], ["k", "ts"])
    right = spark.createDataFrame([(1, 25)], ["k", "ts"])
    rows = interval_count_join(
        left, right, by="k", window_seconds=10
    ).collect()
    assert len(rows) == 2
    assert [r["n_in_window"] for r in rows] == [1, 1]


def test_asof_chunked_numeric_ts(spark):
    left = spark.createDataFrame([(1, 100, "l")], ["k", "ts", "lv"])
    right = spark.createDataFrame([(1, 40, "r")], ["k", "ts", "rv"])
    out = asof_join(left, right, by="k", chunk_seconds=10).collect()
    assert out[0]["r_rv"] == "r"  # bridged across 6 numeric chunks
