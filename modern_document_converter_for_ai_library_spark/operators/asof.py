"""As-of join: for every left row, the latest right row with
right.ts <= left.ts within the same key group.

Spark has no native ASOF JOIN (DuckDB/Pandas/kdb do). The naive
re-expressions both fail at 100 TB:

  - range join (l.key = r.key AND r.ts <= l.ts) + max-per-left: the join
    fans out to every EARLIER right row per left row — quadratic in
    per-key history length before the aggregate prunes it;
  - per-key collect + binary search in a UDF: materializes whole key
    histories in Python memory.

The scalable formulation is the tagged-union window trick: union both
sides into one frame (right rows tagged 0, left rows tagged 1), shuffle
ONCE on the key, and compute last(right_payload, ignorenulls=True) over
(key ORDER BY ts, tag, right-tiebreak ROWS UNBOUNDED PRECEDING .. CURRENT).
Each left row reads the most recent right payload at-or-before its
timestamp (tag 0 < 1 makes an equal-timestamp right row visible). Cost:
one hash exchange + one per-key sort — the same plan shape as any
windowed aggregation, no fan-out, no driver state.

Reference parity note: the reference repo has no temporal-join code; this
operator exists for the training-pipeline/events tier (SURVEY.md §2
addendum).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import DateType, TimestampNTZType, TimestampType

_TEMPORAL = (TimestampType, TimestampNTZType, DateType)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: str,
    ts_col: str = "ts",
    right_prefix: str = "r_",
    chunk_seconds: int | None = None,
) -> DataFrame:
    """Left as-of join. Output: every ``left`` row plus the payload columns
    of the matched right row aliased ``{right_prefix}{col}`` (NULL when no
    right row precedes it).

    Ties: among right rows sharing the match timestamp the one with the
    greatest remaining payload (struct comparison in column order) wins —
    deterministic under any partitioning. Dedupe the right side first if
    a different tie policy is needed.

    ``chunk_seconds`` is the SKEW escape hatch: the default plan sorts
    each key's whole history in one window partition, so one giant key
    (a bot user, a default/null key) serializes on a single task. With
    chunking, windows run per (key, time-chunk) — parallelism is keys x
    chunks — and a second, TINY pass (one row per key-chunk) computes the
    carry: the last right payload of any earlier chunk, joined back on
    the same (key, chunk) key the windows already shuffled on. Identical
    output to the unchunked plan (pinned by test).
    """
    r_payload = [c for c in right.columns if c not in (by, ts_col)]
    if not r_payload:
        raise ValueError("right side needs at least one payload column")
    l_cols = list(left.columns)

    tagged_r = right.select(
        F.col(by),
        F.col(ts_col).alias("_ts"),
        F.lit(0).alias("_tag"),
        F.struct(*[F.col(c) for c in r_payload]).alias("_rp"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"_l_{c}") for c in l_cols],
    )
    tagged_l = left.select(
        F.col(by),
        F.col(ts_col).alias("_ts"),
        F.lit(1).alias("_tag"),
        F.lit(None).cast(tagged_r.schema["_rp"].dataType).alias("_rp"),
        *[F.col(c).alias(f"_l_{c}") for c in l_cols],
    )
    unioned = tagged_r.unionByName(tagged_l)
    # ORDER BY (_ts, _tag, _rp): right rows sort before the left row they
    # may match at equal _ts; among equal-_ts right rows the greatest
    # payload struct is nearest the current row, so last() picks it
    if chunk_seconds is None:
        w = (
            Window.partitionBy(by)
            .orderBy("_ts", "_tag", "_rp")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        matched = unioned.withColumn(
            "_match", F.last("_rp", ignorenulls=True).over(w)
        ).filter(F.col("_tag") == 1)
    else:
        if chunk_seconds <= 0:
            raise ValueError("chunk_seconds must be positive")
        # numeric ts columns (epoch seconds) chunk by plain division —
        # unix_timestamp only accepts temporal types
        ts_numeric = not isinstance(
            left.schema[ts_col].dataType, _TEMPORAL
        )
        epoch = F.col("_ts") if ts_numeric else F.unix_timestamp("_ts")
        unioned = unioned.withColumn(
            "_chunk", F.floor(epoch / chunk_seconds)
        )
        wl = (
            Window.partitionBy(by, "_chunk")
            .orderBy("_ts", "_tag", "_rp")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        local = unioned.withColumn(
            "_local", F.last("_rp", ignorenulls=True).over(wl)
        )
        # carry pass: ONE row per (key, chunk) — chunks that hold only
        # left rows still emit a row (with NULL last payload) so the
        # running last() below bridges right-free gaps
        chunk_last = unioned.groupBy(by, "_chunk").agg(
            F.max(
                F.when(
                    F.col("_rp").isNotNull(),
                    F.struct("_ts", "_rp"),
                )
            )["_rp"].alias("_chunk_last")
        )
        wc = (
            Window.partitionBy(by)
            .orderBy("_chunk")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        carry = chunk_last.withColumn(
            "_carry", F.last("_chunk_last", ignorenulls=True).over(wc)
        ).select(by, "_chunk", "_carry")
        matched = (
            local.join(carry, on=[by, "_chunk"], how="left")
            .withColumn("_match", F.coalesce("_local", "_carry"))
            .filter(F.col("_tag") == 1)
        )
    return matched.select(
        *[F.col(f"_l_{c}").alias(c) for c in l_cols],
        *[
            F.col("_match")[c].alias(f"{right_prefix}{c}")
            for c in r_payload
        ],
    )


def interval_count_join(
    left: DataFrame,
    right: DataFrame,
    by: str,
    ts_col: str = "ts",
    window_seconds: int = 600,
    count_alias: str = "n_in_window",
) -> DataFrame:
    """For every left row: how many right rows share its key with
    ``right.ts in [left.ts - window, left.ts)``. Output = left columns +
    the count (0 when none).

    A plain inequality join (l.key = r.key AND r.ts BETWEEN ...) hashes
    only on the key: every left row meets every right row of that key
    before the range filter — quadratic in per-key history, the classic
    range-join blowup (closed-source Spark distros ship a RANGE_JOIN hint
    for this; OSS Spark does not). The scalable OSS shape is BUCKET
    BINNING: bin right rows by floor(epoch/W); a match at width W can
    only sit in the left row's bin or the one before, so each left row
    joins exactly 2 composite keys (key, bin) and the fan-out is bounded
    by per-bin occupancy — proportional to event rate times W, not
    history length. Truncated-second binning is safe for microsecond
    timestamps: r.ts >= l.ts - W implies floor-second bins differ by at
    most W/W = 1 for integer W (the precise range predicate still runs on
    the raw timestamps as the join's post-match filter).

    Plan: one shuffle keyed (key, bin) for the join, one partial-agg
    shuffle keyed by the left row for the count. Left rows appear twice
    (two candidate bins, left join) and regroup to one output row;
    count() only counts matched right rows.
    """
    w = int(window_seconds)
    if w <= 0:
        raise ValueError("window_seconds must be positive")
    l_cols = list(left.columns)
    ts_numeric = not isinstance(left.schema[ts_col].dataType, _TEMPORAL)
    epoch = (
        (lambda c: F.col(c)) if ts_numeric else (lambda c: F.unix_timestamp(c))
    )
    lb = F.floor(epoch(ts_col) / w)
    # surrogate per-row id: grouping on the left COLUMNS would collapse
    # duplicate left rows into one output row with a doubled count
    # (partition-position based, deterministic for a deterministic input
    # partitioning; never exposed in the output)
    ex_left = left.withColumn(
        "_lid", F.monotonically_increasing_id()
    ).select(
        "_lid",
        *[F.col(c).alias(f"_l_{c}") for c in l_cols],
        F.col(ts_col).alias("_lts"),
        F.col(by).alias("_lby"),
        F.explode(F.array(lb - 1, lb)).alias("_bin"),
    )
    tagged_r = right.select(
        F.col(by).alias("_rby"),
        F.floor(epoch(ts_col) / w).alias("_bin"),
        F.col(ts_col).alias("_rts"),
    )
    win = F.lit(w) if ts_numeric else F.expr(f"INTERVAL {w} SECONDS")
    cond = (
        (F.col("_lby") == F.col("_rby"))
        & (ex_left["_bin"] == tagged_r["_bin"])
        & (F.col("_rts") >= F.col("_lts") - win)
        & (F.col("_rts") < F.col("_lts"))
    )
    joined = ex_left.join(tagged_r, cond, how="left")
    return (
        joined.groupBy("_lid")
        .agg(
            *[F.first(f"_l_{c}").alias(c) for c in l_cols],
            F.count("_rts").cast("bigint").alias(count_alias),
        )
        .select(*l_cols, count_alias)
    )
