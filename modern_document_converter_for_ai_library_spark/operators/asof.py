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


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: str,
    ts_col: str = "ts",
    right_prefix: str = "r_",
) -> DataFrame:
    """Left as-of join. Output: every ``left`` row plus the payload columns
    of the matched right row aliased ``{right_prefix}{col}`` (NULL when no
    right row precedes it).

    Ties: among right rows sharing the match timestamp the one with the
    greatest remaining payload (struct comparison in column order) wins —
    deterministic under any partitioning. Dedupe the right side first if
    a different tie policy is needed.
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
    w = (
        Window.partitionBy(by)
        .orderBy("_ts", "_tag", "_rp")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = unioned.withColumn(
        "_match", F.last("_rp", ignorenulls=True).over(w)
    ).filter(F.col("_tag") == 1)
    return matched.select(
        *[F.col(f"_l_{c}").alias(c) for c in l_cols],
        *[
            F.col("_match")[c].alias(f"{right_prefix}{c}")
            for c in r_payload
        ],
    )
