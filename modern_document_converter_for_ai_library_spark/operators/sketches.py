"""Mergeable sketches for corpus-scale aggregation (count-min,
HyperLogLog) — the sublinear-state alternative to exact groupBys at
100 TB.

Both sketches are DETERMINISTIC here: hash functions are md5-derived
(row-salted for count-min, single for HLL), and every derived statistic —
including the HLL cardinality estimate — is computed in exact integer
arithmetic, so a DuckDB oracle reproduces identical rows (the usual
float harmonic-mean HLL estimator would ulp-drift across engines; the
scaled-power-of-two trick in :func:`hll_register_table` avoids floats
entirely: alpha = 709/1000 folds into the numerator because
MICRO/1000 = 1000 stays integral).

Scale shape:
  count-min   one explode (d rows per item) + one groupBy capped at
              d*w cells — the sketch table is tiny and broadcastable;
              estimates are a broadcast join + min aggregation. Merging
              two sketches = cell-wise SUM (the linear-sketch property),
              so per-partition/per-day sketches union + re-aggregate
              without touching raw data again.
  HLL         one groupBy over (group, bucket) with a MAX partial
              aggregate — state is m registers per group regardless of
              cardinality. Merging = register-wise MAX.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MICRO = 1_000_000


def _salted_bucket(item_col, salt_col, width: int):
    """md5-derived bucket for the row-salted family h_k(x) = md5(k || x),
    identical in Spark and DuckDB."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(salt_col.cast("string"), item_col)), 1, 8),
            16,
            10,
        ).cast("bigint")
        % width
    )


def cms_build(
    df: DataFrame, item_col: str, depth: int = 4, width: int = 1024
) -> DataFrame:
    """Count-min sketch of item frequencies: ``depth`` salted hash rows x
    ``width`` counters. Returns the sparse cell table (row, bucket, cnt)
    — at most depth*width rows after the single groupBy, regardless of
    input size."""
    rows = F.array(*[F.lit(k) for k in range(depth)])
    cells = df.select(
        F.col(item_col).alias("_item"), F.explode(rows).alias("row")
    ).select("row", _salted_bucket(F.col("_item"), F.col("row"), width).alias("bucket"))
    sketch = cells.groupBy("row", "bucket").agg(
        F.count("*").cast("bigint").alias("cnt")
    )
    # carry (depth, width) in the plan's schema metadata so a point-query
    # with mismatched parameters fails loudly instead of under-estimating
    return sketch.withMetadata("cnt", {"cms_depth": depth, "cms_width": width})


def cms_estimate(
    sketch: DataFrame,
    candidates: DataFrame,
    item_col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Point-query the sketch for each candidate item: the classic
    min-over-rows estimate. The sketch side is bounded (d*w cells) and
    broadcast; missing cells read 0. Guarantee: estimate >= true count,
    always (cells only over-count) — asserted in tests. The guarantee
    only holds when (depth, width) match the build; a sketch built by
    :func:`cms_build` carries them in schema metadata and a mismatch
    raises here instead of silently under-estimating."""
    from pyspark.sql.functions import broadcast

    meta = sketch.schema["cnt"].metadata if "cnt" in sketch.columns else {}
    if meta.get("cms_depth") is not None and (
        meta["cms_depth"] != depth or meta["cms_width"] != width
    ):
        raise ValueError(
            "cms_estimate(depth=%d, width=%d) does not match the sketch's "
            "build parameters (depth=%d, width=%d)"
            % (depth, width, meta["cms_depth"], meta["cms_width"])
        )

    rows = F.array(*[F.lit(k) for k in range(depth)])
    probes = (
        candidates.select(F.col(item_col).alias("item"))
        .distinct()
        .select("item", F.explode(rows).alias("row"))
        .select(
            "item",
            "row",
            _salted_bucket(F.col("item"), F.col("row"), width).alias("bucket"),
        )
    )
    joined = probes.join(broadcast(sketch), on=["row", "bucket"], how="left").select(
        "item", F.coalesce("cnt", F.lit(0)).alias("cnt")
    )
    return joined.groupBy("item").agg(
        F.min("cnt").cast("bigint").alias("cms_estimate")
    )


# HLL: m = 2^p buckets; bucket = hash % m, the remaining REM_BITS bits
# feed the rank (leading-zero count + 1, REM_BITS + 1 when zero).
HLL_P = 6
HLL_M = 1 << HLL_P  # 64 buckets
_REM_BITS = 32 - HLL_P  # 26
_SCALE_BITS = _REM_BITS + 1  # 27: keeps 2^(SCALE_BITS - r) integral, r <= 27
_SCALE = 1 << _SCALE_BITS
# alpha_64 = 0.709 (Flajolet et al. 2007). estimate = alpha * m^2 / harm
# in micros: 709/1000 * m^2 * SCALE * 1e6 = 709 * m^2 * SCALE * 1000 —
# exactly integral, and 3.9e17 < 2^63
_EST_NUM = 709 * HLL_M * HLL_M * _SCALE * 1000


def log2_histogram(
    df: DataFrame, value_col: str, group_col: str | None = None
) -> DataFrame:
    """HDR-style log2 histogram: bucket = bit_length(value) (0 for
    value <= 0), at most 64 cells per group regardless of input size.
    Mergeable by cell-wise SUM — per-shard/per-day histograms combine
    without re-reading raw data. One partial-aggregated groupBy.
    NULL values carry no magnitude and are dropped (same rationale as
    hll_registers: a NULL cell would inflate n and shift every
    cumulative rank in histogram_quantiles)."""
    gcols = [group_col] if group_col else []
    v = F.col(value_col).cast("bigint")
    bucket = F.when(v <= 0, F.lit(0)).otherwise(F.length(F.bin(v))).cast("int")
    return (
        df.filter(F.col(value_col).isNotNull())
        .select(*gcols, bucket.alias("bucket"))
        .groupBy(*gcols, "bucket")
        .agg(F.count("*").cast("bigint").alias("cnt"))
    )


def histogram_quantiles(
    hist: DataFrame,
    group_col: str | None = None,
    quantiles_micros: tuple[int, ...] = (500_000, 900_000, 990_000),
) -> DataFrame:
    """Nearest-rank quantile LOWER BOUNDS from a log2 histogram: for each
    requested quantile q the smallest bucket whose cumulative count
    reaches ceil(q * n), reported as the bucket's lower bound 2^(b-1).
    The true nearest-rank quantile lies in [lb, 2*lb) by construction —
    the factor-2 envelope is the price of 64 cells of state vs a full
    shuffle of raw values (q_source_percentiles is the exact
    counterpart). Windows partition per group over <= 64 rows."""
    from pyspark.sql import Window

    gcols = [group_col] if group_col else []
    if len({qm // 10_000 for qm in quantiles_micros}) != len(quantiles_micros):
        raise ValueError(
            "quantiles_micros %r collide within a 1%% naming band (p<NN>_lb "
            "column names would duplicate)" % (quantiles_micros,)
        )
    w_cum = Window.partitionBy(*gcols).orderBy("bucket")
    w_all = Window.partitionBy(*gcols)
    cum = hist.withColumn("_cum", F.sum("cnt").over(w_cum)).withColumn(
        "_total", F.sum("cnt").over(w_all)
    )
    aggs = [F.max("_total").cast("bigint").alias("n")]
    names = []
    for qm in quantiles_micros:
        rank = F.expr("(_total * %d + %d) div %d" % (qm, MICRO - 1, MICRO))
        names.append("p%d_lb" % (qm // 10_000))
        aggs.append(
            F.min(F.when(F.col("_cum") >= rank, F.col("bucket"))).alias(
                "_b_" + names[-1]
            )
        )
    agged = cum.groupBy(*gcols).agg(*aggs)
    return agged.select(
        *gcols,
        "n",
        *[
            F.expr(
                "CASE WHEN _b_%s <= 0 THEN 0 "
                "ELSE CAST(1 AS BIGINT) << (_b_%s - 1) END" % (nm, nm)
            )
            .cast("bigint")
            .alias(nm)
            for nm in names
        ],
    )


def hll_registers(
    df: DataFrame, item_col: str, group_col: str | None = None
) -> DataFrame:
    """The raw per-(group?, bucket) register table: max rank of the
    hashed remainder. This is WHAT MERGES (register-wise MAX — max is
    idempotent and commutative, so replayed or re-sharded inputs are
    absorbed); the estimate is derived arithmetic. NULL items dropped."""
    gcols = [group_col] if group_col else []
    items = df.select(*gcols, F.col(item_col).alias("_item")).filter(
        F.col("_item").isNotNull()
    )
    h32 = F.conv(F.substring(F.md5(F.col("_item")), 1, 8), 16, 10).cast("bigint")
    bucket = (h32 % HLL_M).cast("int")
    rem = F.expr(
        "CAST(conv(substring(md5(_item), 1, 8), 16, 10) AS BIGINT) div %d" % HLL_M
    )
    rank = F.when(
        rem > 0, F.lit(_REM_BITS + 1) - F.length(F.bin(rem))
    ).otherwise(F.lit(_REM_BITS + 1))
    return (
        items.select(*gcols, bucket.alias("bucket"), rank.alias("rank"))
        .groupBy(*gcols, "bucket")
        .agg(F.max("rank").cast("bigint").alias("register"))
    )


def hll_estimate_from_registers(regs: DataFrame, gcols: list[str]) -> DataFrame:
    """Exact-integer estimate columns from a register table (merged or
    single-pass) — shared by the batch query and the streaming state."""
    term = F.expr(
        "CAST(1 AS BIGINT) << CAST(%d - register AS INT)" % _SCALE_BITS
    )
    agg = regs.groupBy(*gcols).agg(
        F.sum(term).cast("bigint").alias("_sum_present"),
        F.count("*").cast("bigint").alias("n_buckets_used"),
        F.sum("register").cast("bigint").alias("registers_sum"),
    )
    return agg.select(
        *gcols,
        "n_buckets_used",
        "registers_sum",
        F.expr(
            "CAST(%d AS BIGINT) div (_sum_present + (%d - n_buckets_used) * %d)"
            % (_EST_NUM, HLL_M, _SCALE)
        ).alias("estimate_micros"),
    )


def hll_register_table(
    df: DataFrame, item_col: str, group_col: str | None = None
) -> DataFrame:
    """Per-group HLL registers + the cardinality estimate in EXACT
    integer arithmetic: the harmonic sum of 2^-register is held scaled
    by 2^SCALE_BITS so every term is an integer; empty buckets
    contribute the full 2^SCALE_BITS term like the reference estimator.
    Output: (group?, n_buckets_used, registers_sum, estimate_micros).
    NULL items carry no identity and are dropped (a NULL register row
    would inflate n_buckets_used without contributing to the harmonic
    sum, biasing the estimate upward)."""
    gcols = [group_col] if group_col else []
    return hll_estimate_from_registers(hll_registers(df, item_col, group_col), gcols)
