"""Deterministic corpus sampling / domain mixing.

Training-data pipelines mix sources at configured rates ("web 60%, books
20%, code 20%"). Doing that with ``rand()`` makes the corpus
irreproducible across runs and partitionings; the standard fix is
HASH-threshold sampling: a document is in the sample iff
``h(doc_id) mod 1e6 < rate_micros``, with h deterministic. Properties:

  - reproducible: pure function of (doc_id, salt) — any engine, any
    partitioning, any cluster size draws the same sample
  - stable under rate changes: raising a rate only ADDS documents
    (the kept set at 10% is a subset of the kept set at 20%), which makes
    incremental re-mixing cheap — no resampling churn
  - map-only: one md5 + a broadcast-size CASE over the mixing table

``salt`` decorrelates independent sampling decisions (two different
samples of the same corpus must not select identical doc sets).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MICRO = 1_000_000


def hash_micros_col(id_col: str = "doc_id", salt: str = "") -> F.Column:
    """Uniform deterministic value in [0, 1e6) from the first 8 md5 hex
    chars of (id || salt) — exact-integer, engine-portable (DuckDB:
    CAST(concat('0x', substring(md5(..), 1, 8)) AS BIGINT) % 1000000)."""
    h = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt)))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint") % MICRO


def stratified_sample(
    df: DataFrame,
    rates_micros: dict[str, int],
    key_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "",
    default_micros: int = 0,
) -> DataFrame:
    """Adds ``hash_micros`` + ``sampled`` per the per-key mixing table.

    Keys absent from ``rates_micros`` fall back to ``default_micros``.
    Filtering is left to the caller (``.filter("sampled")``) so audits can
    count both sides of the cut."""
    thr = None
    for k, v in sorted(rates_micros.items()):
        if not 0 <= v <= MICRO:
            raise ValueError(f"rate for {k!r} outside [0, 1e6]: {v}")
        cond = F.col(key_col) == k
        thr = F.when(cond, v) if thr is None else thr.when(cond, v)
    thr = F.lit(default_micros) if thr is None else thr.otherwise(default_micros)
    hm = hash_micros_col(id_col, salt)
    return df.withColumn("hash_micros", hm).withColumn(
        "sampled", F.col("hash_micros") < thr
    )


def group_sample(
    df: DataFrame,
    group_col: str = "source",
    id_col: str = "doc_id",
    k: int = 3,
    salt: str = "",
    n_salts: int = 16,
) -> DataFrame:
    """FIXED-SIZE deterministic uniform sample per group: the ``k`` rows
    with the smallest md5(id || salt) — the bottom-k (min-k) sketch.
    Complements :func:`stratified_sample` (rate-based, output size
    proportional to the group): here every group yields at most ``k``
    rows no matter how large it is, and the sample is MERGEABLE —
    re-taking the bottom-k of a union of per-partition/per-day bottom-k
    samples equals the bottom-k of the union of the raw data (tested),
    so samples maintained per shard combine without touching raw rows.

    Skew-safe via the exact two-phase pattern (inverted_index.py): a
    per-(group, hash-salt) partial bottom-k bounds every task at
    corpus-hot groups, then the global pass sees <= n_salts*k survivors
    per group. Output: (group, id, sample_rank) with rank 1..k in hash
    order — deterministic under recompute, any partitioning, any engine.
    """
    from pyspark.sql import Window

    h = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt)))
    salted = (
        df.select(group_col, id_col)
        .withColumn("_h", h)
        .withColumn("_salt", F.pmod(F.hash(id_col), F.lit(n_salts)))
    )
    w1 = Window.partitionBy(group_col, "_salt").orderBy("_h", id_col)
    local = salted.withColumn("_r", F.row_number().over(w1)).filter(
        F.col("_r") <= k
    )
    w2 = Window.partitionBy(group_col).orderBy("_h", id_col)
    return (
        local.withColumn("sample_rank", F.row_number().over(w2))
        .filter(F.col("sample_rank") <= k)
        .select(group_col, id_col, F.col("sample_rank").cast("bigint").alias("sample_rank"))
    )
