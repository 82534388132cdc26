"""Temperature-scaled mixture sampling: exact integer roots, flattening
property, cap semantics, pure-Python twin, partitioning invariance."""

import hashlib
import math

from pyspark.sql import functions as F

from modern_document_converter_for_ai_library_spark.operators.sampling import (
    exact_isqrt,
    temperature_rates,
    temperature_sample,
)

MICRO = 1_000_000


def _skewed_df(spark, sizes):
    rows = []
    i = 0
    for src, n in sizes.items():
        for _ in range(n):
            rows.append((i, src))
            i += 1
    return spark.createDataFrame(rows, "doc_id: bigint, source: string")


def _twin_rates(sizes, alpha, target_total):
    def root(m):
        if alpha == "1":
            return m
        if alpha == "1/2":
            return math.isqrt(m)
        if alpha == "1/4":
            return math.isqrt(math.isqrt(m))
        raise AssertionError(alpha)

    w = {s: root(m) for s, m in sizes.items()}
    W = sum(w.values())
    return {
        s: min(MICRO, (target_total * w[s] * MICRO) // (W * sizes[s]))
        for s in sizes
    }


def test_exact_isqrt_around_perfect_squares(spark):
    vals = [0, 1, 2, 3, 4, 8, 9, 10, 15, 16, 17, 24, 25, 26,
            10**12 - 1, 10**12, 10**12 + 1, (2**31 - 1) ** 2]
    df = spark.createDataFrame([(v,) for v in vals], "x: bigint")
    got = {r["x"]: r["s"] for r in df.select("x", exact_isqrt(F.col("x")).alias("s")).collect()}
    assert got == {v: math.isqrt(v) for v in vals}


def test_temperature_rates_match_pure_python_twin(spark):
    sizes = {"big": 400, "mid": 99, "rare": 16, "tiny": 2}
    df = _skewed_df(spark, sizes)
    for alpha in ("1", "1/2", "1/4"):
        got = {
            r["source"]: (r["mass"], r["weight"], r["rate_micros"])
            for r in temperature_rates(
                df, alpha=alpha, target_total=60
            ).collect()
        }
        twin = _twin_rates(sizes, alpha, 60)
        for s, m in sizes.items():
            assert got[s][0] == m
            assert got[s][2] == twin[s], (alpha, s)


def test_flattening_monotone_in_alpha(spark):
    # smaller alpha pushes shares toward uniform: the rare source's
    # acceptance RATE grows as alpha drops, the big source's shrinks
    # (sizes chosen so no rate hits the 1e6 cap)
    sizes = {"big": 10_000, "rare": 100}
    df = _skewed_df(spark, sizes)

    def rates(alpha):
        return {
            r["source"]: r["rate_micros"]
            for r in temperature_rates(df, alpha=alpha, target_total=100).collect()
        }

    r1, r2, r4 = rates("1"), rates("1/2"), rates("1/4")
    # proportional: identical acceptance rate for every source
    assert r1["big"] == r1["rare"]
    assert MICRO > r4["rare"] > r2["rare"] > r1["rare"]
    assert r4["big"] < r2["big"] < r1["big"]


def test_rate_cap_and_overasked_rare_source(spark):
    # target so large the rare source is over-asked: rate caps at 1e6
    sizes = {"big": 300, "rare": 3}
    df = _skewed_df(spark, sizes)
    got = {
        r["source"]: r["rate_micros"]
        for r in temperature_rates(df, alpha="1/4", target_total=250).collect()
    }
    assert got["rare"] == MICRO
    assert got["big"] < MICRO


def test_temperature_sample_matches_md5_twin_and_partitioning(spark):
    sizes = {"big": 120, "rare": 9}
    df = _skewed_df(spark, sizes)
    out = {
        r["doc_id"]: (r["rate_micros"], r["hash_micros"], r["sampled"])
        for r in temperature_sample(df, alpha="1/2", target_total=40).collect()
    }
    rates = _twin_rates(sizes, "1/2", 40)
    src_of = {}
    i = 0
    for src, n in sizes.items():
        for _ in range(n):
            src_of[i] = src
            i += 1
    for doc_id, (rate, hm, sampled) in out.items():
        h = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16) % MICRO
        assert hm == h
        assert rate == rates[src_of[doc_id]]
        assert sampled == (h < rate)
    # pure function of row values: identical under any partitioning
    out7 = {
        r["doc_id"]: (r["rate_micros"], r["hash_micros"], r["sampled"])
        for r in temperature_sample(
            df.repartition(7), alpha="1/2", target_total=40
        ).collect()
    }
    assert out7 == out


def test_mass_col_token_weighting(spark):
    # mass by token column instead of doc count
    df = spark.createDataFrame(
        [(1, "a", 90), (2, "a", 10), (3, "b", 25)],
        "doc_id: bigint, source: string, n_tokens: int",
    )
    got = {
        r["source"]: (r["mass"], r["weight"])
        for r in temperature_rates(
            df, alpha="1/2", target_total=10, mass_col="n_tokens"
        ).collect()
    }
    assert got == {"a": (100, 10), "b": (25, 5)}


def test_rates_exact_at_web_scale_masses_no_bigint_overflow(spark):
    # target_total * weight * 1e6 at 5B-token masses is ~2.5e25 — far
    # past 2^63, where non-ANSI BIGINT silently wraps. The DECIMAL(38,0)
    # product must match Python's unbounded integers exactly.
    sizes = {"web": 5_000_000_000, "code": 800_000_000, "wiki": 30_000_000}
    df = spark.createDataFrame(
        [(i, s, m) for i, (s, m) in enumerate(sizes.items())],
        "doc_id: bigint, source: string, n_tokens: bigint",
    )
    for alpha in ("1", "1/2", "1/4"):
        target = 2_000_000_000
        got = {
            r["source"]: r["rate_micros"]
            for r in temperature_rates(
                df, alpha=alpha, target_total=target, mass_col="n_tokens"
            ).collect()
        }
        twin = _twin_rates(sizes, alpha, target)
        assert got == twin, alpha
        # sanity: with alpha=1 and target < total mass, no wrap-induced
        # drop — the proportional rate is target/total for every source
        if alpha == "1":
            expect = target * MICRO // sum(sizes.values())
            assert all(v == expect for v in got.values())
