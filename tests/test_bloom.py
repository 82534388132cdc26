"""Bloom filter operator (operators/bloom.py).

Exactness is testable because every hash is md5-derived: a pure-Python
twin recomputes the identical bit positions, so build/membership verdicts
must match bit-for-bit — not just statistically.
"""

import hashlib

import pytest
from pyspark.sql import functions as F

from modern_document_converter_for_ai_library_spark.operators.bloom import (
    bloom_build,
    bloom_member,
    bloom_merge,
)

M, K = 1 << 12, 5


def _py_positions(key: str, m: int, k: int):
    h = hashlib.md5(key.encode()).hexdigest()
    h1, h2 = int(h[0:8], 16), int(h[8:16], 16)
    return [(h1 + i * (2 * h2 + 1)) % m for i in range(k)]


def _py_shard(key: str, n_shards: int) -> int:
    return int(hashlib.md5(key.encode()).hexdigest()[16:24], 16) % n_shards


def _py_filter(keys, m, k, n_shards):
    bits = [set() for _ in range(n_shards)]
    for key in keys:
        bits[_py_shard(key, n_shards)].update(_py_positions(key, m, k))
    return bits


def _py_member(key, bits, m, k, n_shards) -> bool:
    shard = bits[_py_shard(key, n_shards)]
    return all(p in shard for p in _py_positions(key, m, k))


def _keys_df(spark, keys):
    return spark.createDataFrame([(k,) for k in keys], "key: string")


def _filter_rows(bloom_df):
    return {
        r["shard"]: r["bloom"]
        for r in bloom_df.collect()
    }


BASE = [f"base-{i}" for i in range(400)]
PROBE = [f"probe-{i}" for i in range(400)]


def test_build_matches_python_twin_exactly(spark):
    got = _filter_rows(bloom_build(_keys_df(spark, BASE), "key", m=M, k=K))
    twin = _py_filter(BASE, M, K, 1)[0]
    words = [0] * (M // 64)
    for p in twin:
        words[p // 64] |= 1 << (p % 64)
    # Spark longs are signed; normalize both to signed 64-bit
    want = [w - (1 << 64) if w >= (1 << 63) else w for w in words]
    assert list(got.keys()) == [0]
    assert got[0] == want


def test_no_false_negatives_and_twin_verdicts(spark):
    df = _keys_df(spark, BASE)
    filt = bloom_build(df, "key", m=M, k=K)
    # every inserted key must be a member
    self_check = bloom_member(df, filt, "key", m=M, k=K)
    assert self_check.filter(~F.col("maybe_seen")).count() == 0
    # probe verdicts (including any false positives) match the twin
    probes = bloom_member(_keys_df(spark, PROBE), filt, "key", m=M, k=K)
    got = {r["key"]: r["maybe_seen"] for r in probes.collect()}
    bits = _py_filter(BASE, M, K, 1)
    want = {p: _py_member(p, bits, M, K, 1) for p in PROBE}
    assert got == want


def test_partitioning_invariance(spark):
    df = _keys_df(spark, BASE)
    one = _filter_rows(bloom_build(df.coalesce(1), "key", m=M, k=K))
    many = _filter_rows(bloom_build(df.repartition(7), "key", m=M, k=K))
    assert one == many


def test_merge_law(spark):
    a, b = BASE[:200], BASE[200:]
    fa = bloom_build(_keys_df(spark, a), "key", m=M, k=K, n_shards=2)
    fb = bloom_build(_keys_df(spark, b), "key", m=M, k=K, n_shards=2)
    merged = _filter_rows(bloom_merge(fa, fb))
    whole = _filter_rows(
        bloom_build(_keys_df(spark, BASE), "key", m=M, k=K, n_shards=2)
    )
    assert merged == whole


def test_sharded_no_false_negatives_and_empty_shard(spark):
    # 3 keys into 8 shards leaves most shards empty — they must still
    # emit all-zero rows so membership probes never drop
    few = BASE[:3]
    filt = bloom_build(_keys_df(spark, few), "key", m=M, k=K, n_shards=8)
    rows = _filter_rows(filt)
    assert sorted(rows) == list(range(8))
    assert any(all(w == 0 for w in v) for v in rows.values())
    out = bloom_member(
        _keys_df(spark, few), filt, "key", m=M, k=K, n_shards=8
    )
    assert out.filter(~F.col("maybe_seen")).count() == 0
    # a disjoint probe set agrees with the twin under sharding
    probes = bloom_member(
        _keys_df(spark, PROBE[:100]), filt, "key", m=M, k=K, n_shards=8
    )
    bits = _py_filter(few, M, K, 8)
    got = {r["key"]: r["maybe_seen"] for r in probes.collect()}
    assert got == {p: _py_member(p, bits, M, K, 8) for p in PROBE[:100]}


def test_fp_rate_within_analytic_envelope(spark):
    import math

    n, m, k = 400, 1 << 12, 5
    filt = bloom_build(_keys_df(spark, BASE), "key", m=m, k=k)
    out = bloom_member(_keys_df(spark, PROBE), filt, "key", m=m, k=k)
    fp = out.filter(F.col("maybe_seen")).count()  # probes are disjoint
    analytic = (1.0 - math.exp(-k * n / m)) ** k
    # deterministic given the hash family; bound with slack for variance
    assert fp / len(PROBE) <= max(4 * analytic, 0.02)


def test_member_plan_is_broadcast_and_python_free(spark):
    df = _keys_df(spark, BASE)
    filt = bloom_build(df, "key", m=M, k=K)
    plan = (
        bloom_member(df, filt, "key", m=M, k=K)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_invalid_m_rejected(spark):
    with pytest.raises(ValueError):
        bloom_build(_keys_df(spark, BASE[:2]), "key", m=100, k=3)
