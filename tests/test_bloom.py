"""Bloom join pruning: no false negatives, measured fpp, exact-join
equivalence."""

from __future__ import annotations

from vector_search_go_spark.operators.bloom import (
    _plan_params,
    bloom_prune,
    bloom_semi_join,
    build_bloom,
)


def test_plan_params_sizing():
    m, k = _plan_params(10_000, 0.01)
    assert m % 64 == 0
    assert m >= 10_000 * 9  # ~9.6 bits/item at 1% fpp
    assert 5 <= k <= 10


def test_no_false_negatives_and_low_fpp(spark):
    build = spark.range(0, 1000).withColumnRenamed("id", "key")
    probe = spark.range(0, 20_000).withColumnRenamed("id", "key")
    bitmap, m, k = build_bloom(build, "key", expected_items=1000, fpp=0.01)
    kept = {r["key"] for r in bloom_prune(probe, "key", bitmap, m, k).collect()}
    assert set(range(1000)) <= kept  # every build key survives
    false_pos = len(kept) - 1000
    assert false_pos / 19_000 < 0.05  # ~1% target, loose bound


def test_probe_size_guard_routes_to_plain_join(spark):
    """Small probe (probe_rows below threshold) must skip the bloom:
    same rows, and the plan carries no bloom filter expression."""
    probe = spark.range(0, 1000).selectExpr("id as key", "id as payload")
    build = spark.range(0, 100).withColumnRenamed("id", "key")
    guarded = bloom_semi_join(
        probe, build, "key", expected_items=100, probe_rows=1000
    )
    assert "xxhash64" not in guarded._jdf.queryExecution().executedPlan().toString()
    got = sorted(r["key"] for r in guarded.collect())
    assert got == list(range(100))


def test_bloom_route_taken_above_threshold(spark):
    probe = spark.range(0, 1000).selectExpr("id as key", "id as payload")
    build = spark.range(0, 100).withColumnRenamed("id", "key")
    bloomed = bloom_semi_join(
        probe, build, "key", expected_items=100, probe_rows=1000, min_probe_rows=500
    )
    assert "xxhash64" in bloomed._jdf.queryExecution().executedPlan().toString()
    assert sorted(r["key"] for r in bloomed.collect()) == list(range(100))


def test_semi_join_equivalence(spark):
    probe = spark.range(0, 5000).selectExpr("id as key", "id * 2 as payload")
    build = spark.range(0, 5000).filter("id % 7 = 3").withColumnRenamed("id", "key")
    got = sorted(
        tuple(r)
        for r in bloom_semi_join(probe, build, "key", expected_items=720).collect()
    )
    want = sorted(
        tuple(r) for r in probe.join(build, "key", "left_semi").collect()
    )
    assert got == want
