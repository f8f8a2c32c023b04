"""Mergeable HLL rollup: merged == direct, accuracy vs exact, and
parquet round-trip of the persisted partial layer."""

from __future__ import annotations

from pyspark.sql import functions as F

from vector_search_go_spark.io import table
from vector_search_go_spark.operators.sketches import (
    LG_K,
    merge_to_coarse,
    sketch_bucket_rollup,
)


def _events(spark, sf_dir):
    return table(spark, sf_dir, "events")


def test_merged_equals_direct_sketch(spark, sf_dir):
    """Unioning hourly sketches must reproduce the day-level sketch
    estimate exactly — sketch union is lossless w.r.t. sketch state."""
    e = _events(spark, sf_dir)
    merged = {
        r["coarse_bucket"]: r["approx_distinct"]
        for r in merge_to_coarse(sketch_bucket_rollup(e, "ts", "user_id")).collect()
    }
    direct = {
        r["day"]: r["est"]
        for r in e.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .agg(
            F.hll_sketch_estimate(
                F.hll_sketch_agg("user_id", F.lit(LG_K))
            ).alias("est")
        )
        .collect()
    }
    assert merged == direct


def test_estimate_accuracy_vs_exact(spark, sf_dir):
    e = _events(spark, sf_dir)
    approx = {
        r["coarse_bucket"]: r["approx_distinct"]
        for r in merge_to_coarse(sketch_bucket_rollup(e, "ts", "user_id")).collect()
    }
    exact = {
        r["day"]: r["n"]
        for r in e.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert approx.keys() == exact.keys()
    for day, est in approx.items():
        assert abs(est - exact[day]) / exact[day] < 0.05  # lg_k=12 ~1.6% rse


def test_partials_roundtrip_parquet(spark, sf_dir, tmp_path):
    """The hourly layer persists as plain binary and still merges."""
    e = _events(spark, sf_dir)
    partials = sketch_bucket_rollup(e, "ts", "user_id")
    path = str(tmp_path / "hourly_partials")
    partials.write.mode("overwrite").parquet(path)
    live = {tuple(r) for r in merge_to_coarse(partials).collect()}
    reloaded = {
        tuple(r) for r in merge_to_coarse(spark.read.parquet(path)).collect()
    }
    assert live == reloaded
