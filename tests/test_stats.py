"""Stats fixture (reference lsh_test.go:151-213, FIXTURES.md A4):
20 rows alternating [0,1]/[0,0] -> mean=[0, 0.5], "std"(=MAD)=[0, 0.5]."""

from __future__ import annotations

from pyspark.sql import functions as F

from vector_search_go_spark.operators.stats import column_stats, scale_expr


def _fixture(spark):
    rows = [([0.0, 1.0],) if i % 2 == 0 else ([0.0, 0.0],) for i in range(20)]
    return spark.createDataFrame(rows, "vec array<double>")


def test_mean_mad_exact(spark):
    stats = {r["dim"]: (r["mean"], r["mad"]) for r in column_stats(_fixture(spark)).collect()}
    assert abs(stats[0][0] - 0.0) < 1e-9 and abs(stats[0][1] - 0.0) < 1e-9
    assert abs(stats[1][0] - 0.5) < 1e-9
    # MAD, not std: mean(|x - 0.5|) = 0.5 (helpers.go:71-78 semantics)
    assert abs(stats[1][1] - 0.5) < 1e-9


def test_mean_mad_sampled_tolerance(spark):
    # sampled estimate lands near truth (reference asserts the median of
    # 500 resamples within 0.05, lsh_test.go:151-213; one larger sample
    # with a looser bound keeps the test fast)
    rows = [([0.0, 1.0],) if i % 2 == 0 else ([0.0, 0.0],) for i in range(2000)]
    df = spark.createDataFrame(rows, "vec array<double>")
    stats = {
        r["dim"]: (r["mean"], r["mad"])
        for r in column_stats(df, sample_fraction=0.5, seed=1).collect()
    }
    assert abs(stats[1][0] - 0.5) < 0.05
    assert abs(stats[1][1] - 0.5) < 0.05


def test_scaler(spark):
    df = spark.createDataFrame(
        [([2.0, 10.0],)], "vec array<double>"
    ).withColumn("mean", F.array(F.lit(1.0), F.lit(4.0))).withColumn(
        "std", F.array(F.lit(2.0), F.lit(0.0))
    )
    out = df.select(
        scale_expr(F.col("vec"), F.col("mean"), F.col("std")).alias("s")
    ).collect()[0]["s"]
    # (2-1)/2 = 0.5; std=0 -> divide-by-1 fill -> 10-4 = 6
    assert out == [0.5, 6.0]
