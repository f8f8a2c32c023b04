"""Metric value fixtures (reference lsh/lsh_test.go:47-106, FIXTURES.md A3)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vector_search_go_spark.functions.metrics import (
    cosine_dist,
    l2_dist,
    l2_norm,
    l2_normalize,
)

TOL = 1e-6


def _eval(spark, a, b, expr_fn):
    df = spark.createDataFrame([(a, b)], "a array<double>, b array<double>")
    return df.select(expr_fn(F.col("a"), F.col("b")).alias("v")).collect()[0]["v"]


def test_l2_unit(spark):
    # d([0,0,0],[0,1,0]) = 1.0 (lsh_test.go:87-95)
    assert abs(_eval(spark, [0.0, 0.0, 0.0], [0.0, 1.0, 0.0], l2_dist) - 1.0) < TOL


def test_l2_345_triangle(spark):
    # d([0,0],[-4,3]) = 5.0 (lsh_test.go:96-106)
    assert abs(_eval(spark, [0.0, 0.0], [-4.0, 3.0], l2_dist) - 5.0) < TOL


def test_cosine_zero_vector(spark):
    # zero vector -> 1.0 (lsh_test.go:47-56)
    assert _eval(spark, [0.0, 0.0], [1.0, 1.0], cosine_dist) == 1.0


def test_cosine_orthogonal(spark):
    assert abs(_eval(spark, [1.0, 0.0], [0.0, 1.0], cosine_dist) - 1.0) < TOL


def test_cosine_opposite(spark):
    assert abs(_eval(spark, [1.0, 0.0], [-1.0, 0.0], cosine_dist) - 2.0) < TOL


def test_cosine_equal_clamps_to_zero(spark):
    # equal vectors -> exactly 0.0 via the <1e-6 clamp (helpers.go:230-233)
    assert _eval(spark, [3.0, 4.0], [3.0, 4.0], cosine_dist) == 0.0


def test_norm_and_normalize(spark):
    df = spark.createDataFrame([([3.0, 4.0],)], "a array<double>")
    row = df.select(
        l2_norm(F.col("a")).alias("n"), l2_normalize(F.col("a")).alias("u")
    ).collect()[0]
    assert abs(row["n"] - 5.0) < TOL
    assert row["u"] == pytest.approx([0.6, 0.8])
