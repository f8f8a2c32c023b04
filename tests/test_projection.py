"""Random projection (operators.projection): seeded determinism, JL
distance preservation, and expr==arrow bit-parity."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from vector_search_go_spark.operators.projection import (
    project_arrow,
    project_expr,
    projection_matrix,
)


def test_matrix_seeded_and_scaled():
    a = projection_matrix(64, 16, seed=7)
    b = projection_matrix(64, 16, seed=7)
    c = projection_matrix(64, 16, seed=8)
    assert np.array_equal(a, b)
    assert not np.array_equal(a, c)
    # JL scaling: E[|y|^2] == |x|^2 -> column norms ~ 1/sqrt(dim_out)
    assert abs(np.mean(a**2) * 16 - 1.0) < 0.2


def test_expr_arrow_bit_parity(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    mat = projection_matrix(64, 8, seed=3)
    e = emb.select(
        "vec_id", project_expr(F.col("embedding"), mat).alias("y")
    ).collect()
    a = emb.select(
        "vec_id", project_arrow(mat)(F.col("embedding")).alias("y")
    ).collect()
    ev = {r["vec_id"]: r["y"] for r in e}
    av = {r["vec_id"]: r["y"] for r in a}
    assert ev.keys() == av.keys()
    for k in ev:
        assert ev[k] == av[k]  # exact float equality, not approx


def test_jl_preserves_pairwise_distances(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    rows = emb.orderBy("vec_id").limit(40).collect()
    X = np.array([list(r["embedding"]) for r in rows], dtype=np.float64)
    mat = projection_matrix(64, 32, seed=5)
    Y = X @ mat
    rng = np.random.default_rng(0)
    ratios = []
    for _ in range(200):
        i, j = rng.integers(0, len(X), 2)
        if i == j:
            continue
        dx = np.linalg.norm(X[i] - X[j])
        dy = np.linalg.norm(Y[i] - Y[j])
        ratios.append(dy / dx)
    # distances preserved in expectation, bounded distortion at 32 dims
    assert 0.9 < float(np.median(ratios)) < 1.1
    assert 0.5 < min(ratios) and max(ratios) < 1.6
