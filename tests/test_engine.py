"""Engine facade: API-parity layer over the LSH / exact backends."""

from __future__ import annotations

import pytest

from vector_search_go_spark.config import LshConfig
from vector_search_go_spark.engine import VectorSearchEngine

POINTS = [
    (0, [0.1, 0.1]),
    (1, [0.1, 0.08]),
    (2, [0.11, 0.09]),
    (3, [0.09, 0.11]),
    (4, [-0.1, 0.1]),
    (5, [-0.1, 0.08]),
]


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(POINTS, "id bigint, vec array<double>")


def test_exact_backend(spark, corpus):
    eng = VectorSearchEngine(spark, metric="l2", backend="exact")
    eng.train(corpus)
    rows = eng.search_vector([0.1, 0.1], k=3)
    assert [r["id"] for r in rows] == [0, 2, 3]  # self, then the 0.0141 pair


def test_lsh_backend_roundtrip(spark, corpus, tmp_path):
    cfg = LshConfig(dims=2, n_trees=10, k_min_vecs=2)
    eng = VectorSearchEngine(spark, cfg, metric="l2", backend="lsh")
    eng.train(corpus)
    rows = eng.search_vector([0.1, 0.1], k=4, threshold=0.02)
    assert 3 <= len(rows) <= 4
    path = str(tmp_path / "engine_idx")
    eng.save(path)
    eng2 = VectorSearchEngine.load(spark, path, metric="l2")
    rows2 = eng2.search_vector([0.1, 0.1], k=4, threshold=0.02)
    assert [(r["id"], r["dist"]) for r in rows] == [(r["id"], r["dist"]) for r in rows2]


def test_metric_overrides_config_angular(spark):
    cfg = LshConfig(dims=2, is_angular=False)
    eng = VectorSearchEngine(spark, cfg, metric="cosine")
    assert eng.config.is_angular is True


def test_load_rejects_metric_mismatch(spark, corpus, tmp_path):
    cfg = LshConfig(dims=2, n_trees=4, k_min_vecs=2)
    eng = VectorSearchEngine(spark, cfg, metric="cosine", backend="lsh")
    eng.train(corpus)
    path = str(tmp_path / "cosine_idx")
    eng.save(path)
    with pytest.raises(ValueError, match="is_angular"):
        VectorSearchEngine.load(spark, path, metric="l2")
    # matching metric loads fine
    assert VectorSearchEngine.load(spark, path, metric="cosine").config.is_angular


def test_untrained_raises(spark, corpus):
    eng = VectorSearchEngine(spark, metric="l2", backend="exact")
    with pytest.raises(RuntimeError):
        eng.search_vector([0.0, 0.0])
    with pytest.raises(ValueError):
        VectorSearchEngine(spark, backend="nope")


def test_engine_point_search_matches_live(spark, tmp_path):
    """engine.point_search over the saved store == engine.search_vector
    on the live index (ids and bit-exact dists)."""
    from pyspark.sql import functions as F

    from vector_search_go_spark.config import LshConfig
    from vector_search_go_spark.engine import VectorSearchEngine

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    df = emb.select(F.col("vec_id").alias("id"), F.col("embedding").alias("vec"))
    eng = VectorSearchEngine(
        spark, LshConfig(dims=64, n_trees=6, k_min_vecs=50, seed=5), metric="l2"
    )
    eng.train(df)
    path = str(tmp_path / "engine_idx")
    eng.save(path)
    qvec = [float(x) for x in emb.limit(1).collect()[0]["embedding"]]
    live = [(r["id"], r["dist"]) for r in eng.search_vector(qvec, k=5)]
    stored = [(r["id"], r["dist"]) for r in eng.point_search(path, qvec, k=5)]
    assert stored == live
