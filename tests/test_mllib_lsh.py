"""MLlib LSH comparison backend vs our exact oracle."""

from __future__ import annotations

import pytest

from vector_search_go_spark.operators.mllib_lsh import MLLIB_AVAILABLE, mllib_knn_l2
from vector_search_go_spark.operators.exact_knn import embeddings_split, exact_knn_join
from vector_search_go_spark.operators.recall import (
    mean_precision_recall,
    precision_recall,
)

pytestmark = pytest.mark.skipif(not MLLIB_AVAILABLE, reason="pyspark.ml unavailable")


def test_mllib_recall_vs_exact(spark, sf_dir):
    queries, corpus = embeddings_split(spark, sf_dir)
    pred = mllib_knn_l2(queries, corpus, k=10, num_hash_tables=8)
    truth = exact_knn_join(queries, corpus, metric="l2", k=10)
    p, r = mean_precision_recall(precision_recall(pred, truth))
    # multiprobe-free Gaussian-plane LSH with a generous join radius:
    # high recall expected on 500-vector sf0.001
    assert r >= 0.8, r
