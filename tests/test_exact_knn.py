"""Exact-KNN vs a numpy brute-force oracle (reference NNMock,
annbench/annbench.go:56-125)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from vector_search_go_spark.operators.exact_knn import (
    embeddings_split,
    exact_knn_join,
)
from vector_search_go_spark.operators.recall import (
    distance_based_precision_recall,
    mean_precision_recall,
    precision_recall,
)


def test_exact_knn_matches_numpy(spark):
    rng = np.random.default_rng(5)
    C = rng.normal(size=(80, 6))
    Q = rng.normal(size=(4, 6))
    corpus = spark.createDataFrame(
        [(i, list(map(float, C[i]))) for i in range(len(C))],
        "id bigint, vec array<double>",
    )
    queries = spark.createDataFrame(
        [(j, list(map(float, Q[j]))) for j in range(len(Q))],
        "query_id bigint, qvec array<double>",
    )
    got = exact_knn_join(queries, corpus, metric="l2", k=5).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append((r["rn"], r["id"], r["dist"]))
    for j in range(len(Q)):
        dists = np.linalg.norm(C - Q[j], axis=1)
        order = np.lexsort((np.arange(len(C)), dists))[:5]
        want = [(rank + 1, int(order[rank]), float(dists[order[rank]])) for rank in range(5)]
        got_j = sorted(by_q[j])
        assert [(a, b) for a, b, _ in got_j] == [(a, b) for a, b, _ in want]
        assert np.allclose([d for _, _, d in got_j], [d for _, _, d in want])


def test_threshold_filter(spark):
    corpus = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [1.0, 0.0]), (2, [5.0, 0.0])],
        "id bigint, vec array<double>",
    )
    queries = spark.createDataFrame(
        [(0, [0.0, 0.0])], "query_id bigint, qvec array<double>"
    )
    rows = exact_knn_join(queries, corpus, metric="l2", k=10, threshold=2.0).collect()
    assert {r["id"] for r in rows} == {0, 1}


def test_recall_identity(spark, sf_dir):
    queries, corpus = embeddings_split(spark, sf_dir)
    truth = exact_knn_join(queries, corpus, metric="l2", k=5)
    pr = precision_recall(truth, truth)
    p, r = mean_precision_recall(pr)
    assert p == 1.0 and r == 1.0
    prd = distance_based_precision_recall(truth, truth, epsilon=0.0)
    p, r = mean_precision_recall(prd)
    assert p == 1.0 and r == 1.0


def test_distance_based_recall_catches_misses(spark):
    truth = spark.createDataFrame(
        [(0, 1, 1.0, 1), (0, 2, 2.0, 2)], "query_id bigint, id bigint, dist double, rn int"
    )
    pred = spark.createDataFrame(
        [(0, 1, 1.0, 1), (0, 9, 9.0, 2)], "query_id bigint, id bigint, dist double, rn int"
    )
    p, r = mean_precision_recall(distance_based_precision_recall(pred, truth, 0.05))
    assert p == 0.5 and r == 0.5


import pytest


@pytest.mark.parametrize("n_parts", [3, 1])
def test_arrow_two_stage_matches_expr_oracle(spark, n_parts):
    """The arrow kernel must be BIT-identical to the pure-Catalyst expr
    plan, including duplicate-tie clusters, both metrics, and a
    threshold cut. n_parts=3 exercises the cross-batch local-top-k
    merge on the small-block (full sequential) branch; n_parts=1 makes
    a single 1200-row batch so n_v x n_q = 72,000 > 65,536 and the
    BLAS-approx + margin-selection + pair-rescore branch is ON the
    tested path."""
    rng = np.random.default_rng(23)
    C = rng.normal(size=(1200, 8))
    C[1100:] = C[1100]  # 100-way tie cluster at the top-k boundary
    Q = np.vstack([rng.normal(size=(59, 8)), C[1100][None, :]])
    corpus = spark.createDataFrame(
        [(i, list(map(float, C[i]))) for i in range(len(C))],
        "id bigint, vec array<double>",
    ).repartition(n_parts)
    queries = spark.createDataFrame(
        [(j, list(map(float, Q[j]))) for j in range(len(Q))],
        "query_id bigint, qvec array<double>",
    )

    def rows(df):
        return [
            (r["query_id"], r["id"], r["dist"], r["rn"])
            for r in df.orderBy("query_id", "rn").collect()
        ]

    for metric in ("l2", "cosine"):
        for thr in (None, 1.0 if metric == "cosine" else 4.0):
            a = rows(
                exact_knn_join(
                    queries, corpus, metric=metric, k=12, threshold=thr,
                    impl="arrow",
                )
            )
            b = rows(
                exact_knn_join(
                    queries, corpus, metric=metric, k=12, threshold=thr,
                    impl="expr",
                )
            )
            assert a == b, f"metric={metric} threshold={thr}"


def test_searches_tolerate_empty_queries(spark):
    # the local-top-k kernels must emit well-formed empty results for an
    # empty query batch, not crash in np.concatenate (review r5 pass 3)
    rng = np.random.default_rng(3)
    C = rng.normal(size=(200, 8))
    corpus = spark.createDataFrame(
        [(i, list(map(float, C[i]))) for i in range(len(C))],
        "id bigint, vec array<double>",
    )
    empty_q = spark.createDataFrame([], "query_id bigint, qvec array<double>")

    from vector_search_go_spark.operators.pq import (
        pq_adc_search,
        pq_codebook,
        pq_encode,
    )
    from vector_search_go_spark.operators.sq8 import (
        sq8_encode,
        sq8_search,
        sq8_stats,
    )

    emb = corpus.select(F.col("id").alias("vec_id"), F.col("vec").alias("embedding"))
    cb = pq_codebook(emb)
    codes = pq_encode(corpus, cb)
    assert pq_adc_search(empty_q, codes, cb, corpus, k=5, shortlist=20).count() == 0
    stats = sq8_stats(corpus, 8)
    scodes = sq8_encode(corpus, stats, 8)
    assert sq8_search(empty_q, scodes, stats, corpus, 8, k=5, shortlist=20).count() == 0
    assert exact_knn_join(empty_q, corpus, metric="l2", k=5).count() == 0


def test_precision_recall_zero_side_null_semantics(spark):
    """ADVICE r11 (high): a query present only in truth (the ANN
    returned zero candidates) must produce NULL precision / 0.0 recall
    — not an ANSI DIVIDE_BY_ZERO — and a pred-only query the mirror
    image (0.0 precision / NULL recall)."""
    truth = spark.createDataFrame(
        [(0, 1), (0, 2), (7, 3)], "query_id bigint, id bigint"
    )
    pred = spark.createDataFrame([(0, 1), (9, 4)], "query_id bigint, id bigint")
    rows = {
        r["query_id"]: (r["precision"], r["recall"])
        for r in precision_recall(pred, truth).collect()
    }
    assert rows[0] == (1.0, 0.5)
    assert rows[7][0] is None and rows[7][1] == 0.0
    assert rows[9][0] == 0.0 and rows[9][1] is None
