"""Parity pins for the r12 fused pred+truth kernels: every fused path
must be bit-identical to the unfused operator chain it replaced, and
the truth rows riding a fused corpus scan must equal exact_knn_join's
output exactly (same kernels, same (dist, id) order)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from vector_search_go_spark.operators.exact_knn import (
    exact_knn_join,
    exact_local_topk_kernel,
)
from vector_search_go_spark.operators.recall import split_fused_pred_truth
from vector_search_go_spark.operators.topk import topk_per_group


def _mk(spark, n_c=300, n_q=7, dim=8, seed=11):
    rng = np.random.default_rng(seed)
    C = rng.normal(size=(n_c, dim))
    Q = rng.normal(size=(n_q, dim))
    corpus = spark.createDataFrame(
        [(i, list(map(float, C[i]))) for i in range(n_c)],
        "id bigint, vec array<double>",
    ).repartition(3)
    queries = spark.createDataFrame(
        [(j * 10, list(map(float, Q[j]))) for j in range(n_q)],
        "query_id bigint, qvec array<double>",
    )
    return corpus, queries


def _rows(df, cols=("query_id", "id", "dist", "rn")):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


@pytest.mark.parametrize("metric", ["l2", "cosine"])
def test_ivf_scores_fused_matches_ivf_search(spark, metric):
    from vector_search_go_spark.operators.ann_ivf import (
        assign_cells,
        ivf_scores_fused,
        ivf_search,
        probe_cells_local,
    )
    from vector_search_go_spark.operators.argmin import collect_centroids

    corpus, queries = _mk(spark)
    cents = corpus.filter(F.col("id") % 29 == 1).select(
        F.col("id").cast("int").alias("cid"), F.col("vec").alias("cvec")
    )
    old = ivf_search(
        queries, assign_cells(corpus, cents, metric=metric), cents,
        metric=metric, k=5, nprobe=3,
    )
    qrows = sorted(
        queries.select("query_id", "qvec").collect(), key=lambda r: r["query_id"]
    )
    cids, cmat = collect_centroids(cents)
    c2q: dict = {}
    for r, cs in probe_cells_local(qrows, cids, cmat, metric, 3):
        for c in cs:
            c2q.setdefault(int(c), []).append(int(r["query_id"]))
    cand = ivf_scores_fused(
        corpus, (cids, cmat), c2q, qrows, metric=metric, local_topk=5
    )
    new = topk_per_group(cand, ["query_id"], "dist", 5, tiebreak_cols=["id"]).select(
        "query_id", "id", "dist", "rn"
    )
    assert _rows(old) == _rows(new)


def test_pq_adc_scores_fused_matches_unfused(spark):
    from vector_search_go_spark.operators.pq import (
        N_CODES,
        pq_adc_candidates,
        pq_adc_scores_fused,
        pq_codebook,
        pq_encode_arr,
    )

    corpus, queries = _mk(spark, n_c=260, dim=64, seed=3)
    emb = corpus.select(
        F.col("id").alias("vec_id"), F.col("vec").alias("embedding")
    ).filter(F.col("vec_id") < N_CODES + 200)
    cb = pq_codebook(emb)
    old = pq_adc_candidates(
        queries, pq_encode_arr(corpus, cb), cb, local_topk=20
    )
    qrows = queries.select("query_id", "qvec").collect()
    new = pq_adc_scores_fused(corpus, cb, qrows=qrows, local_topk=20)
    assert _rows(old, ("query_id", "id", "approx_dist")) == _rows(
        new, ("query_id", "id", "approx_dist")
    )


@pytest.mark.parametrize("metric", ["l2", "cosine"])
def test_fused_truth_rows_match_exact_knn_join(spark, metric):
    """The truth chain riding a fused corpus scan (here: the IVF fused
    kernel, the same truth_fn every fused entry uses) must reproduce
    exact_knn_join bit-for-bit."""
    from vector_search_go_spark.operators.ann_ivf import (
        ivf_scores_fused,
        probe_cells_local,
    )
    from vector_search_go_spark.operators.argmin import collect_centroids

    corpus, queries = _mk(spark, seed=7)
    cents = corpus.filter(F.col("id") % 31 == 0).select(
        F.col("id").cast("int").alias("cid"), F.col("vec").alias("cvec")
    )
    qrows = sorted(
        queries.select("query_id", "qvec").collect(), key=lambda r: r["query_id"]
    )
    cids, cmat = collect_centroids(cents)
    c2q: dict = {}
    for r, cs in probe_cells_local(qrows, cids, cmat, metric, 2):
        for c in cs:
            c2q.setdefault(int(c), []).append(int(r["query_id"]))
    combined = ivf_scores_fused(
        corpus, (cids, cmat), c2q, qrows, metric=metric, local_topk=5,
        truth_fn=exact_local_topk_kernel(qrows, metric, 5),
    )
    _approx, truth = split_fused_pred_truth(combined, k=5, dist_col="dist")
    want = exact_knn_join(queries, corpus, metric=metric, k=5)
    assert _rows(want) == _rows(truth)


def test_sq8_search_truth_fn_returns_identical_pair(spark):
    from vector_search_go_spark.operators.sq8 import sq8_search, sq8_stats

    corpus, queries = _mk(spark, n_c=220, dim=8, seed=5)
    stats = sq8_stats(corpus, 8)
    plain = sq8_search(
        queries, None, stats, corpus, 8, k=5, shortlist=20, vectors=corpus
    )
    qrows = queries.select("query_id", "qvec").collect()
    fused, truth = sq8_search(
        queries, None, stats, corpus, 8, k=5, shortlist=20, vectors=corpus,
        truth_fn=exact_local_topk_kernel(
            sorted(qrows, key=lambda r: r["query_id"]), "l2", 5
        ),
        truth_k=5, qrows=qrows,
    )
    assert _rows(plain) == _rows(fused)
    want = exact_knn_join(queries, corpus, metric="l2", k=5)
    assert _rows(want) == _rows(truth)
