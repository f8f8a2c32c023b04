"""IVF coarse-quantized ANN (operators.ann_ivf)."""

from __future__ import annotations

from pyspark.sql import functions as F

from vector_search_go_spark.operators.ann_ivf import assign_cells, ivf_search
from vector_search_go_spark.operators.exact_knn import exact_knn_join
from vector_search_go_spark.operators.recall import (
    mean_precision_recall,
    precision_recall,
)


def _split(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    centroids = emb.filter(F.col("vec_id") % 31 == 7).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cvec")
    )
    queries = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    corpus = emb.filter(F.col("vec_id") % 50 != 0).select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vec")
    )
    return emb, centroids, queries, corpus


def test_cells_partition_corpus(spark, sf_dir):
    _, centroids, _, corpus = _split(spark, sf_dir)
    cells = assign_cells(corpus, centroids, metric="cosine")
    assert cells.count() == corpus.count()  # every vector exactly one cell
    n_cells = cells.select("cell").distinct().count()
    assert n_cells <= centroids.count()


def test_ivf_recall_vs_exact(spark, sf_dir):
    _, centroids, queries, corpus = _split(spark, sf_dir)
    cells = assign_cells(corpus, centroids, metric="cosine")
    pred = ivf_search(queries, cells, centroids, metric="cosine", k=10, nprobe=4)
    truth = exact_knn_join(queries, corpus, metric="cosine", k=10)
    p, r = mean_precision_recall(precision_recall(pred, truth))
    # nprobe=4 of ~16 cells on random 64-d data: recall well above the
    # 4/16 random-cell floor
    assert r >= 0.35, r


def test_ivf_full_probe_equals_exact(spark, sf_dir):
    """Probing every cell must reproduce exact KNN (the IVF pipeline's
    internal consistency check)."""
    _, centroids, queries, corpus = _split(spark, sf_dir)
    n_cent = centroids.count()
    cells = assign_cells(corpus, centroids, metric="cosine")
    pred = ivf_search(queries, cells, centroids, metric="cosine", k=10, nprobe=n_cent)
    truth = exact_knn_join(queries, corpus, metric="cosine", k=10)
    got = {(r["query_id"], r["id"]) for r in pred.collect()}
    want = {(r["query_id"], r["id"]) for r in truth.collect()}
    assert got == want
