"""Semantic dedup (dedup_semantic_clusters): cluster-bounded cosine
dedup per SemDeDup. Bit-exactness vs DuckDB is proven by the oracle
entry (tools/check_correctness.py); here: structural invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from vector_search_go_spark.queries_pipeline import dedup_semantic_clusters


def test_covers_corpus_and_keeps_representatives(spark, sf_dir):
    res = dedup_semantic_clusters(spark, sf_dir)
    rows = res.collect()
    emb_n = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    # one verdict per corpus vector, no id lost or duplicated
    assert len(rows) == emb_n
    assert len({r["id"] for r in rows}) == emb_n
    # a dropped member always has a kept lower-id representative in its
    # cell (greedy min-id rule): the minimum id of every cell is kept
    by_cell: dict[int, list] = {}
    for r in rows:
        by_cell.setdefault(r["cell"], []).append(r)
    for cell, members in by_cell.items():
        lowest = min(members, key=lambda r: r["id"])
        assert not lowest["is_dup"], (cell, lowest)


def test_no_cross_cell_pairs(spark, sf_dir):
    """Marking is driven only by within-cell comparisons: recomputing
    dup ids from scratch with an explicit within-cell pair join yields
    the same set (guards against an accidental global join)."""
    from vector_search_go_spark.functions.metrics import cosine_dist
    from vector_search_go_spark.operators.kmeans import kmeans_assign, kmeans_fit
    from vector_search_go_spark.queries_pipeline import (
        _SEMDEDUP_EPS,
        _SEMDEDUP_ITERS,
        _SEMDEDUP_K,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    corpus = emb.select(F.col("vec_id").alias("id"), F.col("embedding").alias("vec"))
    cents = kmeans_fit(corpus, k=_SEMDEDUP_K, iters=_SEMDEDUP_ITERS, exact=True)
    assigned = kmeans_assign(corpus, cents)
    a = assigned.select("cell", F.col("id").alias("id_a"), F.col("vec").alias("va"))
    b = assigned.select("cell", F.col("id").alias("id_b"), F.col("vec").alias("vb"))
    expected = {
        r["id_b"]
        for r in a.join(b, on="cell")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(cosine_dist(F.col("va"), F.col("vb")) <= _SEMDEDUP_EPS)
        .select("id_b")
        .distinct()
        .collect()
    }
    got = {
        r["id"]
        for r in dedup_semantic_clusters(spark, sf_dir).filter("is_dup").collect()
    }
    assert got == expected
