"""Streaming ANN serving == batch search, query for query."""

from __future__ import annotations

import shutil

import pytest

from vector_search_go_spark.config import LshConfig
from vector_search_go_spark.lsh.index import LshIndex
from vector_search_go_spark.lsh.search import lsh_search
from vector_search_go_spark.streaming.serving import serve_query_stream


def test_streamed_queries_match_batch(spark, sf_dir, tmp_path):
    shutil.rmtree("/tmp/ann_serving_ckpt_ann_results_test", ignore_errors=True)
    corpus = spark.read.parquet(f"{sf_dir}/embeddings.parquet").selectExpr(
        "vec_id as id", "cast(embedding as array<double>) as vec"
    )
    cfg = LshConfig(dims=64, n_trees=8, k_min_vecs=50, seed=3)
    idx = LshIndex.train(spark, corpus, cfg)

    queries = corpus.filter("id % 100 = 0").selectExpr(
        "id as query_id", "vec as qvec"
    )
    qdir = str(tmp_path / "qstream")
    queries.write.parquet(qdir)
    qstream = spark.readStream.schema("query_id bigint, qvec array<double>").parquet(
        qdir
    )
    serve_query_stream(
        qstream, idx, metric="l2", k=5, sink_table="ann_results_test"
    )
    got = {
        (r["query_id"], r["rn"]): (r["id"], r["dist"])
        for r in spark.table("ann_results_test").collect()
    }
    want = {
        (r["query_id"], r["rn"]): (r["id"], r["dist"])
        for r in lsh_search(idx, queries, metric="l2", k=5).collect()
    }
    assert got == want
    spark.sql("DROP TABLE IF EXISTS ann_results_test")