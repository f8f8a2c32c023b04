"""ingest_cycle: the one-call streaming maintenance loop (drain ->
staleness -> rebuild-or-compact). The drift/recall mechanics are pinned
in tests/test_maintain.py; this file pins the CYCLE wrapper — routing,
the combined LSH drain (buckets AND vectors under one checkpoint), the
rebuild trigger, and the fragmentation-compaction branch."""

from __future__ import annotations

import numpy as np
import pytest

from vector_search_go_spark.config import LshConfig
from vector_search_go_spark.lsh.index import LshIndex

DIMS = 16
CFG = LshConfig(dims=DIMS, n_trees=8, k_min_vecs=50, seed=3)


def _df(spark, X, start_id=0):
    return spark.createDataFrame(
        [(int(start_id + i), X[i].tolist()) for i in range(len(X))],
        "id bigint, vec array<double>",
    )


def _stream(spark, tmp_path, X, start_id, tag):
    land = str(tmp_path / f"land_{tag}")
    _df(spark, X, start_id).write.mode("overwrite").parquet(land)
    return spark.readStream.schema("id bigint, vec array<double>").parquet(land)


def test_lsh_cycle_drifted_stream_rebuilds(spark, tmp_path):
    from vector_search_go_spark.engine import VectorSearchEngine
    from vector_search_go_spark.streaming.maintain import bucket_staleness

    rng = np.random.default_rng(7)
    A = rng.standard_normal((600, DIMS))
    B = rng.standard_normal((600, DIMS)) + 6.0
    path = str(tmp_path / "idx")
    LshIndex.train(spark, _df(spark, A), CFG).save(path)

    res = VectorSearchEngine.ingest_cycle(
        spark,
        _stream(spark, tmp_path, B, 600, "b"),
        path,
        str(tmp_path / "ckpt_b"),
    )
    assert res["action"] == "rebuilt"
    # the combined drain appended BOTH components before the rebuild:
    # the retrained store was built from all 1200 vectors
    idx = LshIndex.load(spark, path)
    assert idx.vectors.count() == 1200
    st = bucket_staleness(spark, path)
    assert st["n_build"] == 1200 * CFG.n_trees
    assert st["tv_drift"] == pytest.approx(0.0)


def test_lsh_cycle_steady_state_none_then_compacts(spark, tmp_path):
    from vector_search_go_spark.streaming.ingest import parquet_file_count
    from vector_search_go_spark.streaming.maintain import ingest_cycle

    rng = np.random.default_rng(11)
    A = rng.standard_normal((600, DIMS))
    A2 = rng.standard_normal((60, DIMS))  # in-distribution, 10% growth
    path = str(tmp_path / "idx")
    LshIndex.train(spark, _df(spark, A), CFG).save(path)

    res = ingest_cycle(
        spark,
        _stream(spark, tmp_path, A2, 600, "a2"),
        path,
        str(tmp_path / "ckpt_a2"),
        compact_over=None,
    )
    assert res["action"] == "none"

    # same store, another small drain, fragmentation trigger forced on:
    A3 = rng.standard_normal((60, DIMS))
    before_b = parquet_file_count(f"{path}/buckets")
    before_v = parquet_file_count(f"{path}/vectors")
    res = ingest_cycle(
        spark,
        _stream(spark, tmp_path, A3, 660, "a3"),
        path,
        str(tmp_path / "ckpt_a3"),
        compact_over=0,
    )
    assert res["action"] == "compacted"
    # the combined drain fragments BOTH components; the quiet path
    # heals both
    stats = res["compact"]
    assert stats[f"{path}/buckets"]["files_after"] < before_b
    assert stats[f"{path}/vectors"]["files_after"] <= before_v
    # compaction preserved every row (no dedup requested)
    idx = LshIndex.load(spark, path)
    assert idx.buckets.count() == 720 * CFG.n_trees
    assert idx.vectors.count() == 720


def test_ivf_cycle_uses_persisted_metric(spark, tmp_path):
    from vector_search_go_spark.operators.ann_ivf import ivf_save
    from vector_search_go_spark.operators.kmeans import kmeans_fit
    from vector_search_go_spark.streaming.maintain import (
        ingest_cycle,
        store_metric,
    )

    rng = np.random.default_rng(13)
    X = rng.standard_normal((400, DIMS))
    Y = rng.standard_normal((400, DIMS)) + 6.0
    path = str(tmp_path / "ivf")
    cents = kmeans_fit(_df(spark, X), 8, iters=2, dim=DIMS)
    ivf_save(spark, _df(spark, X), cents, path, metric="l2")

    # no metric kwarg anywhere: the cycle resolves it from store_meta
    res = ingest_cycle(
        spark,
        _stream(spark, tmp_path, Y, 400, "y"),
        path,
        str(tmp_path / "ckpt_y"),
    )
    assert res["action"] == "rebuilt"  # growth 1.0 + 6-sigma drift
    assert store_metric(spark, path) == "l2"
    assert spark.read.parquet(f"{path}/cells").count() == 800


def test_cycle_refuses_ivfpq_store(spark, tmp_path):
    """Coded stores cannot absorb raw vectors: appending (id, vec, cell)
    into a (cell, id, codes) table would corrupt it with mixed schemas
    AND mark the batches drained — refuse before touching anything."""
    from pyspark.sql import functions as F

    from vector_search_go_spark.operators.kmeans import kmeans_fit
    from vector_search_go_spark.operators.pq import ivfpq_save, pq_codebook
    from vector_search_go_spark.streaming.maintain import ingest_cycle

    rng = np.random.default_rng(19)
    X = rng.standard_normal((300, DIMS))
    corpus = _df(spark, X)
    path = str(tmp_path / "ivfpq")
    cents = kmeans_fit(corpus, 4, iters=2, dim=DIMS)
    emb = corpus.select(
        F.col("id").alias("vec_id"), F.col("vec").alias("embedding")
    )
    ivfpq_save(spark, corpus, cents, pq_codebook(emb), path, metric="l2")
    with pytest.raises(ValueError, match="ivfpq"):
        ingest_cycle(
            spark,
            _stream(spark, tmp_path, X, 300, "pq"),
            path,
            str(tmp_path / "ckpt_pq"),
        )


def test_cycle_refuses_scan_kwargless_misroute(spark, tmp_path):
    """A scan store reaching ingest_cycle routes to the LSH branch and
    must fail loudly on the missing forest — never silently append."""
    from vector_search_go_spark.operators.exact_knn import scan_save
    from vector_search_go_spark.streaming.maintain import ingest_cycle

    rng = np.random.default_rng(17)
    X = rng.standard_normal((100, DIMS))
    path = str(tmp_path / "scan")
    scan_save(spark, _df(spark, X), path, metric="l2")
    with pytest.raises(Exception):
        ingest_cycle(
            spark,
            _stream(spark, tmp_path, X, 100, "x"),
            path,
            str(tmp_path / "ckpt_x"),
        )
