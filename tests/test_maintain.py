"""Drift-aware maintenance probe (VERDICT r4 item 2): a stream whose
distribution drifts away from the frozen forest's build sample must
(a) trip the staleness metric, (b) measurably degrade recall on the
drifted region (hot buckets + thinning discard true neighbors), and
(c) recover after the triggered clear-and-rebuild — the reference's
Train semantics (lsh/lsh.go:107-110), fired by measurement instead of
by hand."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from vector_search_go_spark.config import LshConfig
from vector_search_go_spark.lsh.index import LshIndex
from vector_search_go_spark.lsh.search import lsh_search
from vector_search_go_spark.operators.exact_knn import exact_knn_join
from vector_search_go_spark.operators.recall import (
    distance_based_precision_recall,
    mean_precision_recall,
)

DIMS, N_A, N_B = 16, 1500, 1500
# 16 trees / k_min 50: a FRESH index on A+B measures 0.97 eps-recall at
# this shape — the healthy bar the rebuilt store must get back to
CFG = LshConfig(dims=DIMS, n_trees=16, k_min_vecs=50, seed=3, max_bucket_size=60)


def _df(spark, X, start_id=0):
    return spark.createDataFrame(
        [(int(start_id + i), X[i].tolist()) for i in range(len(X))],
        "id bigint, vec array<double>",
    )


@pytest.fixture(scope="module")
def drifted_store(spark, tmp_path_factory):
    """Train on region A, stream region B (shifted 6 sigma) through the
    FROZEN forest into the saved store — buckets via the streaming
    ingest path, vectors via the at-least-once append contract."""
    from vector_search_go_spark.streaming.ingest import ingest_to_bucket_store

    base = tmp_path_factory.mktemp("drift")
    rng = np.random.default_rng(17)
    A = rng.standard_normal((N_A, DIMS))
    B = rng.standard_normal((N_B, DIMS)) + 6.0
    path = str(base / "idx")
    LshIndex.train(spark, _df(spark, A), CFG).save(path)

    land = str(base / "landing")
    _df(spark, B, start_id=N_A).write.mode("overwrite").parquet(land)
    stream = spark.readStream.schema("id bigint, vec array<double>").parquet(land)
    forest = LshIndex.load_forest(spark, path)
    ingest_to_bucket_store(
        spark, stream, forest, f"{path}/buckets", str(base / "ckpt")
    )
    spark.read.parquet(land).write.mode("append").parquet(f"{path}/vectors")
    spark.catalog.refreshByPath(f"{path}/buckets")
    spark.catalog.refreshByPath(f"{path}/vectors")
    return path, A, B


def _recall_on_b(spark, path, B) -> float:
    idx = LshIndex.load(spark, path)
    rng = np.random.default_rng(29)
    qidx = rng.choice(N_B, size=15, replace=False)
    queries = spark.createDataFrame(
        [(int(i), B[i].tolist()) for i in qidx],
        "query_id bigint, qvec array<double>",
    )
    truth = exact_knn_join(queries, idx.vectors, metric="l2", k=10)
    pred = lsh_search(idx, queries, metric="l2", k=10)
    _, r = mean_precision_recall(
        distance_based_precision_recall(pred, truth, 0.05)
    )
    return r


def test_staleness_trips_on_drift(spark, drifted_store):
    from vector_search_go_spark.streaming.maintain import bucket_staleness

    path, _, _ = drifted_store
    st = bucket_staleness(spark, path)
    assert st["n_build"] == N_A * CFG.n_trees
    assert st["n_now"] == (N_A + N_B) * CFG.n_trees
    assert st["growth"] == pytest.approx(1.0)
    # drifted mass concentrates in few buckets the old trees cannot
    # split -> the mass DISTRIBUTION shifts hard even though the
    # buckets themselves may pre-exist (new_bucket_mass can be 0 when
    # the shifted cluster lands in existing corner leaves — tv_drift is
    # the load-bearing signal)
    assert st["tv_drift"] > 0.25
    assert 0.0 <= st["new_bucket_mass"] <= 1.0


def test_drift_degrades_then_rebuild_restores_recall(spark, drifted_store):
    from vector_search_go_spark.engine import VectorSearchEngine

    path, A, B = drifted_store
    r_before = _recall_on_b(spark, path, B)
    assert r_before < 0.7, f"drift did not degrade recall ({r_before})"

    res = VectorSearchEngine.maintain(spark, path)
    assert res["action"] == "rebuilt"

    r_after = _recall_on_b(spark, path, B)
    assert r_after >= 0.9, f"rebuild did not restore recall ({r_after})"

    # rebuilt store is re-baselined: staleness is now clean
    from vector_search_go_spark.streaming.maintain import bucket_staleness

    st = bucket_staleness(spark, path)
    assert st["tv_drift"] < 0.01 and st["growth"] == pytest.approx(0.0)
    assert st["n_now"] == (N_A + N_B) * CFG.n_trees


def test_maintain_noop_below_thresholds(spark, tmp_path):
    from vector_search_go_spark.streaming.maintain import maintain

    rng = np.random.default_rng(31)
    X = rng.standard_normal((800, DIMS))
    path = str(tmp_path / "steady")
    LshIndex.train(spark, _df(spark, X), CFG).save(path)
    res = maintain(spark, path)
    assert res["action"] == "none"
    assert res["tv_drift"] == pytest.approx(0.0)
