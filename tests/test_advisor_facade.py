"""Advisor-in-the-facade: train(auto=True) must pick scan on corpora
where no index prunes in-band (the SCALE.md near-uniform angular
fixture) and an index on genuinely clustered data — with the measured
decision stored and persisted (VERDICT r4 item 4)."""

from __future__ import annotations

import numpy as np
import pytest


def _df(spark, X):
    return spark.createDataFrame(
        [(int(i), X[i].tolist()) for i in range(len(X))],
        "id bigint, vec array<double>",
    )


@pytest.fixture(scope="module")
def clustered(spark):
    # well-separated clusters: centers scaled far above the unit noise
    rng = np.random.default_rng(3)
    centers = rng.normal(size=(16, 16)) * 20.0
    X = centers[rng.integers(0, 16, size=3000)] + rng.normal(size=(3000, 16))
    return _df(spark, X)


@pytest.fixture(scope="module")
def uniform_angular(spark):
    # near-uniform on the sphere at 256-d — the SCALE.md NYTimes-shape
    # regime where NO index prunes in-band. The probe threshold is set
    # at the true k=10 NN distance regime (computed exactly below):
    # without a workload MaxDist, distance concentration makes the
    # eps-relaxed recall trivially in-band for any candidate set.
    rng = np.random.default_rng(5)
    X = rng.normal(size=(3000, 256))
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    D = 1 - X[:50] @ X.T
    np.fill_diagonal(D[:, :50], 2)
    thr = float(np.median(np.sort(D, axis=1)[:, 9]) * 1.02)
    return _df(spark, X), thr


def test_auto_train_picks_index_on_clustered(spark, clustered):
    from vector_search_go_spark.engine import VectorSearchEngine

    eng = VectorSearchEngine(spark, metric="l2", backend="lsh")
    eng.train(clustered, auto=True)
    d = eng.advisor_decision
    assert d is not None
    assert eng.backend in ("lsh", "ivf")
    assert d["family"] == eng.backend
    assert d["cand_frac"] < 0.5  # an index only wins by pruning
    assert d["eps_recall"] >= 0.85
    # the engine is immediately usable with the chosen backend
    q = spark.createDataFrame(
        [(0, clustered.head()["vec"])], "query_id bigint, qvec array<double>"
    )
    assert eng.search(q, k=5).count() == 5


def test_auto_train_falls_back_to_scan_on_uniform(spark, uniform_angular):
    from vector_search_go_spark.engine import VectorSearchEngine

    df, thr = uniform_angular
    eng = VectorSearchEngine(spark, metric="cosine", backend="lsh")
    eng.train(df, auto=True, probe_threshold=thr)
    d = eng.advisor_decision
    assert d is not None
    assert eng.backend == "exact"
    assert d["family"] == "exact"
    assert d["eps_recall"] == 1.0 and d["cand_frac"] == 1.0
    q = spark.createDataFrame(
        [(0, df.head()["vec"])], "query_id bigint, qvec array<double>"
    )
    assert eng.search(q, k=5, threshold=thr).count() == 5


def test_auto_decision_persists_with_saved_store(spark, clustered, tmp_path):
    import glob
    import json

    from vector_search_go_spark.engine import VectorSearchEngine

    eng = VectorSearchEngine(spark, metric="l2", backend="lsh")
    eng.train(clustered, auto=True)
    path = str(tmp_path / "auto_store")
    eng.save(path)
    files = glob.glob(f"{path}/advisor/*.json")
    assert files
    with open(files[0]) as fh:
        saved = json.loads(next(line for line in fh if line.strip()))
    assert json.loads(saved["advisor_json"]) == eng.advisor_decision


def test_ivf_backend_end_to_end(spark, clustered, tmp_path):
    from vector_search_go_spark.engine import VectorSearchEngine
    from vector_search_go_spark.operators.ann_ivf import ivf_point_search

    eng = VectorSearchEngine(spark, metric="l2", backend="ivf", ivf_cells=8)
    eng.train(clustered)
    qvec = clustered.head()["vec"]
    q = spark.createDataFrame(
        [(0, qvec)], "query_id bigint, qvec array<double>"
    )
    live = [
        (r["id"], r["dist"], r["rn"])
        for r in eng.search(q, k=5).orderBy("rn").collect()
    ]
    path = str(tmp_path / "ivf_store")
    eng.save(path)
    served = [
        (r["id"], r["dist"], r["rn"])
        for r in ivf_point_search(
            spark, path, qvec, metric="l2", k=5, nprobe=eng.ivf_nprobe
        ).orderBy("rn").collect()
    ]
    assert live == served


def test_auto_train_preserves_user_config_fields(spark, clustered):
    # the advisor only decides (trees, k_min); user-set candidate cap,
    # seed, sample size, and hot-bucket bound must survive the rebuild
    from vector_search_go_spark.config import LshConfig
    from vector_search_go_spark.engine import VectorSearchEngine

    eng = VectorSearchEngine(
        spark,
        config=LshConfig(
            dims=16, max_candidates=123, seed=7, sample_size=9999,
            max_bucket_size=77,
        ),
        metric="l2",
        backend="lsh",
    )
    eng.train(clustered, auto=True)
    assert eng.backend == "lsh"  # deterministic on this fixture
    c = eng.config
    assert (c.max_candidates, c.seed, c.sample_size, c.max_bucket_size) == (
        123, 7, 9999, 77,
    )


def test_ivf_store_save_load_roundtrip(spark, clustered, tmp_path):
    from vector_search_go_spark.engine import VectorSearchEngine

    eng = VectorSearchEngine(spark, metric="l2", backend="ivf", ivf_cells=8)
    eng.train(clustered)
    eng.advisor_decision = {
        "family": "ivf", "config": "cells=8,nprobe=4",
        "eps_recall": 1.0, "cand_frac": 0.5,
    }
    path = str(tmp_path / "ivf_rt")
    eng.save(path)
    back = VectorSearchEngine.load(spark, path, metric="l2")
    assert back.backend == "ivf"
    assert back.advisor_decision == eng.advisor_decision
    qvec = clustered.head()["vec"]
    q = spark.createDataFrame([(0, qvec)], "query_id bigint, qvec array<double>")
    a = [(r["id"], r["dist"]) for r in eng.search(q, k=5).orderBy("rn").collect()]
    b = [(r["id"], r["dist"]) for r in back.search(q, k=5).orderBy("rn").collect()]
    assert a == b


def test_metric_rebuild_preserves_max_bucket_size(spark):
    # the constructor's is_angular rebuild must carry EVERY user field,
    # including the hot-bucket cap (review r5 finding)
    from vector_search_go_spark.config import LshConfig
    from vector_search_go_spark.engine import VectorSearchEngine

    eng = VectorSearchEngine(
        spark,
        config=LshConfig(
            dims=16, is_angular=False, max_bucket_size=77, max_candidates=5,
            seed=9, sample_size=1234,
        ),
        metric="cosine",  # forces the rebuild branch
    )
    c = eng.config
    assert c.is_angular is True
    assert (c.max_bucket_size, c.max_candidates, c.seed, c.sample_size) == (
        77, 5, 9, 1234,
    )
