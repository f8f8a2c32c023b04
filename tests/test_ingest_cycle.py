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


DIMS_PQ = 64  # M_SUB x D_SUB — the PQ subspace layout's embedding dim


def _ivfpq_store(spark, X, path, k_cells=8):
    from pyspark.sql import functions as F

    from vector_search_go_spark.operators.kmeans import kmeans_fit
    from vector_search_go_spark.operators.pq import ivfpq_save, pq_codebook

    corpus = _df(spark, X)
    cents = kmeans_fit(corpus, k_cells, iters=2, dim=DIMS_PQ)
    emb = corpus.select(
        F.col("id").alias("vec_id"), F.col("vec").alias("embedding")
    )
    codebook = pq_codebook(emb)
    ivfpq_save(spark, corpus, cents, codebook, path, metric="l2")
    return cents, codebook


def test_ivfpq_cycle_streamed_store_equals_batch_built(spark, tmp_path):
    """Frozen-model IVFADC drain: an ivfpq store that absorbed a stream
    must answer point lookups bit-identically to a store batch-built
    (ivfpq_save) on the union corpus with the SAME models — the drain
    uses ivfpq_save's own assignment/encode projections."""
    from vector_search_go_spark.operators.pq import ivfpq_point_search, ivfpq_save
    from vector_search_go_spark.streaming.maintain import ingest_cycle

    rng = np.random.default_rng(19)
    X = rng.standard_normal((300, DIMS_PQ))
    Y = rng.standard_normal((40, DIMS_PQ))  # in-distribution growth
    path = str(tmp_path / "ivfpq")
    cents, codebook = _ivfpq_store(spark, X, path)

    res = ingest_cycle(
        spark,
        _stream(spark, tmp_path, Y, 300, "pq_y"),
        path,
        str(tmp_path / "ckpt_pq"),
        compact_over=None,
    )
    assert res["action"] == "none"  # 13% in-distribution growth
    assert spark.read.parquet(f"{path}/cells").count() == 340
    assert spark.read.parquet(f"{path}/vectors").count() == 340

    union_path = str(tmp_path / "ivfpq_union")
    ivfpq_save(
        spark,
        _df(spark, np.vstack([X, Y])),
        cents,
        codebook,
        union_path,
        metric="l2",
    )
    for q in (Y[7], X[5]):
        got = [
            (r["id"], r["dist"], r["rn"])
            for r in ivfpq_point_search(
                spark, path, q.tolist(), "l2", k=10, nprobe=4
            ).orderBy("rn").collect()
        ]
        want = [
            (r["id"], r["dist"], r["rn"])
            for r in ivfpq_point_search(
                spark, union_path, q.tolist(), "l2", k=10, nprobe=4
            ).orderBy("rn").collect()
        ]
        assert got == want and len(got) == 10


def test_ivfpq_cycle_drift_rebuilds_from_own_vectors(spark, tmp_path):
    """The ivfpq_save layout carries its full-precision rerank table, so
    the clear-and-rebuild needs no external source: a drifted stream
    trips cell staleness and the cycle retrains coarse centroids AND the
    PQ codebook on the store's own vectors; post-rebuild searches find
    drifted-region neighbors the frozen models quantized away."""
    from vector_search_go_spark.operators.exact_knn import exact_knn_join
    from vector_search_go_spark.operators.pq import ivfpq_point_search
    from vector_search_go_spark.streaming.maintain import (
        cell_staleness,
        ingest_cycle,
    )

    rng = np.random.default_rng(23)
    A = rng.standard_normal((400, DIMS_PQ))
    B = rng.standard_normal((400, DIMS_PQ)) + 6.0
    path = str(tmp_path / "ivfpq_drift")
    _ivfpq_store(spark, A, path)
    union = _df(spark, np.vstack([A, B]))

    def recall_on_b() -> float:
        hits = 0
        for qi in (0, 17, 311):
            truth = {
                r["id"]
                for r in exact_knn_join(
                    spark.createDataFrame(
                        [(0, B[qi].tolist())],
                        "query_id bigint, qvec array<double>",
                    ),
                    union,
                    metric="l2",
                    k=10,
                ).collect()
            }
            pred = {
                r["id"]
                for r in ivfpq_point_search(
                    spark, path, B[qi].tolist(), "l2", k=10, nprobe=8
                ).collect()
            }
            hits += len(pred & truth)
        return hits / 30

    # first cycle with thresholds that cannot trip: exercises the
    # ivfpq drain routing, leaves the frozen A-trained models in place
    res = ingest_cycle(
        spark,
        _stream(spark, tmp_path, B, 400, "pq_b"),
        path,
        str(tmp_path / "ckpt_pq_b"),
        compact_over=None,
        tv_threshold=10.0,
        growth_threshold=10.0,
    )
    assert res["action"] == "none"
    assert res["growth"] == pytest.approx(1.0)
    pre = recall_on_b()  # frozen codebook quantizes the +6 region badly

    # default thresholds trip on the same store; rebuild retrains
    # coarse centroids AND codebook from the store's own vectors
    from vector_search_go_spark.engine import VectorSearchEngine

    res = VectorSearchEngine.maintain(spark, path)
    assert res["action"] == "rebuilt"
    st = cell_staleness(spark, path)
    assert st["tv_drift"] == pytest.approx(0.0)  # re-baselined
    assert st["n_build"] == 800

    # the rebuild also re-picked the serving config by measurement
    # (VERDICT r5 item 4). History of this assertion: with RAW-vector
    # codes the retrained models still buried true neighbors ~340 deep
    # in ADC order on this low-contrast corpus (recall stalled at 0.67
    # at the 100-row floor even with every cell probed), so the probe
    # HAD to persist a larger budget. With r10 residual encoding the
    # retrained codebook quantizes within-cell variance and the SAME
    # probe now measures the floor — the pathology this machinery was
    # built for is gone on this fixture, which is the residual change
    # working as designed. The retune contract is "persist the
    # measured budget", not "persist a big one": assert the floor is
    # respected and the measured budget actually serves the band.
    from vector_search_go_spark.operators.pq import pq_shortlist

    assert res["recommended_shortlist"] >= pq_shortlist(10)
    post = recall_on_b()
    assert post > pre  # 0.47 -> 1.0 measured at this seed/shape
    assert post >= 0.85  # the band every other family gates at
    # the rebuilt store serves every streamed vector exactly: the exact
    # rerank pins self at rank 1, dist 0
    for qi in (0, 17, 311):
        top = (
            ivfpq_point_search(spark, path, B[qi].tolist(), "l2", k=1, nprobe=8)
            .orderBy("rn")
            .collect()[0]
        )
        assert top["id"] == 400 + qi and top["dist"] == 0.0


def test_ivfpq_cycle_validates_before_consuming_stream(spark, tmp_path):
    """Post-drain preconditions must be checked BEFORE the drain: the
    checkpoint commits consumed batches, so an error raised after it
    strands rows that a re-save (the error's own remediation) would
    then lose. A legacy store without build_stats, or a bad metric
    kwarg, must fail with ZERO rows drained."""
    import os
    import shutil

    from vector_search_go_spark.streaming.maintain import ingest_cycle

    rng = np.random.default_rng(29)
    X = rng.standard_normal((200, DIMS_PQ))
    path = str(tmp_path / "ivfpq_legacy")
    _ivfpq_store(spark, X, path)
    shutil.rmtree(f"{path}/build_stats")
    spark.catalog.refreshByPath(f"{path}/build_stats")

    ckpt = str(tmp_path / "ckpt_legacy")
    with pytest.raises(FileNotFoundError, match="build_stats"):
        ingest_cycle(
            spark,
            _stream(spark, tmp_path, X[:50], 200, "legacy"),
            path,
            ckpt,
        )
    assert not os.path.exists(ckpt)  # nothing was consumed
    assert spark.read.parquet(f"{path}/cells").count() == 200

    # bad kwargs are refused pre-drain too (ADC stores are l2-only)
    path2 = str(tmp_path / "ivfpq_metric")
    _ivfpq_store(spark, X, path2)
    ckpt2 = str(tmp_path / "ckpt_metric")
    with pytest.raises(ValueError, match="l2-only"):
        ingest_cycle(
            spark,
            _stream(spark, tmp_path, X[:50], 200, "metric"),
            path2,
            ckpt2,
            metric="cosine",
        )
    assert not os.path.exists(ckpt2)
    assert spark.read.parquet(f"{path2}/cells").count() == 200


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
