"""Tombstone deletes (VERDICT r7 missing item 2): delete_ids masks every
read tier; purge_tombstones physically drops rows; parity pin =
serve-with-tombstones == serve-after-purge == re-saved-without-the-ids
(same models), all families including sharded."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from vector_search_go_spark.config import LshConfig
from vector_search_go_spark.lsh.index import LshIndex
from vector_search_go_spark.lsh.search import lsh_point_search
from vector_search_go_spark.operators.ann_ivf import ivf_point_search, ivf_save
from vector_search_go_spark.operators.exact_knn import scan_save
from vector_search_go_spark.operators.pq import (
    ivfpq_point_search,
    ivfpq_save,
    pq_codebook,
)
from vector_search_go_spark.streaming.delete import (
    delete_ids,
    purge_tombstones,
)

N, DIMS = 1200, 64
DEL = [7, 13, 210]  # ids tombstoned everywhere below


def _corpus_rows():
    rng = np.random.default_rng(5)
    centers = rng.normal(size=(16, DIMS)) * 2.0
    X = centers[rng.integers(0, 16, size=N)] + rng.normal(size=(N, DIMS))
    # make the deleted ids the exact duplicates of live id 700: a query
    # at that point ranks them in its top-k, so masking visibly changes
    # results (non-vacuous deletes)
    for i in DEL:
        X[i] = X[700]
    return X


@pytest.fixture(scope="module")
def stores(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("tomb")
    X = _corpus_rows()
    corpus = spark.createDataFrame(
        [(int(i), X[i].tolist()) for i in range(N)], "id bigint, vec array<double>"
    ).cache()
    corpus.count()
    live = corpus.filter(~F.col("id").isin(DEL)).cache()
    live.count()

    cfg = LshConfig(dims=DIMS, n_trees=6, k_min_vecs=50, seed=7)
    idx = LshIndex.train(spark, corpus, cfg)
    idx.save(str(base / "lsh"))
    # re-saved-without-ids twin: SAME forest, filtered components
    LshIndex(
        idx.config,
        idx.forest,
        idx.vectors.filter(~F.col("id").isin(DEL)),
        idx.buckets.filter(~F.col("id").isin(DEL)),
    ).save(str(base / "lsh_resaved"))

    step = N // 16
    cents = spark.createDataFrame(
        corpus.filter(F.col("id") % step == 0)
        .select((F.col("id") / step).cast("int").alias("cid"),
                F.col("vec").alias("cvec"))
        .collect(),
        "cid int, cvec array<double>",
    )
    ivf_save(spark, corpus, cents, str(base / "ivf"), metric="l2")
    ivf_save(spark, live, cents, str(base / "ivf_resaved"), metric="l2")

    cb = spark.createDataFrame(
        pq_codebook(
            corpus.select(F.col("id").alias("vec_id"), F.col("vec").alias("embedding"))
        ).collect(),
        "sub int, code int, cvec array<double>",
    )
    ivfpq_save(spark, corpus, cents, cb, str(base / "ivfpq"), metric="l2")
    ivfpq_save(spark, live, cents, cb, str(base / "ivfpq_resaved"), metric="l2")
    ivfpq_save(spark, corpus, cents, cb, str(base / "ivfpq_sharded"),
               metric="l2", shards=3)
    ivfpq_save(spark, live, cents, cb, str(base / "ivfpq_sharded_resaved"),
               metric="l2", shards=3)

    scan_save(spark, corpus, str(base / "scan"), metric="l2")
    scan_save(spark, live, str(base / "scan_resaved"), metric="l2")

    # tombstone the unsharded + sharded stores
    for sub in ("lsh", "ivf", "ivfpq", "scan", "ivfpq_sharded"):
        delete_ids(spark, str(base / sub), DEL)

    q = X[700].tolist()  # the duplicate point: its top-k held DEL pre-delete
    live.unpersist()
    corpus.unpersist()
    return base, q


def _rows(df):
    return sorted(
        (r["id"], round(float(r["dist"]), 9), r["rn"]) for r in df.collect()
    )


def _frame_rows(pdf: pd.DataFrame):
    return sorted(
        (int(i), round(float(d), 9), int(rn))
        for i, d, rn in zip(pdf["id"], pdf["dist"], pdf["rn"])
    )


def test_spark_point_paths_mask_and_match_resave(spark, stores):
    base, q = stores
    pairs = [
        ("lsh", lambda p: lsh_point_search(spark, p, q, "l2", k=10)),
        ("ivf", lambda p: ivf_point_search(spark, p, q, "l2", k=10, nprobe=4)),
        ("ivfpq", lambda p: ivfpq_point_search(spark, p, q, "l2", k=10, nprobe=4)),
    ]
    for fam, fn in pairs:
        got = _rows(fn(str(base / fam)))
        want = _rows(fn(str(base / f"{fam}_resaved")))
        assert got == want, fam
        assert not any(i in dict((g[0], g) for g in got) for i in DEL), fam
        assert len(got) == 10, fam


def test_local_readers_mask_and_match_resave(stores):
    from vector_search_go_spark.serve.local_reader import (
        LocalIvfPqReader,
        LocalIvfReader,
        LocalLshReader,
        LocalScanReader,
    )

    base, q = stores
    mk = [
        ("lsh", lambda p: LocalLshReader(p, metric="l2")),
        ("lsh", lambda p: LocalLshReader(p, metric="l2", preload_buckets=True)),
        ("ivf", lambda p: LocalIvfReader(p, metric="l2", preload_cells=True)),
        ("ivf", lambda p: LocalIvfReader(p, metric="l2")),
        ("ivfpq", lambda p: LocalIvfPqReader(p)),
        ("ivfpq", lambda p: LocalIvfPqReader(p, preload_codes=True,
                                             preload_vectors=True)),
        ("scan", lambda p: LocalScanReader(p)),
    ]
    for fam, ctor in mk:
        kw = {"nprobe": 4} if fam in ("ivf", "ivfpq") else {}
        got = _frame_rows(ctor(str(base / fam)).search(np.asarray(q), k=10, **kw))
        want = _frame_rows(
            ctor(str(base / f"{fam}_resaved")).search(np.asarray(q), k=10, **kw)
        )
        assert got == want, fam
        assert not any(i in [g[0] for g in got] for i in DEL), fam


def test_sharded_router_masks_and_matches_resave(stores):
    from vector_search_go_spark.serve.sharded import ShardedReader

    base, q = stores
    with ShardedReader(str(base / "ivfpq_sharded")) as a, ShardedReader(
        str(base / "ivfpq_sharded_resaved")
    ) as b:
        got = _frame_rows(a.search(np.asarray(q), k=10, nprobe=4))
        want = _frame_rows(b.search(np.asarray(q), k=10, nprobe=4))
    assert got == want
    assert not any(i in [g[0] for g in got] for i in DEL)


def test_engine_load_masks(spark, stores):
    from vector_search_go_spark.engine import VectorSearchEngine

    base, q = stores
    eng = VectorSearchEngine.load(spark, str(base / "lsh"), metric="l2")
    qdf = spark.createDataFrame([(0, q)], "query_id bigint, qvec array<double>")
    ids = {r["id"] for r in eng.search(qdf, k=10).collect()}
    assert not ids & set(DEL)
    eng2 = VectorSearchEngine.load(spark, str(base / "scan"), metric="l2")
    ids2 = {r["id"] for r in eng2.search(qdf, k=10).collect()}
    assert not ids2 & set(DEL)


def test_purge_drops_rows_and_preserves_results(spark, stores):
    base, q = stores
    import os

    # purge the unsharded ivfpq + the sharded layout; results must not move
    for sub, fn in (
        ("ivfpq", lambda p: ivfpq_point_search(spark, p, q, "l2", k=10, nprobe=4)),
        ("lsh", lambda p: lsh_point_search(spark, p, q, "l2", k=10)),
    ):
        p = str(base / sub)
        before = _rows(fn(p))
        n_vec_before = spark.read.parquet(f"{p}/vectors").count()
        stats = purge_tombstones(spark, p)
        spark.catalog.clearCache()
        assert not os.path.exists(f"{p}/tombstones")
        assert stats["purged"] == len(DEL)
        n_vec_after = spark.read.parquet(f"{p}/vectors").count()
        assert n_vec_after == n_vec_before - len(DEL)
        assert _rows(fn(p)) == before, sub
    # sharded purge: every shard's tombstones cleared, router unchanged
    from vector_search_go_spark.serve.sharded import ShardedReader

    sp = str(base / "ivfpq_sharded")
    with ShardedReader(sp) as rd:
        before_s = _frame_rows(rd.search(np.asarray(q), k=10, nprobe=4))
    purge_tombstones(spark, sp)
    spark.catalog.clearCache()
    assert not any(
        os.path.exists(f"{sp}/shard={k}/tombstones") for k in range(3)
    )
    with ShardedReader(sp) as rd:
        assert _frame_rows(rd.search(np.asarray(q), k=10, nprobe=4)) == before_s


def test_reinserted_id_stays_masked(spark, stores, tmp_path):
    """Takedown semantics: a tombstone outlives re-insertion — an id
    appended back into the store stays masked until a purge."""
    import shutil

    base, q = stores
    p = str(tmp_path / "scan_reinsert")
    shutil.copytree(str(base / "scan"), p)
    # re-append one tombstoned id's row (its vector == X[700])
    row = (
        spark.read.parquet(f"{base}/scan_resaved/vectors")
        .filter(F.col("id") == 700)
        .select(F.lit(7).cast("bigint").alias("id"), "vec")
    )
    row.write.mode("append").parquet(f"{p}/vectors")
    from vector_search_go_spark.serve.local_reader import LocalScanReader

    got = LocalScanReader(p).search(np.asarray(q), k=10)
    assert 7 not in set(int(i) for i in got["id"])


def test_sharded_lsh_capped_delete_refreshes_hot_buckets(spark, tmp_path):
    """Deleting members of a HOT bucket on a sharded LSH layout moves
    its live size; delete_ids re-pins {path}/hot_buckets from the
    masked union, so the survivor rule runs with live keep_mods — the
    router must match a sharded store re-saved (same forest) without
    the ids."""
    from vector_search_go_spark.serve.sharded import ShardedReader

    rng = np.random.default_rng(11)
    n, n_dup = 3000, 400
    X = rng.standard_normal((n, DIMS))
    dup = rng.standard_normal(DIMS)
    for i in range(n - n_dup, n):
        X[i] = dup  # one unsplittable hot bucket in every tree
    corpus = spark.createDataFrame(
        [(int(i), X[i].tolist()) for i in range(n)], "id bigint, vec array<double>"
    ).cache()
    corpus.count()
    cfg = LshConfig(
        dims=DIMS, n_trees=4, k_min_vecs=50, seed=7, max_bucket_size=100
    )
    idx = LshIndex.train(spark, corpus, cfg)
    p = str(tmp_path / "lsh_sharded")
    idx.save(p, shards=3)
    # delete half the duplicate block: the hot bucket's LIVE size halves,
    # so keep_mod (ceil(sz/cap)) moves from 4 to 2 — a stale hot_buckets
    # table would thin with the wrong mod and break parity
    dels = list(range(n - n_dup, n - n_dup // 2))
    rep = delete_ids(spark, p, dels)
    assert rep["hot_buckets"] is not None
    p2 = str(tmp_path / "lsh_sharded_resaved")
    LshIndex(
        idx.config,
        idx.forest,
        idx.vectors.filter(~F.col("id").isin(dels)),
        idx.buckets.filter(~F.col("id").isin(dels)),
    ).save(p2, shards=3)
    with ShardedReader(p, metric="l2") as a, ShardedReader(
        p2, metric="l2"
    ) as b:
        for qv in (dup, X[5]):
            got = _frame_rows(a.search(qv, k=10))
            want = _frame_rows(b.search(qv, k=10))
            assert got == want
            assert not any(g[0] in set(dels) for g in got)
    corpus.unpersist()
