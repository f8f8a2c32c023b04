"""Incremental LSH bucket ingest: streaming result == batch bucketize."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from vector_search_go_spark.config import LshConfig
from vector_search_go_spark.lsh.index import LshIndex
from vector_search_go_spark.lsh.search import lsh_search
from vector_search_go_spark.streaming.ingest import ingest_to_bucket_store


@pytest.fixture(scope="module")
def corpus_file_dir(spark, sf_dir, tmp_path_factory):
    d = tmp_path_factory.mktemp("vec_stream")
    spark.read.parquet(f"{sf_dir}/embeddings.parquet").selectExpr(
        "vec_id as id", "cast(embedding as array<double>) as vec"
    ).write.mode("overwrite").parquet(str(d / "vecs"))
    return str(d / "vecs")


def test_stream_ingest_matches_batch(spark, sf_dir, corpus_file_dir, tmp_path):
    corpus = spark.read.parquet(corpus_file_dir)
    cfg = LshConfig(dims=64, n_trees=8, k_min_vecs=50, seed=11)
    idx = LshIndex.train(spark, corpus, cfg)

    stream = spark.readStream.schema("id bigint, vec array<double>").parquet(
        corpus_file_dir
    )
    bucket_path = str(tmp_path / "buckets")
    ingest_to_bucket_store(
        spark, stream, idx.forest, bucket_path, str(tmp_path / "ckpt")
    )
    streamed = spark.read.parquet(bucket_path)
    want = {(r["tree"], r["hash"], r["id"]) for r in idx.buckets.collect()}
    got = {(r["tree"], r["hash"], r["id"]) for r in streamed.collect()}
    assert got == want


def test_search_over_streamed_buckets(spark, corpus_file_dir, tmp_path):
    """An index whose buckets came from the stream answers searches
    identically to the batch-trained one."""
    corpus = spark.read.parquet(corpus_file_dir)
    cfg = LshConfig(dims=64, n_trees=8, k_min_vecs=50, seed=11)
    idx = LshIndex.train(spark, corpus, cfg)
    stream = spark.readStream.schema("id bigint, vec array<double>").parquet(
        corpus_file_dir
    )
    bucket_path = str(tmp_path / "buckets2")
    ingest_to_bucket_store(
        spark, stream, idx.forest, bucket_path, str(tmp_path / "ckpt2")
    )
    idx_streamed = LshIndex(
        cfg,
        idx.forest,
        corpus,
        spark.read.parquet(bucket_path).select(
            F.col("tree").cast("int"), "hash", "id"
        ),
    )
    queries = corpus.limit(3).selectExpr("id as query_id", "vec as qvec")
    a = lsh_search(idx, queries, metric="l2", k=5).collect()
    b = lsh_search(idx_streamed, queries, metric="l2", k=5).collect()
    key = lambda r: (r["query_id"], r["rn"])  # noqa: E731
    assert sorted([tuple(r) for r in a], key=lambda t: (t[0], t[3])) == sorted(
        [tuple(r) for r in b], key=lambda t: (t[0], t[3])
    )

def test_vecs_stream_feeds_lsh_ingest(spark, corpus_file_dir, tmp_path):
    """Vectors arriving as .fvecs shards stream straight into the
    bucket store — the SIFT-shard landing directory composed with
    incremental LSH ingest, no parquet conversion hop. Bucket rows must
    equal the driver-side forest hashes of the shard's vectors."""
    import numpy as np

    from vector_search_go_spark.sources import register_vecs_source, write_fvecs

    register_vecs_source(spark)
    corpus = spark.read.parquet(corpus_file_dir)
    cfg = LshConfig(dims=64, n_trees=4, k_min_vecs=50, seed=11)
    idx = LshIndex.train(spark, corpus, cfg)

    land = tmp_path / "landing"
    land.mkdir()
    rng = np.random.default_rng(5)
    new = rng.standard_normal((50, 64)).astype("float32")
    write_fvecs(str(land / "new-0.fvecs"), new)

    stream = (
        spark.readStream.format("vecs")
        .option("kind", "fvecs")
        .load(str(land))
        .selectExpr("id", "cast(vec as array<double>) as vec")
    )
    bucket_path = str(tmp_path / "vbuckets")
    ingest_to_bucket_store(
        spark, stream, idx.forest, bucket_path, str(tmp_path / "vckpt")
    )

    # first file seen by the stream gets sequential base index 0
    base = 0 << 32
    want_h = idx.forest.hash_batch(new.astype(np.float64))
    want = {
        (t, int(want_h[i][t]), base + i)
        for i in range(len(new))
        for t in range(cfg.n_trees)
    }
    got = {
        (r["tree"], r["hash"], r["id"])
        for r in spark.read.parquet(bucket_path).collect()
    }
    assert got == want


def test_compact_bucket_store(spark, corpus_file_dir, tmp_path):
    """Two ingest microbatch runs fragment the store; compaction must
    (1) preserve the exact bucket-row set, (2) collapse to one file per
    tree, (3) leave every file hash-sorted with row-group stats — the
    properties the point-lookup's row-group skipping needs — and
    (4) answer searches identically."""
    import pyarrow.parquet as pq

    from vector_search_go_spark.streaming.ingest import compact_bucket_store

    corpus = spark.read.parquet(corpus_file_dir)
    cfg = LshConfig(dims=64, n_trees=4, k_min_vecs=50, seed=11)
    idx = LshIndex.train(spark, corpus, cfg)

    half_a = corpus.filter("id % 2 = 0")
    half_b = corpus.filter("id % 2 = 1")
    d = tmp_path / "frag"
    half_a.write.parquet(str(d / "in_a"))
    half_b.write.parquet(str(d / "in_b"))
    bucket_path = str(d / "buckets")
    for i, src in enumerate(("in_a", "in_b")):
        stream = spark.readStream.schema("id bigint, vec array<double>").parquet(
            str(d / src)
        )
        ingest_to_bucket_store(
            spark, stream, idx.forest, bucket_path, str(d / f"ckpt{i}")
        )

    before = {
        (r["tree"], r["hash"], r["id"])
        for r in spark.read.parquet(bucket_path).collect()
    }
    stats = compact_bucket_store(spark, bucket_path)
    after_df = spark.read.parquet(bucket_path)
    after = {(r["tree"], r["hash"], r["id"]) for r in after_df.collect()}
    assert after == before
    assert stats["rows"] == len(before)
    assert stats["files_after"] <= cfg.n_trees < stats["files_before"]

    # pre-compaction copy survives until the caller confirms + gc's
    import os

    from vector_search_go_spark.streaming.ingest import gc_compacted_store

    backup = stats["backup_path"]
    assert os.path.isdir(backup)
    assert {
        (r["tree"], r["hash"], r["id"]) for r in spark.read.parquet(backup).collect()
    } == before
    assert gc_compacted_store(bucket_path) is True
    assert not os.path.isdir(backup)
    assert gc_compacted_store(bucket_path) is False

    import glob

    for f in glob.glob(f"{bucket_path}/tree=*/**/*.parquet", recursive=True):
        pf = pq.ParquetFile(f)
        hashes = pf.read(columns=["hash"]).column("hash").to_pylist()
        assert hashes == sorted(hashes)
        assert pf.metadata.row_group(0).column(0).statistics is not None

    idx_c = LshIndex(
        cfg, idx.forest, corpus,
        after_df.select(F.col("tree").cast("int"), "hash", "id"),
    )
    queries = corpus.limit(3).selectExpr("id as query_id", "vec as qvec")
    a = lsh_search(idx, queries, metric="l2", k=5).collect()
    b = lsh_search(idx_c, queries, metric="l2", k=5).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))

    # keep_backup=False: no retained copy, no extra disk, same rows
    stats2 = compact_bucket_store(spark, bucket_path, keep_backup=False)
    assert stats2["backup_path"] is None
    assert not os.path.isdir(bucket_path.rstrip("/") + ".compact-old")
    assert {
        (r["tree"], r["hash"], r["id"])
        for r in spark.read.parquet(bucket_path).collect()
    } == before


def test_engine_compact_heals_replayed_store(spark, corpus_file_dir, tmp_path):
    """Engine-level maintenance loop: save -> an at-least-once replay
    appends duplicate bucket rows -> compact(dedup=True) restores the
    exact trained row set, and point_search answers identically."""
    from vector_search_go_spark.engine import VectorSearchEngine

    corpus = spark.read.parquet(corpus_file_dir)
    cfg = LshConfig(dims=64, n_trees=4, k_min_vecs=50, seed=11)
    eng = VectorSearchEngine(spark, cfg, metric="l2", backend="lsh")
    eng.train(corpus)
    path = str(tmp_path / "idx")
    eng.save(path)
    want = {(r["tree"], r["hash"], r["id"]) for r in eng._index.buckets.collect()}

    replay = spark.readStream.schema("id bigint, vec array<double>").parquet(
        corpus_file_dir
    )
    ingest_to_bucket_store(
        spark, replay, eng._index.forest, f"{path}/buckets", str(tmp_path / "ck")
    )
    qvec = [float(x) for x in corpus.limit(1).collect()[0]["vec"]]
    r1 = [tuple(r) for r in eng.point_search(path, qvec, k=5)]

    stats = VectorSearchEngine.compact(spark, path, dedup=True)
    got = {
        (r["tree"], r["hash"], r["id"])
        for r in spark.read.parquet(f"{path}/buckets").collect()
    }
    assert got == want and stats["rows"] == len(want)
    r2 = [tuple(r) for r in eng.point_search(path, qvec, k=5)]
    assert r1 == r2


def test_ivf_stream_ingest_and_compact(spark, corpus_file_dir, tmp_path):
    """IVF maintenance loop: save -> stream an at-least-once replay into
    the cells store (frozen centroids; assignment must equal the batch
    one, or dedup could not collapse it) -> compact(dedup=True) restores
    the exact saved row set and point lookups answer identically."""
    from vector_search_go_spark.operators.ann_ivf import ivf_point_search, ivf_save
    from vector_search_go_spark.streaming.ingest import (
        compact_cells_store,
        ingest_to_ivf_store,
    )

    corpus = spark.read.parquet(corpus_file_dir)
    cents = corpus.filter("id % 125 = 0").selectExpr(
        "cast(id / 125 as int) as cid", "vec as cvec"
    )
    path = str(tmp_path / "ivf")
    ivf_save(spark, corpus, cents, path, metric="cosine")
    want = {
        (r["cell"], r["id"])
        for r in spark.read.parquet(f"{path}/cells").select("cell", "id").collect()
    }
    qvec = [float(x) for x in corpus.limit(1).collect()[0]["vec"]]
    r1 = [tuple(r) for r in ivf_point_search(spark, path, qvec, "cosine", 5, 2).collect()]

    replay = spark.readStream.schema("id bigint, vec array<double>").parquet(
        corpus_file_dir
    )
    ingest_to_ivf_store(
        spark, replay, cents, f"{path}/cells", str(tmp_path / "ck"), metric="cosine"
    )
    doubled = spark.read.parquet(f"{path}/cells").count()
    assert doubled == 2 * len(want)

    stats = compact_cells_store(spark, f"{path}/cells", dedup=True)
    got = {
        (r["cell"], r["id"])
        for r in spark.read.parquet(f"{path}/cells").select("cell", "id").collect()
    }
    assert got == want and stats["rows"] == len(want)
    r2 = [tuple(r) for r in ivf_point_search(spark, path, qvec, "cosine", 5, 2).collect()]
    assert r1 == r2


def test_sink_log_guard_refuses_legacy_store(spark, tmp_path):
    """A store carrying a parquet file-sink _spark_metadata log must be
    refused by both append ingest and compaction — reads through such a
    directory resolve files via the log, so appends outside it would be
    invisible and a compaction would silently discard them."""
    import os

    import pytest

    from vector_search_go_spark.streaming.ingest import compact_bucket_store

    store = tmp_path / "legacy"
    (store / "_spark_metadata").mkdir(parents=True)
    (store / "tree=0").mkdir()
    with pytest.raises(ValueError, match="_spark_metadata"):
        compact_bucket_store(spark, str(store))

    corpus = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").selectExpr(
        "vec_id as id", "cast(embedding as array<double>) as vec"
    )
    cfg = LshConfig(dims=64, n_trees=2, k_min_vecs=50, seed=3)
    idx = LshIndex.train(spark, corpus, cfg)
    src = str(tmp_path / "in")
    corpus.limit(10).write.parquet(src)
    stream = spark.readStream.schema("id bigint, vec array<double>").parquet(src)
    with pytest.raises(ValueError, match="_spark_metadata"):
        ingest_to_bucket_store(
            spark, stream, idx.forest, str(store), str(tmp_path / "ck")
        )
    assert not os.listdir(store / "tree=0")  # nothing was appended


def test_search_correct_mid_compaction(spark, corpus_file_dir, tmp_path):
    """Close the maintenance loop under load: point lookups issued
    WHILE compact(dedup=True) runs must return either the CORRECT
    pre/post-compaction result (identical — dedup only collapses
    replay duplicates) or, only inside the two-rename swap window, a
    clean retryable read error — never wrong rows. The expensive
    compaction phase writes to .compact-tmp and leaves the live store
    untouched; 1M-scale latency measured by
    tools/scale_probe.py --compact-serve (SCALE.md)."""
    import threading

    from vector_search_go_spark.engine import VectorSearchEngine
    from vector_search_go_spark.lsh.search import lsh_point_search

    corpus = spark.read.parquet(corpus_file_dir)
    cfg = LshConfig(dims=64, n_trees=4, k_min_vecs=50, seed=11)
    idx = LshIndex.train(spark, corpus, cfg)
    path = str(tmp_path / "idx")
    idx.save(path)
    # fragment with an exact replay (at-least-once duplicates)
    dup = spark.read.parquet(f"{path}/buckets").select("tree", "hash", "id")
    dup.write.mode("append").partitionBy("tree").parquet(f"{path}/buckets")

    forest = LshIndex.load_forest(spark, path)
    qvec = corpus.limit(1).collect()[0]["vec"]
    want = sorted(
        (r["id"], r["dist"], r["rn"])
        for r in lsh_point_search(
            spark, path, qvec, metric="l2", k=5, forest=forest
        ).collect()
    )

    errs: list = []

    def compact() -> None:
        try:
            VectorSearchEngine.compact(spark, path, dedup=True)
        except Exception as e:  # surfaced below — never swallowed
            errs.append(e)

    t = threading.Thread(target=compact)
    t.start()
    during_ok = during_failed = 0
    while t.is_alive():
        try:
            got = sorted(
                (r["id"], r["dist"], r["rn"])
                for r in lsh_point_search(
                    spark, path, qvec, metric="l2", k=5, forest=forest
                ).collect()
            )
        except Exception:
            # acceptable ONLY as a transient read failure in the swap
            # window — the store must be healthy again afterwards
            during_failed += 1
            continue
        assert got == want, "mid-compaction lookup returned WRONG rows"
        during_ok += 1
    t.join()
    assert errs == []
    after = sorted(
        (r["id"], r["dist"], r["rn"])
        for r in lsh_point_search(
            spark, path, qvec, metric="l2", k=5, forest=forest
        ).collect()
    )
    assert after == want
    # Timing-dependent but scheduling-tolerant: a lookup may fail only
    # around the two-rename swap (a read planned before but executed
    # after the swap can add one more under CI load), and when enough
    # mid-compaction lookups ran, successes must dominate — the store
    # serves THROUGH the compaction, not just around it. The loop may
    # legitimately run zero iterations if a tiny compaction finishes
    # first, so no minimum-iteration assert.
    assert during_failed <= 2, f"{during_failed} failures: swap window is not tiny"
    if during_ok + during_failed >= 3:
        assert during_ok > during_failed
