"""Trained-model persistence (operators.model_store): save/load
round-trip and bit-identity of cached vs freshly trained models."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from vector_search_go_spark.operators import model_store

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture()
def tmp_model_dir(tmp_path, monkeypatch):
    monkeypatch.setattr(model_store, "MODEL_DIR", str(tmp_path / "models"))
    yield str(tmp_path / "models")


def _corpus(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    return emb.select(F.col("vec_id").alias("id"), F.col("embedding").alias("vec"))


def test_save_load_roundtrip_bit_identical(spark, tmp_model_dir):
    from vector_search_go_spark.operators.kmeans import kmeans_fit

    cents = kmeans_fit(_corpus(spark), k=4, iters=2, exact=True)
    model_store.save_model(cents, "km_test", SF_DIR)
    loaded = model_store.load_model(spark, "km_test", SF_DIR)
    assert loaded is not None
    fresh = {r["cid"]: r["cvec"] for r in cents.collect()}
    back = {r["cid"]: r["cvec"] for r in loaded.collect()}
    assert fresh == back  # parquet double round-trip is lossless


def test_load_missing_returns_none(spark, tmp_model_dir):
    assert model_store.load_model(spark, "never_saved", SF_DIR) is None


def test_cached_df_trains_once(spark, tmp_model_dir):
    calls = []

    def build():
        calls.append(1)
        return spark.range(3).select(F.col("id").cast("int").alias("cid"))

    a = model_store.cached_df(spark, "once", SF_DIR, build)
    b = model_store.cached_df(spark, "once", SF_DIR, build)
    assert len(calls) == 1
    assert sorted(r["cid"] for r in a.collect()) == sorted(
        r["cid"] for r in b.collect()
    ) == [0, 1, 2]


def test_model_path_distinguishes_sf_dirs(tmp_model_dir):
    p1 = model_store.model_path("m", "/root/testdata/sf0.001")
    p2 = model_store.model_path("m", "/root/testdata/sf0.01")
    assert p1 != p2


def test_trained_pq_query_identical_cold_and_warm(spark, tmp_model_dir):
    """pq_search_adc_trained must return the same rows whether the
    codebook is trained inline (cold cache) or loaded (warm cache)."""
    from vector_search_go_spark.queries_pipeline import pq_search_adc_trained

    cold = pq_search_adc_trained(spark, SF_DIR).collect()
    assert os.path.isdir(tmp_model_dir)  # cache was written
    warm = pq_search_adc_trained(spark, SF_DIR).collect()
    assert sorted(
        [(r["query_id"], r["id"], r["dist"], r["rn"]) for r in cold]
    ) == sorted([(r["query_id"], r["id"], r["dist"], r["rn"]) for r in warm])


def test_store_path_embeds_layout_version(monkeypatch, tmp_model_dir):
    """Serving-store caches key on STORE_LAYOUT_VERSION (VERDICT r6
    item 6): bumping the token changes the path, so a stale-format
    store can never satisfy an if-not-exists reuse check — the caller
    rebuilds into the new slot."""
    p1 = model_store.store_path("scan_sharded3_l2", SF_DIR)
    assert f"-L{model_store.STORE_LAYOUT_VERSION}-" in os.path.basename(p1)
    monkeypatch.setattr(
        model_store, "STORE_LAYOUT_VERSION",
        model_store.STORE_LAYOUT_VERSION + 1,
    )
    p2 = model_store.store_path("scan_sharded3_l2", SF_DIR)
    assert p1 != p2
    # the old slot existing cannot satisfy the new key
    os.makedirs(os.path.join(p1, "shards_meta"), exist_ok=True)
    assert not os.path.exists(os.path.join(p2, "shards_meta"))


def test_local_rows_detects_rewrite_between_load_and_use(spark, tmp_model_dir):
    """ADVICE r11: local_rows must refuse the driver-side fast path when
    the model directory changed after load_model pinned its listing —
    the caller then .collect()s through the same Spark plan."""
    df0 = spark.createDataFrame([(1, 10.0), (2, 20.0)], "cid int, x double")
    model_store.save_model(df0, "stamp_probe", SF_DIR)
    loaded = model_store.load_model(spark, "stamp_probe", SF_DIR)
    assert model_store.local_rows(loaded, ["cid", "x"]) is not None
    # rewrite the slot (different row count -> different file size)
    df1 = spark.createDataFrame([(1, 10.0), (2, 20.0), (3, 30.0)], "cid int, x double")
    model_store.save_model(df1, "stamp_probe", SF_DIR)
    assert model_store.local_rows(loaded, ["cid", "x"]) is None
