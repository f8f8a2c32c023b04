"""Streaming MinHash dedup gate == batch dedup_minhash_lsh semantics,
plus cross-drain state persistence through the checkpoint."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vector_search_go_spark.queries_text import dedup_minhash_lsh
from vector_search_go_spark.streaming.dedup import (
    DOC_SCHEMA,
    duplicate_verdicts,
    run_dedup_gate,
)


@pytest.fixture()
def docs_stream_dir(spark, sf_dir, tmp_path):
    d = tmp_path / "docs_stream"
    (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(str(d))
    )
    return str(d)


def _batch_expectations(spark, sf_dir):
    pairs = dedup_minhash_lsh(spark, sf_dir)
    per_b = pairs.groupBy("doc_b").agg(F.min("doc_a").alias("min_a"))
    return {r["doc_b"]: r["min_a"] for r in per_b.collect()}


def test_gate_matches_batch_pairs(spark, sf_dir, docs_stream_dir, tmp_path):
    stream = spark.readStream.schema(DOC_SCHEMA).parquet(docs_stream_dir)
    hits_path = str(tmp_path / "hits")
    run_dedup_gate(spark, stream, hits_path, str(tmp_path / "ckpt"))
    verdicts = {
        r["doc_id"]: r["dup_of"]
        for r in duplicate_verdicts(spark.read.parquet(hits_path)).collect()
    }
    want = _batch_expectations(spark, sf_dir)
    assert verdicts == want
    assert len(verdicts) > 0  # corpus has planted near-dups


def test_state_persists_across_drains(spark, tmp_path):
    """Docs arriving in a later drain are flagged against band claims
    recorded by an earlier drain (checkpoint-carried state)."""
    d = tmp_path / "incr"
    d.mkdir()
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    spark.createDataFrame([(1, base)], DOC_SCHEMA).coalesce(1).write.parquet(
        str(d / "f1.parquet")
    )
    stream = spark.readStream.schema(DOC_SCHEMA).parquet(str(d) + "/*")
    hits_path = str(tmp_path / "hits")
    ckpt = str(tmp_path / "ckpt")
    run_dedup_gate(spark, stream, hits_path, ckpt)
    assert spark.read.schema(
        "band int, band_key string, owner_doc_id bigint, doc_id bigint"
    ).parquet(hits_path).count() == 0

    # second drain: an exact near-dup of doc 1 plus an unrelated doc
    spark.createDataFrame(
        [(2, base), (3, "one two three four five six seven eight nine ten")],
        DOC_SCHEMA,
    ).coalesce(1).write.parquet(str(d / "f2.parquet"))
    stream2 = spark.readStream.schema(DOC_SCHEMA).parquet(str(d) + "/*")
    run_dedup_gate(spark, stream2, hits_path, ckpt)
    verdicts = {
        r["doc_id"]: r["dup_of"]
        for r in duplicate_verdicts(spark.read.parquet(hits_path)).collect()
    }
    assert verdicts == {2: 1}
