"""Multimodal binary-column plumbing (operators.multimodal)."""

from __future__ import annotations

import pytest

from vector_search_go_spark.io import table
from vector_search_go_spark.operators.multimodal import (
    N_HIST_BINS,
    attach_binary_payload,
    decode_media,
    fake_decode_features,
)


def test_decode_media_is_stubbed():
    with pytest.raises(NotImplementedError):
        decode_media(b"\x00\x01", "image/png")


def test_feature_extraction_shapes(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    media = attach_binary_payload(docs)
    feats = fake_decode_features(media).collect()
    n_docs = docs.count()
    assert len(feats) == n_docs
    for r in feats[:20]:
        assert len(r["byte_hist"]) == N_HIST_BINS
        assert sum(r["byte_hist"]) == r["n_bytes"]
        assert r["mime"] == "application/octet-stream"


def test_resize_bounds(spark, sf_dir):
    from vector_search_go_spark.operators.multimodal import fake_resize

    docs = table(spark, sf_dir, "documents")
    out = fake_resize(attach_binary_payload(docs), target_bytes=64).collect()
    assert len(out) == docs.count()
    for r in out[:20]:
        assert 1 <= r["n_bytes_out"] <= 64
        assert len(r["resized"]) == r["n_bytes_out"]


def test_frame_sample_shape(spark, sf_dir):
    from vector_search_go_spark.operators.multimodal import fake_frame_sample

    docs = table(spark, sf_dir, "documents")
    n_docs = docs.count()
    frames = fake_frame_sample(attach_binary_payload(docs), n_frames=4)
    assert frames.count() == 4 * n_docs
    per_doc = frames.groupBy("id").count().collect()
    assert all(r["count"] == 4 for r in per_doc)


def test_payload_matches_n_chars(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    media = attach_binary_payload(docs)
    feats = fake_decode_features(media)
    joined = feats.join(
        docs.selectExpr("doc_id as id", "n_chars"), on="id"
    ).selectExpr("id", "n_bytes", "n_chars")
    # ASCII corpus: byte length == char length
    assert joined.filter("n_bytes <> n_chars").count() == 0
