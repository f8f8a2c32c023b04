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


def test_payload_matches_n_chars(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    media = attach_binary_payload(docs)
    feats = fake_decode_features(media)
    joined = feats.join(
        docs.selectExpr("doc_id as id", "n_chars"), on="id"
    ).selectExpr("id", "n_bytes", "n_chars")
    # ASCII corpus: byte length == char length
    assert joined.filter("n_bytes <> n_chars").count() == 0
