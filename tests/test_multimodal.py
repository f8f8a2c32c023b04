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


def test_bmp_roundtrip_exact():
    """Stdlib BMP codec: encode -> decode is pixel-exact, including
    non-multiple-of-4 row widths (padding path)."""
    import numpy as np

    from vector_search_go_spark.operators.multimodal import decode_bmp, encode_bmp

    rng = np.random.default_rng(3)
    for h, w in ((2, 2), (3, 5), (7, 1)):  # w=5 -> 15-byte rows, pad 1
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        back = decode_bmp(encode_bmp(px))
        assert back.shape == (h, w, 3)
        assert (back == px).all()


def test_wav_roundtrip_exact():
    import numpy as np

    from vector_search_go_spark.operators.multimodal import decode_wav, encode_wav

    rng = np.random.default_rng(4)
    mono = rng.integers(-32768, 32768, size=200, dtype=np.int16)
    back, rate = decode_wav(encode_wav(mono, 8000))
    assert rate == 8000 and (back[:, 0] == mono).all()
    stereo = rng.integers(-32768, 32768, size=(100, 2), dtype=np.int16)
    back2, rate2 = decode_wav(encode_wav(stereo, 44100))
    assert rate2 == 44100 and (back2 == stereo).all()


def test_decode_media_dispatch_and_stub():
    import numpy as np
    import pytest as _pytest

    from vector_search_go_spark.operators.multimodal import (
        decode_media,
        encode_bmp,
        encode_wav,
    )

    px = np.arange(12, dtype=np.uint8).reshape(2, 2, 3)
    img = decode_media(encode_bmp(px), "image/bmp")
    assert img["kind"] == "image" and img["width"] == 2 and img["height"] == 2
    assert (img["pixels"] == px).all()
    au = decode_media(encode_wav(np.zeros(10, dtype=np.int16)), "audio/x-wav")
    assert au["kind"] == "audio" and au["n_samples"] == 10
    with _pytest.raises(NotImplementedError, match="codec libraries"):
        decode_media(b"\xff\xd8\xff", "image/jpeg")  # compressed: still stubbed


def test_decode_features_real_path(spark, sf_dir):
    """The registered query decodes REAL payloads through mapInPandas:
    features must match a driver-side numpy recomputation from the
    source text bytes."""
    from vector_search_go_spark.queries_pipeline import multimodal_decode_real

    got = {r["id"]: r for r in multimodal_decode_real(spark, sf_dir).collect()}
    assert got, "no documents long enough — fixture drifted"
    src = {
        r["doc_id"]: r["text"]
        for r in table(spark, sf_dir, "documents").filter("length(text) >= 64").collect()
    }
    assert set(got) == set(src)
    import numpy as np

    for did, text in src.items():
        bs = text.encode()
        r = got[did]
        if did % 2 == 0:
            assert (r["kind"], r["width"], r["height"]) == ("image", 4, 4)
            assert r["mean_value"] == np.frombuffer(bs[:48], np.uint8).astype(
                np.float64
            ).mean()
        else:
            assert (r["kind"], r["sample_rate"], r["n_samples"]) == (
                "audio", 16000, 64,
            )
            want = np.abs(
                (np.frombuffer(bs[:64], np.uint8).astype(np.int64) - 128) * 256
            ).mean()
            assert r["mean_value"] == want
