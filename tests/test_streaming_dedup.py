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


# ---------------------------------------------------------------------------
# Multimodal fingerprint gate
# ---------------------------------------------------------------------------


def _synth_media_rows(spark, sf_dir):
    """The image payloads of dedup_image_phash and the audio payloads
    of dedup_audio_fingerprint, as one mixed-modality item list
    (same ids in both modalities — the kind column must keep them in
    disjoint bucket spaces)."""
    import numpy as np

    from vector_search_go_spark.operators.multimodal import (
        AUDIO_FP_WINDOW,
        AUDIO_FP_WINDOWS,
        DHASH_COLS,
        DHASH_ROWS,
        encode_bmp,
        encode_wav,
    )

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter("length(text) >= 1")
        .select("doc_id", "text")
        .collect()
    )
    img_bytes = DHASH_ROWS * DHASH_COLS * 3
    wav_bytes = AUDIO_FP_WINDOWS * AUDIO_FP_WINDOW
    rows = []
    for r in docs:
        t = r["text"]
        bi = (t * (-(-img_bytes // len(t)))).encode("utf-8")[:img_bytes]
        px = np.frombuffer(bi, np.uint8).reshape(DHASH_ROWS, DHASH_COLS, 3)
        rows.append((r["doc_id"], encode_bmp(px), {"mime": "image/bmp"}))
        bw = (t * (-(-wav_bytes // len(t)))).encode("utf-8")[:wav_bytes]
        samples = ((np.frombuffer(bw, np.uint8).astype(np.int64) - 128) * 256)
        rows.append(
            (r["doc_id"], encode_wav(samples.astype(np.int16), 16_000),
             {"mime": "audio/x-wav"})
        )
    return rows


def test_media_gate_matches_batch_pairs_any_order(spark, tmp_path):
    """The drained gate's pair set is bit-identical to the batch banded
    joins — per modality, with items arriving in DESCENDING id order
    (the member-list state is order-independent, unlike the MinHash
    gate's owner semantics)."""
    from vector_search_go_spark.queries_pipeline import (
        dedup_audio_fingerprint,
        dedup_image_phash,
    )
    from vector_search_go_spark.streaming.dedup import (
        MEDIA_SCHEMA,
        media_pair_verdicts,
        run_media_dedup_gate,
    )

    sf_dir = "/root/testdata/sf0.001"
    rows = sorted(_synth_media_rows(spark, sf_dir), key=lambda r: -r[0])
    d = tmp_path / "media_stream"
    spark.createDataFrame(rows, MEDIA_SCHEMA).coalesce(1).write.parquet(str(d))
    stream = spark.readStream.schema(MEDIA_SCHEMA).parquet(str(d))
    hits_path = str(tmp_path / "hits")
    run_media_dedup_gate(spark, stream, hits_path, str(tmp_path / "ckpt"))
    got = {
        (r["kind"], r["id_a"], r["id_b"]): r["min_hamming"]
        for r in media_pair_verdicts(
            spark.read.parquet(hits_path), min_frames=1
        ).collect()
    }
    want = {
        ("image", r["id_a"], r["id_b"]): r["hamming"]
        for r in dedup_image_phash(spark, sf_dir).collect()
    }
    want.update(
        {
            ("audio", r["id_a"], r["id_b"]): r["hamming"]
            for r in dedup_audio_fingerprint(spark, sf_dir).collect()
        }
    )
    assert got == want
    assert len(got) > 0  # corpus has planted near-dups


def test_media_gate_video_and_replay(spark, tmp_path):
    """Video clips through the gate match video_near_dup_pairs
    (min_frames=2), a replayed file adds no duplicate pairs
    (at-least-once tolerance), and a later drain pairs new arrivals
    against checkpoint-carried state."""
    import numpy as np

    from vector_search_go_spark.operators.multimodal import (
        encode_vbm,
        video_framehash,
        video_near_dup_pairs,
    )
    from vector_search_go_spark.streaming.dedup import (
        MEDIA_SCHEMA,
        media_pair_verdicts,
        run_media_dedup_gate,
    )

    rng = np.random.default_rng(21)

    def frame():
        return rng.integers(0, 256, size=(8, 9, 3)).astype(np.uint8)

    f0, f1, f2, g0, g1, g2 = (frame() for _ in range(6))
    clips = {0: [f0, f1, f2], 1: [f0, f1, g0], 2: [g1, g2, f2]}
    d = tmp_path / "vid"
    d.mkdir()
    rows = [
        (i, encode_vbm(fs), {"mime": "video/x-vbm"}) for i, fs in clips.items()
    ]
    spark.createDataFrame(rows, MEDIA_SCHEMA).coalesce(1).write.parquet(
        str(d / "f1.parquet")
    )
    stream = spark.readStream.schema(MEDIA_SCHEMA).parquet(str(d) + "/*")
    hits_path = str(tmp_path / "hits")
    ckpt = str(tmp_path / "ckpt")
    run_media_dedup_gate(spark, stream, hits_path, ckpt)

    def verdicts():
        return {
            (r["id_a"], r["id_b"]): (r["n_frames_near"], r["min_hamming"])
            for r in media_pair_verdicts(
                spark.read.parquet(hits_path), min_frames=2
            ).collect()
        }

    media_batch = spark.createDataFrame(rows, MEDIA_SCHEMA)
    want = {
        (r["id_a"], r["id_b"]): (r["n_frames_near"], r["min_hamming"])
        for r in video_near_dup_pairs(
            video_framehash(media_batch), tau=6, min_frames=2
        ).collect()
    }
    assert verdicts() == want
    assert (0, 1) in want  # 2 shared frames
    assert (0, 2) not in want  # only 1 shared frame

    # replay the same file: at-least-once delivery must not duplicate
    spark.createDataFrame(rows, MEDIA_SCHEMA).coalesce(1).write.parquet(
        str(d / "f2.parquet")
    )
    stream2 = spark.readStream.schema(MEDIA_SCHEMA).parquet(str(d) + "/*")
    run_media_dedup_gate(spark, stream2, hits_path, ckpt)
    assert verdicts() == want

    # a new exact-dup clip arriving later pairs against carried state
    rows3 = [(9, encode_vbm([f0, f1, f2]), {"mime": "video/x-vbm"})]
    spark.createDataFrame(rows3, MEDIA_SCHEMA).coalesce(1).write.parquet(
        str(d / "f3.parquet")
    )
    stream3 = spark.readStream.schema(MEDIA_SCHEMA).parquet(str(d) + "/*")
    run_media_dedup_gate(spark, stream3, hits_path, ckpt)
    v = verdicts()
    assert v[(0, 9)] == (3, 0) and v[(1, 9)][0] == 2


def test_media_gate_kind_isolation(spark, tmp_path):
    """A flat image (dHash 0) and a flat audio clip (fingerprint 0)
    share every band key value but must NOT pair — modalities live in
    disjoint bucket spaces; two flat images DO pair."""
    import numpy as np

    from vector_search_go_spark.operators.multimodal import (
        encode_bmp,
        encode_wav,
    )
    from vector_search_go_spark.streaming.dedup import (
        MEDIA_SCHEMA,
        media_pair_verdicts,
        run_media_dedup_gate,
    )

    flat_img = np.zeros((8, 9, 3), dtype=np.uint8)
    flat_wav = np.zeros(244, dtype=np.int16)
    rows = [
        (1, encode_bmp(flat_img), {"mime": "image/bmp"}),
        (2, encode_wav(flat_wav), {"mime": "audio/x-wav"}),
        (3, encode_bmp(flat_img), {"mime": "image/bmp"}),
    ]
    d = tmp_path / "mixed"
    spark.createDataFrame(rows, MEDIA_SCHEMA).coalesce(1).write.parquet(str(d))
    stream = spark.readStream.schema(MEDIA_SCHEMA).parquet(str(d))
    hits_path = str(tmp_path / "hits")
    run_media_dedup_gate(spark, stream, hits_path, str(tmp_path / "ckpt"))
    got = {
        (r["kind"], r["id_a"], r["id_b"])
        for r in media_pair_verdicts(spark.read.parquet(hits_path)).collect()
    }
    assert got == {("image", 1, 3)}


def test_media_gate_state_ttl_evicts_idle_buckets(spark, tmp_path):
    """With state_ttl_ms set, a bucket idle past the TTL is evicted at
    the next drain (processing-time timeout), so a later duplicate of
    the forgotten item is NOT flagged against it — the documented
    dedup-horizon trade — while duplicates inside the horizon still
    pair normally."""
    import time as _time

    import numpy as np

    from vector_search_go_spark.operators.multimodal import encode_bmp
    from vector_search_go_spark.streaming.dedup import (
        MEDIA_SCHEMA,
        media_pair_verdicts,
        run_media_dedup_gate,
    )

    rng = np.random.default_rng(33)
    base = rng.integers(0, 256, size=(8, 9, 3)).astype(np.uint8)
    other = rng.integers(0, 256, size=(8, 9, 3)).astype(np.uint8)
    d = tmp_path / "ttl"
    d.mkdir()
    hits_path = str(tmp_path / "hits")
    ckpt = str(tmp_path / "ckpt")
    ttl = 1_500

    def drain(fname, rows):
        spark.createDataFrame(rows, MEDIA_SCHEMA).coalesce(1).write.parquet(
            str(d / fname)
        )
        stream = spark.readStream.schema(MEDIA_SCHEMA).parquet(str(d) + "/*")
        run_media_dedup_gate(
            spark, stream, hits_path, ckpt, state_ttl_ms=ttl
        )

    # drain 1: item 1 claims its buckets
    drain("f1.parquet", [(1, encode_bmp(base), {"mime": "image/bmp"})])
    # idle past the TTL, then drain unrelated data: expired idle
    # buckets get their timeout callback and are removed
    _time.sleep(3)
    drain("f2.parquet", [(8, encode_bmp(other), {"mime": "image/bmp"})])
    # drain 3: two exact dups of item 1 — they pair with each other
    # (same horizon) but NOT with the evicted item 1
    drain(
        "f3.parquet",
        [
            (2, encode_bmp(base), {"mime": "image/bmp"}),
            (4, encode_bmp(base), {"mime": "image/bmp"}),
        ],
    )
    pairs = {
        (r["id_a"], r["id_b"])
        for r in media_pair_verdicts(spark.read.parquet(hits_path)).collect()
    }
    assert pairs == {(2, 4)}


# ---------------------------------------------------------------------------
# Embedding (vector) dedup gate
# ---------------------------------------------------------------------------


def test_embedding_gate_matches_batch_pairs(spark, tmp_path):
    """The drained embedding gate's (pair, exact cosine) set is
    bit-identical to batch dedup_embedding_lsh on the same frozen
    forest, with vectors arriving in DESCENDING id order, and a later
    drain pairs a replayed near-dup against checkpoint-carried
    bucket state."""
    from pyspark.sql import functions as F

    from vector_search_go_spark.config import LshConfig
    from vector_search_go_spark.lsh.index import LshIndex
    from vector_search_go_spark.operators import model_store
    from vector_search_go_spark.queries_lsh import dedup_embedding_lsh
    from vector_search_go_spark.streaming.dedup import (
        VEC_SCHEMA,
        embedding_pair_verdicts,
        run_embedding_dedup_gate,
    )

    sf_dir = "/root/testdata/sf0.001"
    # batch first: trains + persists the forest under the model-store
    # key the gate then loads (identical frozen model on both sides)
    want = {
        (r["id_a"], r["id_b"]): r["cos_dist"]
        for r in dedup_embedding_lsh(spark, sf_dir).collect()
    }
    assert len(want) > 0
    cfg = LshConfig(dims=64, n_trees=32, k_min_vecs=50, seed=23,
                    is_angular=True)
    path = model_store.store_path(
        f"lsh_dedup_index_angular_t{cfg.n_trees}k{cfg.k_min_vecs}s{cfg.seed}",
        sf_dir,
    )
    idx = LshIndex.load(spark, path)

    emb = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select(
            F.col("vec_id").alias("id"),
            F.transform("embedding", lambda x: x.cast("double")).alias("vec"),
        )
        .orderBy(F.desc("id"))
    )
    d = tmp_path / "vec_stream"
    d.mkdir()
    emb.coalesce(1).write.parquet(str(d / "f1.parquet"))
    stream = spark.readStream.schema(VEC_SCHEMA).parquet(str(d) + "/*")
    hits_path = str(tmp_path / "hits")
    ckpt = str(tmp_path / "ckpt")
    run_embedding_dedup_gate(
        spark, stream, idx.forest, cfg.dims, hits_path, ckpt
    )
    got = {
        (r["id_a"], r["id_b"]): r["cos_dist"]
        for r in embedding_pair_verdicts(
            spark.read.parquet(hits_path)
        ).collect()
    }
    assert got == want  # pair set AND exact distances, bit-identical

    # second drain: an exact copy of one paired vector under a new id
    # must pair (dist 0) against state carried through the checkpoint
    some_id = next(iter(want))[0]
    v = emb.filter(F.col("id") == some_id).collect()[0]["vec"]
    new_id = 10_000_000
    spark.createDataFrame([(new_id, v)], VEC_SCHEMA).coalesce(1).write.parquet(
        str(d / "f2.parquet")
    )
    stream2 = spark.readStream.schema(VEC_SCHEMA).parquet(str(d) + "/*")
    run_embedding_dedup_gate(
        spark, stream2, idx.forest, cfg.dims, hits_path, ckpt
    )
    got2 = {
        (r["id_a"], r["id_b"]): r["cos_dist"]
        for r in embedding_pair_verdicts(
            spark.read.parquet(hits_path)
        ).collect()
    }
    assert got2[(some_id, new_id)] == 0.0
    # the original pair set is untouched (replay adds nothing else
    # beyond the new id's own near-dups)
    assert all(got2[k] == v for k, v in got.items())


def test_media_gate_multiprobe_matches_batch(spark, tmp_path):
    """Multiprobe parity (VERDICT r8 item 4): with n_probes the gate's
    drained pair set equals hamming_near_dup_pairs(n_probes=...) — for
    both arrival orders — and without probes neither side reports the
    all-bands-differ pair."""
    from tests.test_multimodal import _pattern_pixels
    from vector_search_go_spark.operators.multimodal import (
        encode_bmp,
        hamming_near_dup_pairs,
        image_dhash,
    )
    from vector_search_go_spark.streaming.dedup import (
        MEDIA_SCHEMA,
        media_pair_verdicts,
        run_media_dedup_gate,
    )

    base = 0x0F0F0F0F0F0F0F % (1 << 60)
    # differs at the MSB of each 15-bit band (bits 14, 29, 44, 59):
    # every band differs -> exact 4x15 banding misses; 1-probe catches
    twin = base ^ (1 << 14) ^ (1 << 29) ^ (1 << 44) ^ (1 << 59)
    rows = [
        (0, encode_bmp(_pattern_pixels(base)), {"mime": "image/bmp"}),
        (1, encode_bmp(_pattern_pixels(twin)), {"mime": "image/bmp"}),
        (2, encode_bmp(_pattern_pixels(base)), {"mime": "image/bmp"}),
    ]
    media_batch = spark.createDataFrame(rows, MEDIA_SCHEMA)

    def batch_pairs(n_probes):
        return {
            (r["id_a"], r["id_b"]): r["hamming"]
            for r in hamming_near_dup_pairs(
                image_dhash(media_batch), tau=6, n_probes=n_probes
            ).collect()
        }

    assert batch_pairs(0) == {(0, 2): 0}
    want = batch_pairs(1)
    assert want == {(0, 2): 0, (0, 1): 4, (1, 2): 4}

    for tag, order in (("fwd", rows), ("rev", rows[::-1])):
        d = tmp_path / f"stream_{tag}"
        spark.createDataFrame(order, MEDIA_SCHEMA).coalesce(1).write.parquet(
            str(d)
        )
        stream = spark.readStream.schema(MEDIA_SCHEMA).parquet(str(d))
        hits_path = str(tmp_path / f"hits_{tag}")
        run_media_dedup_gate(
            spark, stream, hits_path, str(tmp_path / f"ckpt_{tag}"),
            n_probes=1,
        )
        got = {
            (r["id_a"], r["id_b"]): r["min_hamming"]
            for r in media_pair_verdicts(
                spark.read.parquet(hits_path), min_frames=1
            ).collect()
        }
        assert got == want, tag


def test_media_pair_verdicts_per_kind_min_frames(spark):
    """Per-kind min_frames (ADVICE r8): on a mixed log, a dict applies
    video's 2-of-3 batch semantics to video pairs while image pairs
    keep threshold 1; a plain int stays uniform."""
    from vector_search_go_spark.streaming.dedup import media_pair_verdicts

    hits = spark.createDataFrame(
        [
            ("video", 0, 0, 10, 11, 2),   # video pair, 1 near frame only
            ("video", 1, 0, 20, 21, 1),   # video pair, 2 near frames
            ("video", 2, 0, 20, 21, 3),
            ("image", 0, 0, 30, 31, 0),   # image pair, 1 hit
        ],
        "kind string, frame int, band int, id_a long, id_b long, hamming int",
    )

    def verdicts(mf):
        return {
            (r["kind"], r["id_a"], r["id_b"]): r["n_frames_near"]
            for r in media_pair_verdicts(hits, min_frames=mf).collect()
        }

    mixed = verdicts({"video": 2})
    assert mixed == {("video", 20, 21): 2, ("image", 30, 31): 1}
    assert ("video", 10, 11) not in mixed  # single-frame video pair cut
    assert verdicts(1) == {
        ("video", 10, 11): 1,
        ("video", 20, 21): 2,
        ("image", 30, 31): 1,
    }
