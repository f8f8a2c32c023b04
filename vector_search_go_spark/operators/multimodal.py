"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Pattern for image/audio/video at 100 TB: media rides as a BINARY column
(or a pointer column to object storage) next to typed metadata; decode /
feature-extraction runs as Arrow-batched ``mapInPandas`` so each task
processes a bounded batch of blobs without ever materializing them on
the driver.

The actual codecs (PIL/ffmpeg/...) are NOT in this environment, so
``decode_media`` is a clearly-marked stub; ``fake_decode_features`` is a
deterministic stand-in (byte histogram) that keeps the Spark-side
plumbing — schema, batch shape, partitioning — real and tested
(builder's brief: stub the decode, make the plumbing real).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

N_HIST_BINS = 16

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("byte_hist", T.ArrayType(T.LongType())),
        T.StructField("mime", T.StringType()),
    ]
)


def attach_binary_payload(docs: DataFrame) -> DataFrame:
    """Simulate a media table from documents: payload = UTF-8 bytes of
    the text, plus typed metadata. Real pipelines read the payload from
    parquet BINARY columns or object-store pointers; the schema shape is
    identical."""
    return docs.select(
        F.col("doc_id").alias("id"),
        F.encode("text", "UTF-8").alias("media"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.col("n_chars").cast("int").alias("n_chars"),
            F.col("source").alias("source"),
        ).alias("meta"),
    )


def decode_media(payload: bytes, mime: str):
    """Real codec entry point — intentionally unimplemented here.

    In production this dispatches on mime to PIL / torchaudio / ffmpeg
    inside the executor process. This container has no media libraries,
    so calling it raises (builder's brief: stub behind a clear error).
    """
    raise NotImplementedError(
        f"media decoding for {mime!r} requires codec libraries not present "
        "in this environment; use fake_decode_features for plumbing tests"
    )


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("resized", T.BinaryType()),
        T.StructField("n_bytes_out", T.IntegerType()),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def fake_resize(media_df: DataFrame, target_bytes: int = 64) -> DataFrame:
    """Deterministic 'resize' stand-in: stride-subsample the payload to
    ~target_bytes (a real image resize is the same mapInPandas shape
    with PIL inside — decode_media raises until codecs exist)."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                buf = np.frombuffer(row["media"], dtype=np.uint8)
                stride = max(1, len(buf) // target_bytes)
                out = bytes(buf[::stride][:target_bytes])
                rows.append({"id": row["id"], "resized": out, "n_bytes_out": len(out)})
            yield pd.DataFrame(rows, columns=[f.name for f in RESIZE_SCHEMA.fields])

    return media_df.mapInPandas(resize, schema=RESIZE_SCHEMA)


def fake_frame_sample(media_df: DataFrame, n_frames: int = 4) -> DataFrame:
    """Deterministic 'video frame sampling' stand-in: split the payload
    into n_frames equal chunks, one output row per frame — the UDTF-like
    1->N row shape real frame extraction uses."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                buf = row["media"]
                step = max(1, len(buf) // n_frames)
                for i in range(n_frames):
                    rows.append(
                        {
                            "id": row["id"],
                            "frame_idx": i,
                            "frame": bytes(buf[i * step : (i + 1) * step]),
                        }
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in FRAME_SCHEMA.fields])

    return media_df.mapInPandas(sample, schema=FRAME_SCHEMA)


def fake_decode_features(media_df: DataFrame) -> DataFrame:
    """Deterministic stand-in feature extractor: 16-bin byte histogram
    per payload via Arrow-batched mapInPandas (the exact execution shape
    a real decoder would use)."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                buf = np.frombuffer(row["media"], dtype=np.uint8)
                hist = np.bincount(buf >> 4, minlength=N_HIST_BINS)[:N_HIST_BINS]
                rows.append(
                    {
                        "id": row["id"],
                        "n_bytes": len(buf),
                        "byte_hist": hist.astype("int64").tolist(),
                        "mime": row["meta"]["mime"],
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in FEATURE_SCHEMA.fields])

    return media_df.mapInPandas(extract, schema=FEATURE_SCHEMA)
