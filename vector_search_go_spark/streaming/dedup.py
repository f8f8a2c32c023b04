"""Streaming MinHash near-dup detection: an ingestion-time dedup gate.

Net-new surface (the reference has no streaming). The batch MinHash
query (queries_text.dedup_minhash_lsh) answers "which pairs in the
corpus are near-dups"; an ingestion pipeline needs the online version:
"is THIS arriving document a near-dup of anything already accepted".

Shape: stream (doc_id, text) -> the SAME deterministic shingle +
minhash + band projection as batch (shared minhash_band_keys, so band
keys are byte-identical) -> stateful band-claim keyed by (band,
band_key) via applyInPandasWithState. The first document to present a
band key claims it (state = owner doc id, a few bytes per key); every
later document hitting a claimed key emits a (owner, doc) duplicate
hit. State is O(distinct band keys), not O(documents x bands), and the
per-key group never materializes the corpus — the scale ceiling is the
state store, the same ceiling Structured Streaming dropDuplicates has.

Equivalence to batch (asserted in tests/test_streaming_dedup.py): with
documents arriving in doc_id order, the flagged set is exactly
{doc_b | some batch pair (doc_a < doc_b)} and each flagged doc's
earliest owner equals the batch min doc_a — because a band's first
presenter IS its min-id member.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from vector_search_go_spark.queries_text import _shingles_col, minhash_band_keys

DOC_SCHEMA = "doc_id bigint, text string"

_HIT_SCHEMA = T.StructType(
    [
        T.StructField("band", T.IntegerType()),
        T.StructField("band_key", T.StringType()),
        T.StructField("owner_doc_id", T.LongType()),
        T.StructField("doc_id", T.LongType()),
    ]
)


def stream_band_keys(doc_stream: DataFrame) -> DataFrame:
    """(doc_id, text) stream -> (doc_id, band, band_key) stream, the
    batch signature projection lifted onto the stream (pure narrow
    ops — no state, no shuffle until the band-claim groupBy)."""
    w = F.split(F.col("text"), " ")
    shingled = (
        doc_stream.withColumn("w", w)
        .filter(F.size("w") >= 3)
        .select("doc_id", _shingles_col(F.col("w")).alias("shingles"))
    )
    return minhash_band_keys(shingled)


def _claim_band(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """State per (band, band_key): the owning doc id. Within a
    micro-batch the min doc_id wins (chunks are gathered before
    sorting — Arrow chunk order is not guaranteed); across batches the
    recorded owner persists, which is arrival-order semantics."""
    band, band_key = key
    doc_ids: list[int] = []
    for pdf in pdfs:
        doc_ids.extend(int(d) for d in pdf["doc_id"])
    doc_ids.sort()
    if state.exists:
        (owner,) = state.get
    else:
        owner = doc_ids[0]
        state.update((owner,))
    hits = [(band, band_key, owner, d) for d in doc_ids if d != owner]
    yield pd.DataFrame(hits, columns=["band", "band_key", "owner_doc_id", "doc_id"])


def stream_duplicate_hits(doc_stream: DataFrame) -> DataFrame:
    """Streaming (band, band_key, owner_doc_id, doc_id) duplicate hits:
    one row per (claimed band x later doc)."""
    return (
        stream_band_keys(doc_stream)
        .groupBy("band", "band_key")
        .applyInPandasWithState(
            _claim_band,
            outputStructType=_HIT_SCHEMA,
            stateStructType="owner long",
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def run_dedup_gate(
    spark: SparkSession,
    doc_stream: DataFrame,
    hits_path: str,
    checkpoint_path: str,
    timeout: int = 120,
) -> None:
    """Drain the stream (availableNow) appending duplicate hits to
    parquet; the checkpoint carries the band-claim state so successive
    drains keep deduplicating against everything already seen."""
    q = (
        stream_duplicate_hits(doc_stream)
        .writeStream.format("parquet")
        .option("path", hits_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout)


def duplicate_verdicts(hits: DataFrame) -> DataFrame:
    """Batch rollup of the hit log: per flagged doc, the earliest owner
    it collided with — 'doc_id is a near-dup of dup_of'."""
    return hits.groupBy("doc_id").agg(F.min("owner_doc_id").alias("dup_of"))
