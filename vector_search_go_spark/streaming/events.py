"""Structured Streaming ingest of the events table.

Net-new surface (the reference has no streaming — SURVEY.md section 2:
index is batch-rebuilt on every Train). Patterns covered:

  - file-source readStream over the events parquet (schema pinned; the
    nanosecond ts is read as long and truncated to micros, matching the
    batch path in io.py);
  - tumbling event-time windows with a watermark for late data;
  - arbitrary stateful sessionization via applyInPandasWithState
    (gap-based sessions, the custom-stateful-operator slot);
  - a watermarked stream-stream range self-join (click before purchase
    within a gap) — the streaming twin of the batch
    range_join_click_purchase query, with state bounded by the
    time-range condition + watermarks on both sides.

Tests drive these with Trigger.availableNow into a memory sink and
assert equality with the batch equivalents (time_bucket_events /
sessionize_events query entries).
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RAW_SCHEMA = (
    "event_id bigint, ts bigint, user_id bigint, event_type string, "
    "value double, props string"
)

SESSION_GAP_US = 30 * 60 * 1_000_000


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over events parquet. Handles both physical ts
    layouts the driver has shipped (TIMESTAMP(NANOS) needing
    nanosAsLong+truncation, and micro TIMESTAMP_NTZ), normalizing to a
    session-tz timestamp exactly like the batch loader in io.py."""
    import pyarrow.parquet as pq

    arrow_ts = str(
        pq.ParquetFile(f"{sf_dir}/events.parquet").schema_arrow.field("ts").type
    )
    # must be the micro layout specifically: pyarrow reports the NANOS
    # layout as "timestamp[ns]", which Spark's timestamp_ntz reader
    # rejects (PARQUET_COLUMN_DATA_TYPE_MISMATCH) — NANOS must fall
    # through to the nanosAsLong+truncate branch below
    if arrow_ts.startswith("timestamp[us"):
        schema = RAW_SCHEMA.replace("ts bigint", "ts timestamp_ntz")
        raw = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{sf_dir}")
        )
        return raw.withColumn("ts", F.col("ts").cast("timestamp"))
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = (
        spark.readStream.schema(RAW_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{sf_dir}")
    )
    return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def windowed_counts(events: DataFrame, window: str = "1 hour", watermark: str = "2 hours") -> DataFrame:
    """Tumbling event-time window counts + value sum with a watermark —
    late rows beyond the watermark are dropped, state is bounded."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


_SESSION_STATE_SCHEMA = "last_ts long, session_seq int, n_events int"
_SESSION_OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_seq", T.IntegerType()),
        T.StructField("n_events", T.IntegerType()),
    ]
)


def _sessionize_group(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Gap-based sessionization (applyInPandasWithState): a new session
    starts when the microsecond gap to the previous event exceeds
    SESSION_GAP_US (identical comparison to the batch twin in
    queries_pipeline.sessionize_events)."""
    (user_id,) = key
    last_ts, session_seq, n_events = (
        state.get if state.exists else (None, 0, 0)
    )
    # A group arrives as an iterator of Arrow chunks with no cross-chunk
    # ordering guarantee: gather every timestamp in the micro-batch
    # before sorting, or later chunks with earlier events would merge
    # sessions that the batch twin keeps separate.
    all_ts: list[int] = []
    for pdf in pdfs:
        all_ts.extend(int(t.value) // 1_000 for t in pd.to_datetime(pdf["ts"]))
    rows = []
    for ts in sorted(all_ts):
        if last_ts is None or ts - last_ts > SESSION_GAP_US:
            if session_seq > 0:
                rows.append((user_id, session_seq, n_events))
            session_seq += 1
            n_events = 0
        n_events += 1
        last_ts = ts
    state.update((last_ts, session_seq, n_events))
    # Emit closed sessions; the open session stays in state.
    yield pd.DataFrame(rows, columns=["user_id", "session_seq", "n_events"])


def sessionize_stream(events: DataFrame) -> DataFrame:
    return events.groupBy("user_id").applyInPandasWithState(
        _sessionize_group,
        outputStructType=_SESSION_OUT_SCHEMA,
        stateStructType=_SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def range_join_stream(
    events: DataFrame,
    max_gap_us: int = 300_000_000,
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream range join: click-purchase pairs within
    ``max_gap_us`` per user — the streaming twin of the batch
    ``range_join_click_purchase`` query (identical output schema and
    rows; pinned in tests/test_streaming.py).

    Both sides carry a watermark and the join condition bounds
    click_ts to [purchase_ts - gap, purchase_ts], so Spark can expire
    buffered state: a click older than (watermark + gap) can never join
    a future purchase and is dropped. Without the time-range condition
    the state store would grow without bound — this is the canonical
    bounded-state stream-stream join shape."""
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", watermark)
    )
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", watermark)
    )
    joined = purchases.join(
        clicks,
        F.expr(
            "p_user = c_user AND c_ts <= p_ts "
            f"AND c_ts >= p_ts - INTERVAL {max_gap_us} MICROSECOND"
        ),
    )
    return joined.select(
        F.col("p_user").alias("user_id"),
        "click_id",
        "purchase_id",
        (F.unix_micros("p_ts") - F.unix_micros("c_ts")).alias("gap_us"),
    )


def run_to_memory(df: DataFrame, name: str, timeout: int = 120) -> None:
    """Drive a streaming DF to completion with availableNow into an
    in-memory table (test/bench helper)."""
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append" if df.isStreaming else "complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout)
