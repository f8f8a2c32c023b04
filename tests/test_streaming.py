"""Structured Streaming over events: windowed counts + stateful
sessionization, checked against their batch twins."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from vector_search_go_spark.io import table
from vector_search_go_spark.queries_pipeline import sessionize_events
from vector_search_go_spark.streaming.events import (
    read_events_stream,
    run_to_memory,
    sessionize_stream,
    windowed_counts,
)


@pytest.fixture(scope="module")
def events_dir(sf_dir, tmp_path_factory):
    # file-stream sources require a directory of files
    d = tmp_path_factory.mktemp("events_stream")
    shutil.copy(f"{sf_dir}/events.parquet", d / "events.parquet")
    return str(d)


@pytest.fixture(scope="module")
def events_nanos_dir(sf_dir, tmp_path_factory, spark):
    """events.parquet rewritten with a TIMESTAMP(NANOS) ts column — the
    other physical layout the driver has shipped. pyarrow reports it as
    timestamp[ns], which must route to the nanosAsLong branch of
    read_events_stream, NOT the timestamp_ntz one (ADVICE r2)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("events_stream_nanos")
    t = pq.read_table(f"{sf_dir}/events.parquet")
    ts_idx = t.schema.get_field_index("ts")
    ts = t.column("ts").cast(pa.timestamp("ns"))
    t = t.set_column(ts_idx, pa.field("ts", pa.timestamp("ns")), ts)
    pq.write_table(t, str(d / "events.parquet"), store_schema=False)
    assert str(
        pq.ParquetFile(str(d / "events.parquet")).schema_arrow.field("ts").type
    ) == "timestamp[ns]"
    return str(d)


def test_nanos_layout_routes_to_long_branch(spark, events_nanos_dir):
    """A TIMESTAMP(NANOS) file must stream through the nanosAsLong +
    truncate path and produce micro-precision session timestamps."""
    stream = read_events_stream(spark, events_nanos_dir)
    assert stream.schema["ts"].dataType.typeName() == "timestamp"
    run_to_memory(windowed_counts(stream), "win_counts_nanos")
    got = spark.table("win_counts_nanos")
    assert got.count() > 0


def test_windowed_counts_match_batch(spark, sf_dir, events_dir):
    stream = read_events_stream(spark, events_dir)
    run_to_memory(windowed_counts(stream), "win_counts")
    got = {
        (r["window_start"], r["event_type"]): (r["n"], round(r["total_value"], 6))
        for r in spark.table("win_counts").collect()
    }
    batch = (
        table(spark, sf_dir, "events")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "total_value")
    )
    want = {
        (r["window_start"], r["event_type"]): (r["n"], round(r["total_value"], 6))
        for r in batch.collect()
    }
    # Append mode only emits windows finalized by the watermark: the
    # last <watermark delay> of event time stays open at end-of-stream.
    max_ts = table(spark, sf_dir, "events").agg(F.max("ts")).collect()[0][0]
    finalized = {
        k: v
        for k, v in want.items()
        if (max_ts - k[0]).total_seconds() > 3 * 3600
    }
    assert got.items() >= finalized.items()
    assert set(got) <= set(want)
    for k in got:
        assert got[k] == want[k]


def test_stream_range_join_matches_batch(spark, sf_dir, events_dir):
    """Inner stream-stream joins emit every match regardless of
    watermark finalization, so the availableNow run must equal the
    batch range_join_click_purchase result exactly."""
    from vector_search_go_spark.queries_pipeline import range_join_click_purchase
    from vector_search_go_spark.streaming.events import range_join_stream

    stream = read_events_stream(spark, events_dir)
    run_to_memory(range_join_stream(stream), "range_join")
    got = {
        (r["user_id"], r["click_id"], r["purchase_id"], r["gap_us"])
        for r in spark.table("range_join").collect()
    }
    want = {
        (r["user_id"], r["click_id"], r["purchase_id"], r["gap_us"])
        for r in range_join_click_purchase(spark, sf_dir).collect()
    }
    assert got == want
    assert len(got) > 0


def test_sessionize_stream_matches_batch_closed_sessions(spark, sf_dir, events_dir):
    stream = read_events_stream(spark, events_dir)
    run_to_memory(sessionize_stream(stream), "sessions")
    got = {
        (r["user_id"], r["session_seq"]): r["n_events"]
        for r in spark.table("sessions").collect()
    }
    batch = sessionize_events(spark, sf_dir)
    last = batch.groupBy("user_id").agg(F.max("session_seq").alias("last_seq"))
    closed = batch.join(last, "user_id").filter(
        F.col("session_seq") < F.col("last_seq")
    )
    want = {
        (r["user_id"], r["session_seq"]): r["n_events"] for r in closed.collect()
    }
    assert got == want
