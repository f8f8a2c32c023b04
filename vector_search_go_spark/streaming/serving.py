"""Streaming ANN serving: a continuous query stream against the static
LSH index.

The reference's Search is one-query-at-a-time over an in-memory store
(lsh/lsh.go:137-197); the streaming twin here serves an unbounded query
stream with the SAME batch search pipeline via foreachBatch — each
micro-batch of queries runs the broadcast-hash bucket join against the
(static, optionally streamed-in) bucket store. Stream-static joins keep
the corpus un-shuffled; state is bounded (no watermark needed — every
micro-batch is independent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from vector_search_go_spark.lsh.index import LshIndex
from vector_search_go_spark.lsh.search import lsh_search


def serve_query_stream(
    query_stream: DataFrame,
    index: LshIndex,
    metric: str,
    k: int = 10,
    threshold: float | None = None,
    sink_table: str = "ann_results",
    checkpoint_path: str | None = None,
    timeout: int = 120,
) -> None:
    """Drain query_stream(query_id, qvec) through the LSH search
    pipeline into an in-memory results table (swap the writer for a
    Kafka/Delta sink in production; the foreachBatch body is unchanged).

    checkpoint_path: pass a durable location to resume a long-lived
    stream across restarts; the default is a FRESH temp dir so repeated
    ad-hoc runs reprocess the source instead of silently draining
    nothing against a stale checkpoint."""
    import tempfile

    spark = query_stream.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {sink_table}")
    if checkpoint_path is None:
        checkpoint_path = tempfile.mkdtemp(prefix=f"ann_serving_ckpt_{sink_table}_")

    def handle_batch(batch_df: DataFrame, batch_id: int) -> None:
        results = lsh_search(index, batch_df, metric=metric, k=k, threshold=threshold)
        results.write.mode("append").saveAsTable(sink_table)

    q = (
        query_stream.writeStream.foreachBatch(handle_batch)
        .trigger(availableNow=True)
        .option("checkpointLocation", checkpoint_path)
        .start()
    )
    q.awaitTermination(timeout)
