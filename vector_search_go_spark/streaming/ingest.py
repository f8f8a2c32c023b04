"""Streaming LSH index ingest: incremental bucket maintenance.

The reference clears the whole store and rebuilds on every Train
(lsh/lsh.go:107-110) — there is no incremental path. Here the trained
forest is a frozen broadcast model, so new vectors are a pure
projection: stream (id, vec) -> hash UDF -> posexplode -> append
(tree, hash, id) rows to the bucket store. Exactly the batch
``LshIndex._bucketize`` plan lifted onto a streaming source; the sink is
an append-mode parquet write partitioned by tree (idempotent via
checkpoint), after which searches see old + new vectors in one bucket
DataFrame.

Model drift note (documented semantics): planes are data-dependent
(hasher.go:100-134), so a distribution shift degrades bucket balance
over time — the answer is a periodic batch re-Train, not per-record
model updates; recall on appended data is monitored with the standard
epsilon-recall harness.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_search_go_spark.lsh.hasher import Forest
from vector_search_go_spark.lsh.index import _hash_probe_udf


def stream_bucketize(
    spark: SparkSession, vec_stream: DataFrame, forest: Forest
) -> DataFrame:
    """vec_stream(id, vec) -> streaming (tree, hash, id) bucket rows."""
    hash_vec = _hash_probe_udf(spark, forest, with_probes=False)
    return (
        vec_stream.select("id", F.posexplode(hash_vec("vec")).alias("tree", "hash"))
        .select(F.col("tree").cast("int"), "hash", "id")
    )


def ingest_to_bucket_store(
    spark: SparkSession,
    vec_stream: DataFrame,
    forest: Forest,
    bucket_path: str,
    checkpoint_path: str,
    timeout: int = 120,
) -> None:
    """Drain the stream (availableNow) into the parquet bucket store."""
    buckets = stream_bucketize(spark, vec_stream, forest)
    q = (
        buckets.writeStream.format("parquet")
        .option("path", bucket_path)
        .option("checkpointLocation", checkpoint_path)
        .partitionBy("tree")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout)
