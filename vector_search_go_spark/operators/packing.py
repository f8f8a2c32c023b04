"""Sequence packing: assign documents to fixed-token-budget packs.

LLM training consumes fixed-length context windows; feeding one short
document per window wastes most of it, so pipelines PACK documents
back-to-back and cut windows from the packed stream. The operator
below computes, for every document, which pack it starts in and at
what offset — the offline index a pack-and-shard writer needs.

Semantics (offset packing): within a (split, shard) stream ordered by
doc_id, a document whose preceding token count is `off` lands in pack
`off div budget` at offset `off mod budget`. Documents are never
reordered or split across shards; a pack may run over budget by at
most one document's tokens (the standard boundary-respecting
relaxation — exact next-fit needs a sequential scan and buys back
only the overflow slack).

Scale shape: the only ordered state is a running sum WITHIN a (split,
shard) window partition. Sharding by content hash bounds each
partition to corpus_size / n_shards regardless of total scale, so the
sort never becomes a single-partition bottleneck; raise n_shards with
the corpus. One shuffle (the window partitioning), integer arithmetic
only — exact and portable to the SQL oracle as a window function.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from vector_search_go_spark.operators.split import sql_hex8_to_long


def sql_shard_expr(content_expr: str, n_shards: int) -> str:
    """SQL (valid in both Spark and DuckDB) assigning a stable shard id
    in [0, n_shards) from the row's content hash."""
    hx = f"substr(md5({content_expr}), 9, 8)"  # chars 9-16: independent
    # of the split wheel, which reads chars 1-8 of the same digest
    return f"(({sql_hex8_to_long(hx)}) % {n_shards})"


def pack_sequences(
    df: DataFrame,
    token_col: str,
    budget: int,
    partition_cols: list[str],
    order_col: str = "doc_id",
) -> DataFrame:
    """Append `begin_offset` (tokens before this doc in its stream),
    `pack_id`, and `offset_in_pack` columns. `partition_cols` must
    bound the per-partition row count (e.g. [split, shard])."""
    w = (
        Window.partitionBy(*partition_cols)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    off = F.coalesce(F.sum(token_col).over(w), F.lit(0)).cast("bigint")
    return (
        df.withColumn("begin_offset", off)
        # integer div, not FP /: offsets can pass 2^53 tokens at scale
        .withColumn("pack_id", F.expr(f"begin_offset div {budget}"))
        .withColumn("offset_in_pack", F.col("begin_offset") % budget)
    )
