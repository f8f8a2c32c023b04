"""Tombstone deletes for persisted stores (VERDICT r7 missing item 2).

A takedown / right-to-erasure pass is routine in training-data
pipelines, and until r8 the stores could only append, compact, and
rebuild — removing a row meant a full re-save. The design here is the
standard lakehouse one (Iceberg/Delta delete files, applied as an
anti-join at read time, removed physically at the next rewrite):

  {path}/tombstones/*.parquet     (id bigint) — ids masked from every
                                  read path until purged
  {path}/shard=K/tombstones       sharded layouts route each id to its
                                  owning shard (serve.sharded.shard_expr
                                  re-derives the owner from the id)

Read-side contract: every search tier anti-joins/masks the tombstones —
the Spark point paths (lsh/ivf/ivfpq point_search + batch twins), the
batch engine (LshIndex.load, engine.load, union_shard_component), and
the local/sharded serving readers (loaded once at reader init). LSH
hot-bucket thinning keys on LIVE bucket sizes everywhere sizes are
observed (the point paths' count window and the local reader's
per-bucket counts both run AFTER the mask; sharded layouts re-pin
``hot_buckets`` from the masked union on delete), so serving over a
tombstoned store is bit-identical to serving over the store re-saved
without those ids — the parity tests/test_tombstones.py pins.

Write-side contract: ``delete_ids`` only APPENDS a tombstone component
(cheap, no store rewrite); ``purge_tombstones`` physically drops the
rows through the family's compactors and clears the component. A
tombstone outlives re-insertion: an id streamed back in after a delete
stays masked until the tombstones are purged — the conservative
takedown semantics (resurrecting deleted data silently would be the
worse failure).

Reference anchor: ``store.Clear`` (store/store.go:17) is the only
deletion the reference has — whole-store; this is the row-level
operation its pipeline framing demands.

Scale shape: tombstone sets are takedown-sized (thousands-millions of
ids, KBs-MBs) next to the store — they broadcast; the masks are
broadcast anti-joins on the already-pruned scans (never a shuffle of
the store), and numpy ``isin`` over candidate arrays in the readers.
"""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TOMBSTONES = "tombstones"


def tombstones_df(spark: SparkSession, path: str) -> DataFrame | None:
    """Distinct tombstoned ids of ONE store layout (unsharded), or None
    when the store has none. Absence is normal; a present-but-unreadable
    component raises (absence != unreadable — the store_meta contract).
    """
    root = os.path.join(path, TOMBSTONES)
    if "://" not in path and not os.path.exists(root):
        return None
    return spark.read.parquet(root).select("id").distinct()


def mask_tombstones(
    spark: SparkSession, path: str, df: DataFrame, id_col: str = "id"
) -> DataFrame:
    """Anti-join ``df`` against ``{path}/tombstones`` when present —
    the ONE Spark-side masking helper every read path calls. Broadcast:
    the tombstone set is takedown-sized, never store-sized."""
    tomb = tombstones_df(spark, path)
    if tomb is None:
        return df
    if id_col != "id":
        tomb = tomb.select(F.col("id").alias(id_col))
    return df.join(F.broadcast(tomb), on=id_col, how="left_anti")


def load_tombstone_array(path: str):
    """Tombstoned ids as a sorted int64 numpy array for the local
    readers (None when the store has none) — loaded once at reader
    init, applied as ``~np.isin`` over candidate arrays."""
    import numpy as np
    import pyarrow.parquet as pq

    files = glob.glob(os.path.join(path, TOMBSTONES, "*.parquet"))
    if not files:
        return None
    tbl = pq.read_table(files, columns=["id"])
    return np.unique(tbl.column("id").to_numpy(zero_copy_only=False))


def drop_tombstoned(tomb, ids, *arrs):
    """(ids, *arrs) with tombstoned rows removed — the numpy twin of
    mask_tombstones for reader candidate arrays. No-op (same objects)
    when there is nothing to drop."""
    import numpy as np

    if tomb is None or len(ids) == 0:
        return (ids, *arrs)
    m = ~np.isin(ids, tomb)
    if m.all():
        return (ids, *arrs)
    return (ids[m], *(a[m] for a in arrs))


def delete_ids(spark: SparkSession, path: str, ids) -> dict:
    """Tombstone ``ids`` (iterable of int, or a 1-column DataFrame) in
    the store at ``path`` — append-only, O(ids), no store rewrite.

    Sharded layouts route each id to its owning shard's tombstones
    (pmod(xxhash64(id), n_shards) — the saver's shard_expr), and a
    sharded LSH layout with a bucket cap re-pins ``{path}/hot_buckets``
    from the masked union afterwards: deleting members of a hot bucket
    moves its LIVE size, and survivor-rule parity with a re-saved store
    requires keep_mods derived from live masses (the same reason
    refresh_hot_buckets runs after dedup compactions)."""
    from vector_search_go_spark.serve.sharded import (
        read_shards_meta,
        shard_expr,
    )

    if isinstance(ids, DataFrame):
        ids_df = ids.select(F.col(ids.columns[0]).cast("long").alias("id"))
    else:
        ids_df = spark.createDataFrame(
            [(int(i),) for i in ids], "id bigint"
        )
    ids_df = ids_df.distinct()
    n = ids_df.count()
    smeta = read_shards_meta(path) if "://" not in path else None
    if smeta is None:
        ids_df.coalesce(1).write.mode("append").parquet(
            os.path.join(path, TOMBSTONES)
        )
        spark.catalog.refreshByPath(os.path.join(path, TOMBSTONES))
        return {"tombstoned": n, "shards": None}
    n_shards = int(smeta["n_shards"])
    routed = ids_df.withColumn("s", shard_expr(n_shards))
    per_shard = {
        int(r["s"]): int(r["cnt"])
        for r in routed.groupBy("s").agg(F.count("*").alias("cnt")).collect()
    }
    for k in sorted(per_shard):
        routed.filter(F.col("s") == k).select("id").coalesce(1).write.mode(
            "append"
        ).parquet(os.path.join(path, f"shard={k}", TOMBSTONES))
        spark.catalog.refreshByPath(os.path.join(path, f"shard={k}", TOMBSTONES))
    out = {"tombstoned": n, "shards": per_shard}
    if smeta.get("family") == "lsh":
        from vector_search_go_spark.serve.sharded import refresh_hot_buckets

        out["hot_buckets"] = refresh_hot_buckets(spark, path)
    return out


def clear_tombstones(path: str) -> None:
    shutil.rmtree(os.path.join(path, TOMBSTONES), ignore_errors=True)


def purge_tombstones(
    spark: SparkSession, path: str, keep_backup: bool = False
) -> dict:
    """Physically drop tombstoned rows from every id-carrying component
    and clear the tombstone table — the rewrite ``delete_ids`` defers.
    Routes by family (the engine.maintain discriminators); sharded
    layouts purge each shard in turn (per-shard two-rename swaps, so a
    concurrently-serving ShardedReader's @_swap_retry absorbs the
    races exactly as it does for compaction). After the purge the store
    is byte-equivalent in CONTENT to one saved without the ids —
    searches return identical rows before and after (the masks were
    already hiding them); only the physical rows and file counts move.
    A sharded LSH layout re-pins hot_buckets afterwards (masses moved
    physically now)."""
    from vector_search_go_spark.serve.sharded import read_shards_meta
    from vector_search_go_spark.streaming.ingest import (
        compact_bucket_store,
        compact_cells_store,
        compact_codes_store,
        compact_vectors_store,
    )

    smeta = read_shards_meta(path) if "://" not in path else None
    if smeta is not None:
        stats = {
            k: purge_tombstones(
                spark, os.path.join(path, f"shard={k}"), keep_backup
            )
            for k in range(int(smeta["n_shards"]))
        }
        out = {"shards": stats}
        if smeta.get("family") == "lsh":
            from vector_search_go_spark.serve.sharded import (
                refresh_hot_buckets,
            )

            out["hot_buckets"] = refresh_hot_buckets(spark, path)
        return out

    tomb = tombstones_df(spark, path)
    if tomb is None:
        return {"purged": 0}
    tomb = spark.createDataFrame(tomb.collect(), tomb.schema)  # pin: the
    # component swaps below must not re-read a table this purge deletes
    stats: dict = {}
    has = lambda sub: os.path.exists(os.path.join(path, sub))  # noqa: E731
    if has("buckets"):
        stats["buckets"] = compact_bucket_store(
            spark, f"{path}/buckets", keep_backup=keep_backup, drop_ids=tomb
        )
    if has("cells"):
        compactor = (
            compact_codes_store if has("codebook") else compact_cells_store
        )
        stats["cells"] = compactor(
            spark, f"{path}/cells", keep_backup=keep_backup, drop_ids=tomb
        )
    if has("vectors"):
        block = 64 << 10 if has("codebook") else 512 << 10
        stats["vectors"] = compact_vectors_store(
            spark, f"{path}/vectors", keep_backup=keep_backup,
            drop_ids=tomb, block_size=block,
        )
    clear_tombstones(path)
    for sub in ("buckets", "cells", "vectors"):
        if sub in stats:
            spark.catalog.refreshByPath(os.path.join(path, sub))
    stats["purged"] = tomb.count()
    return stats
