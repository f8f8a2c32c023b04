"""Shuffle-free nearest-centroid assignment (broadcast-array argmin).

The naive Spark shape for "assign every corpus vector to its nearest
centroid" is ``corpus.crossJoin(broadcast(centroids))`` followed by
``groupBy(id).agg(min(struct(dist, cid)))`` — but that groupBy
re-shuffles the WHOLE corpus (id + vec) on every call, and k-means runs
it ``iters+1`` times. At 100 TB that is the dominant cost of the whole
quantizer stack (VERDICT r2 finding #3).

The fix exploits that centroid sets are tiny (k x dim doubles, KBs):
collapse them to ONE row holding ``array<struct<cid, cvec>>``, broadcast
that row, and compute the argmin inside a single projection:

    array_min(transform(cents, c -> struct(dist(vec, c.cvec), c.cid)))

``array_min`` over structs uses lexicographic struct ordering, so this
is exactly the previous ``min(struct(d, cid))`` — same value, same
(d, cid) tie-break, bit-identical distances (same per-pair fold) — with
ZERO joins-with-shuffle and ZERO aggregations over the corpus. The only
exchange left in an assignment plan is the KB-sized centroid collect.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def pack_centroids(
    cents: DataFrame,
    id_col: str = "cid",
    vec_col: str = "cvec",
    group: list[str] | None = None,
    out_col: str = "_cents",
) -> DataFrame:
    """(group..., cid, cvec) -> one row per group value (or one row
    total) with ``out_col`` = array<struct<cid, cvec>>. The array is the
    broadcastable form every argmin below consumes."""
    packed = F.collect_list(F.struct(F.col(id_col), F.col(vec_col))).alias(out_col)
    if group:
        return cents.groupBy(*group).agg(packed)
    return cents.agg(packed)


def argmin_id(
    cent_arr: Column,
    dist_fn: Callable[[Column], Column],
    id_field: str = "cid",
    vec_field: str = "cvec",
) -> Column:
    """Nearest-centroid id over a packed centroid array.

    ``dist_fn(cvec)`` must yield the distance from the current row's
    vector to one centroid; ties break toward the smallest id, exactly
    like ``min(struct(d, id))``. One distance evaluation per centroid,
    all inside whole-stage codegen."""
    scored = F.transform(
        cent_arr,
        lambda c: F.struct(dist_fn(c[vec_field]).alias("d"), c[id_field].alias("_id")),
    )
    return F.array_min(scored)["_id"]
