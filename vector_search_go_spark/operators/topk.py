"""Per-group top-k (reference FloatMinHeap, lsh/lsh.go:22-45).

The reference pops a min-heap ``maxNN`` times for one query
(lsh/lsh.go:192-196); the batch equivalent is a rank window per query
with a deterministic ``(dist, id)`` tie-break — the reference is
nondeterministic on ties / truncation (Go map iteration order,
SURVEY.md section 3.2); we define the deterministic semantics.

Scale note: Spark >= 3.5 rewrites ``row_number() <= k`` into
WindowGroupLimit (per-partition top-k before the shuffle), so this does a
partial top-k map-side — the same work the reference's heap does, but
distributed. No custom physical operator needed (SURVEY.md section 4).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def topk_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_col: str,
    k: int,
    tiebreak_cols: list[str] | None = None,
    rank_name: str = "rn",
    ascending: bool = True,
) -> DataFrame:
    order: list[Column] = [
        F.col(order_col).asc() if ascending else F.col(order_col).desc()
    ]
    for c in tiebreak_cols or []:
        order.append(F.col(c).asc())
    w = Window.partitionBy(*group_cols).orderBy(*order)
    return (
        df.withColumn(rank_name, F.row_number().over(w))
        .filter(F.col(rank_name) <= F.lit(k))
    )
