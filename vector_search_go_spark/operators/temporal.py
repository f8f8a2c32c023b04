"""Temporal join operators: as-of join and banded range join.

Spark has no native ASOF/range join (named in the builder's brief as
canonical custom operators); both are implemented as compositions of
existing DataFrame ops with scale-correct shapes:

  - as-of join: union the two sides, one window pass per key ordered by
    (ts, side, id) carrying the last right-side row forward — O(n log n)
    in the shuffle, no inequality join, no cross product. The classic
    distributed as-of shape.
  - range join: band each side into fixed time bins and equi-join on
    (key, bin) plus the neighbor bin, then apply the exact predicate —
    the inequality never reaches the join, so Catalyst runs plain hash
    joins; pair cost tracks true matches per band.

Both define explicit deterministic tie-breaks ((ts, id) ordering) so
results are oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str = "ts",
    left_prefix: str = "l_",
    right_prefix: str = "r_",
) -> DataFrame:
    """For every left row, attach the latest right row with
    right.ts <= left.ts for the same key (ties: larger right id wins,
    via (ts, id) ordering). Output: key, {left cols prefixed}, matched
    {right cols prefixed} (null when no prior right row exists).

    left/right must both have columns (key, ts, id, ...); all non-key
    columns are carried through with prefixes.
    """
    lcols = [c for c in left.columns if c != key]
    rcols = [c for c in right.columns if c != key]
    tagged_l = left.select(
        F.col(key),
        F.col(ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.struct(*[F.col(c).alias(left_prefix + c) for c in lcols]).alias("_lpay"),
        F.lit(None).cast(
            "struct<" + ",".join(f"{right_prefix}{c}:{right.schema[c].dataType.simpleString()}" for c in rcols) + ">"
        ).alias("_rpay"),
    )
    tagged_r = right.select(
        F.col(key),
        F.col(ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(
            "struct<" + ",".join(f"{left_prefix}{c}:{left.schema[c].dataType.simpleString()}" for c in lcols) + ">"
        ).alias("_lpay"),
        F.struct(*[F.col(c).alias(right_prefix + c) for c in rcols]).alias("_rpay"),
    )
    unioned = tagged_l.unionByName(tagged_r)
    # right rows (side 0) sort before left rows (side 1) at equal ts, so
    # a right row at exactly left.ts is visible to that left row (<=).
    # tie-break within equal (key, ts, side): struct ordering on the
    # payloads (leading field = id column) — deterministic, and `last`
    # then picks the max-id right row among equal timestamps.
    w = (
        Window.partitionBy(key)
        .orderBy("_ts", "_side", "_rpay", "_lpay")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn("_match", F.last("_rpay", ignorenulls=True).over(w))
    return (
        carried.filter(F.col("_side") == 1)
        .select(key, "_lpay.*", "_match.*")
    )


def range_join_banded(
    left: DataFrame,
    right: DataFrame,
    key: str,
    max_gap_us: int,
    left_ts: str = "ts",
    right_ts: str = "ts",
) -> DataFrame:
    """Pairs (left, right) with the same key where
    0 <= left.ts - right.ts <= max_gap_us (right happens at or before
    left, within the gap). Banding: right rows land in bin
    floor(ts/gap); a qualifying left row's right partner is in the same
    bin or the previous one, so the join is an equi-join on (key, bin)
    over two banded copies — no inequality join, no cross product."""
    lb = left.select(
        F.col(key),
        F.unix_micros(F.col(left_ts)).alias("_lus"),
        *[F.col(c).alias(f"l_{c}") for c in left.columns if c != key],
    ).withColumn("_bin", F.floor(F.col("_lus") / max_gap_us))
    rb = right.select(
        F.col(key).alias("_rkey"),
        F.unix_micros(F.col(right_ts)).alias("_rus"),
        *[F.col(c).alias(f"r_{c}") for c in right.columns if c != key],
    ).withColumn("_rbin", F.floor(F.col("_rus") / max_gap_us))
    expanded = lb.withColumn(
        "_probe", F.explode(F.array(F.col("_bin"), F.col("_bin") - 1))
    )
    joined = expanded.join(
        rb,
        (expanded[key] == rb["_rkey"]) & (expanded["_probe"] == rb["_rbin"]),
    ).drop("_rkey")
    gap = F.col("_lus") - F.col("_rus")
    return (
        joined.filter((gap >= 0) & (gap <= max_gap_us))
        .drop("_bin", "_probe", "_rbin")
        .withColumn("gap_us", gap)
        .drop("_lus", "_rus")
    )
