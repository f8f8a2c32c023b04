"""As-of join and banded range join vs naive inequality-join references,
including tie and bin-boundary edges."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from vector_search_go_spark.operators.temporal import asof_join, range_join_banded


def _ts(s: int, us: int = 0):
    return datetime(2024, 1, 1, 0, 0, 0).replace(second=0) .fromtimestamp(1704067200 + s).replace(microsecond=us)


def _mk(spark, rows):
    return spark.createDataFrame(rows, "user_id bigint, event_id bigint, ts timestamp")


def test_asof_matches_naive(spark):
    left = _mk(
        spark,
        [
            (1, 100, _ts(10)),
            (1, 101, _ts(20)),
            (2, 200, _ts(5)),
            (3, 300, _ts(50)),  # user with no clicks at all
        ],
    )
    right = _mk(
        spark,
        [
            (1, 10, _ts(10)),  # exactly equal ts -> counts (<=)
            (1, 11, _ts(10)),  # same-ts tie -> max id (11) wins
            (1, 12, _ts(15)),
            (2, 20, _ts(6)),  # after the left row -> no match
        ],
    )
    got = {
        (r["user_id"], r["l_event_id"]): r["r_event_id"]
        for r in asof_join(left, right, key="user_id").collect()
    }
    assert got[(1, 100)] == 11  # equal-ts tie broken to max id
    assert got[(1, 101)] == 12
    assert got[(2, 200)] is None
    assert got[(3, 300)] is None


def test_range_join_matches_naive_inequality(spark):
    import random

    random.seed(9)
    left = _mk(
        spark,
        [(i % 5, 1000 + i, _ts(random.randint(0, 2000), random.randint(0, 999999)))
         for i in range(120)],
    )
    right = _mk(
        spark,
        [(i % 5, 2000 + i, _ts(random.randint(0, 2000), random.randint(0, 999999)))
         for i in range(120)],
    )
    gap = 120_000_000  # 2 min in us
    got = {
        (r["user_id"], r["l_event_id"], r["r_event_id"], r["gap_us"])
        for r in range_join_banded(left, right, key="user_id", max_gap_us=gap).collect()
    }
    naive = (
        left.alias("a")
        .join(right.alias("b"), on="user_id")
        .withColumn(
            "gap_us", F.unix_micros(F.col("a.ts")) - F.unix_micros(F.col("b.ts"))
        )
        .filter((F.col("gap_us") >= 0) & (F.col("gap_us") <= gap))
    )
    want = {
        (r["user_id"], r["event_id"], right_id, r["gap_us"])
        for r in naive.select(
            "user_id", F.col("a.event_id").alias("event_id"),
            F.col("b.event_id").alias("right_id"), "gap_us"
        ).withColumnRenamed("right_id", "rid").collect()
        for right_id in [r["rid"]]
    }
    assert got == want


def test_range_join_bin_boundary(spark):
    # right exactly max_gap before left, crossing a bin boundary
    left = _mk(spark, [(1, 1, _ts(300))])
    right = _mk(
        spark,
        [(1, 2, _ts(0)), (1, 3, _ts(299, 999999)), (1, 4, _ts(301))],
    )
    rows = range_join_banded(left, right, key="user_id", max_gap_us=300_000_000).collect()
    matched = {r["r_event_id"] for r in rows}
    assert matched == {2, 3}  # gap exactly 300s counts; later right does not
