"""Mergeable-sketch rollups: the materialized-aggregate pattern.

The hypertable/continuous-aggregate story has two halves: additive
measures (counts, decimal sums) re-aggregate exactly level-to-level
(queries_pipeline.rollup_multiresolution), but COUNT DISTINCT does not
— distinct users per hour can't be summed into distinct users per day.
The fix at scale is a mergeable sketch as the materialized partial:
persist one DataSketches HLL sketch per fine bucket (a few KB binary
column), and answer any coarser window by UNIONING sketches — never
rescanning raw rows. Sketch union is lossless w.r.t. sketch state, so
merged-then-estimated equals sketched-directly exactly (asserted in
tests), and the estimate is within the standard HLL error of the true
distinct count.

All JVM-side (Spark 3.5+ hll_sketch_agg / hll_union_agg /
hll_sketch_estimate); sketches round-trip through parquet as plain
binary columns — exactly how a 100 TB pipeline would persist the
hourly layer and serve daily/weekly/ad-hoc ranges from it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

LG_K = 12  # 4 KB sketches, ~1.6% standard error


def sketch_bucket_rollup(
    df: DataFrame,
    ts: str,
    distinct_col: str,
    fine_fmt: str = "yyyy-MM-dd HH",
    coarse_fmt: str = "yyyy-MM-dd",
) -> DataFrame:
    """Materialize fine-bucket partials (HLL sketch of `distinct_col` +
    exact additive count), keyed by both bucket resolutions."""
    return df.groupBy(
        F.date_format(ts, fine_fmt).alias("fine_bucket"),
        F.date_format(ts, coarse_fmt).alias("coarse_bucket"),
    ).agg(
        F.hll_sketch_agg(distinct_col, F.lit(LG_K)).alias("distinct_sk"),
        F.count(F.lit(1)).alias("n"),
    )


def merge_to_coarse(partials: DataFrame) -> DataFrame:
    """Serve the coarse resolution purely from the fine partials: union
    the sketches, sum the additive measures. Input can be live or read
    back from the persisted parquet layer — sketches are plain binary."""
    return partials.groupBy("coarse_bucket").agg(
        F.hll_sketch_estimate(F.hll_union_agg("distinct_sk")).alias(
            "approx_distinct"
        ),
        F.sum("n").alias("n"),
        F.count(F.lit(1)).alias("n_fine_buckets"),
    )
