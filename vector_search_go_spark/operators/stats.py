"""Per-dimension column stats + standard scaler.

Parity targets:
  - GetMeanStdSampled (lsh/helpers.go:45-80; duplicate
    GetMeanStdSampledRecords :83-118): mean + "std" per dimension over a
    random sample with replacement. NB the reference's "std" is actually
    the MEAN ABSOLUTE DEVIATION — it accumulates sqrt((x-mean)^2) = |x-mean|
    and divides by n without a final variance sqrt (helpers.go:71-78).
    We replicate MAD semantics under the same name.
  - NewStandartScaler/Scale (lsh/helpers.go:152-191): (x - mean)/std
    elementwise; missing mean -> 0-fill, missing/zero std -> 1-fill.

Spark shape: posexplode the vector column -> per-dim aggregation. The
production path uses plain avg() (map-side partial agg, one tiny
shuffle); the oracle-checked query variant in queries_vector.py uses an
order-fixed fold so the hash matches DuckDB bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def column_stats(
    df: DataFrame,
    vec_col: str = "vec",
    sample_fraction: float | None = None,
    seed: int = 42,
) -> DataFrame:
    """-> (dim INT, mean DOUBLE, mad DOUBLE), one row per dimension.

    ``sample_fraction`` mirrors the reference's sampling (helpers.go:56-61
    — with replacement there; Spark's Bernoulli sample is the distributed
    analog); None = exact stats over all rows.
    """
    src = df
    if sample_fraction is not None:
        src = df.sample(fraction=sample_fraction, seed=seed)
    exploded = src.select(
        F.posexplode(F.transform(F.col(vec_col), lambda x: x.cast("double"))).alias(
            "dim", "x"
        )
    )
    means = exploded.groupBy("dim").agg(F.avg("x").alias("mean"))
    return (
        exploded.join(means, "dim")
        .groupBy("dim")
        .agg(
            F.first("mean").alias("mean"),
            F.avg(F.abs(F.col("x") - F.col("mean"))).alias("mad"),
        )
        .select(F.col("dim").cast("int"), "mean", "mad")
    )


def scale_expr(vec: Column, mean: Column, std: Column) -> Column:
    """(x - mean[i]) / std[i] elementwise; zero/missing std treated as 1,
    matching the reference's fill logic (helpers.go:158-171)."""
    return F.zip_with(
        F.zip_with(vec, mean, lambda x, m: x.cast("double") - m),
        std,
        lambda xm, s: F.when(F.abs(s) <= 1e-12, xm).otherwise(xm / s),
    )
