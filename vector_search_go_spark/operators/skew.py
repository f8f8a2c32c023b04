"""Skew-handling utilities: salting for hot keys.

AQE's skew-join handling covers sort-merge joins automatically; these
helpers cover the two shapes AQE doesn't: skewed aggregations and
broadcast-incompatible hot-key joins. Standard two-phase construction:

  salted aggregation:  groupBy(key, salt) partial -> groupBy(key) merge
  salted join:         explode the small side x n_salt, salt the big
                       side's key with hash(row) % n_salt -> equi-join
                       on (key, salt) — hot keys spread over n_salt
                       reducers instead of one.

At 100 TB this is the difference between one straggler task holding a
hot user_id/token and even task distribution.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _salt_col(n_salt: int):
    # pmod, not abs(hash) % n: hash() can return Int.MinValue, whose
    # abs() overflows negative and would silently drop rows from the
    # salted join (one-in-2^32 per row — real at target scale).
    return F.pmod(F.hash(F.monotonically_increasing_id()), F.lit(n_salt))


def salted_count(
    df: DataFrame, key_cols: list[str], n_salt: int = 16, count_name: str = "n"
) -> DataFrame:
    """Two-phase skew-safe count by key."""
    salt = _salt_col(n_salt).alias("_salt")
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(*key_cols, "_salt")
        .agg(F.count(F.lit(1)).alias("_partial"))
    )
    return partial.groupBy(*key_cols).agg(F.sum("_partial").cast("long").alias(count_name))


def salted_sum(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    n_salt: int = 16,
    sum_name: str = "total",
) -> DataFrame:
    """Two-phase skew-safe sum; use a decimal/long value column when the
    result must be order-independent."""
    salt = _salt_col(n_salt).alias("_salt")
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(*key_cols, "_salt")
        .agg(F.sum(value_col).alias("_partial"))
    )
    return partial.groupBy(*key_cols).agg(F.sum("_partial").alias(sum_name))


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    n_salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: replicate the small side n_salt times, salt
    the big side deterministically from its own rows, join on
    (key, salt). Result == big.join(small, on, how) row-for-row for the
    supported join types; right/full outer are rejected because
    unmatched small-side rows would appear once per salt replica."""
    if how not in ("inner", "left", "left_outer", "left_semi", "left_anti"):
        raise ValueError(
            f"salted_join does not support how={how!r}: the replicated "
            "small side would duplicate unmatched rows n_salt times"
        )
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1))).alias("_salt")
    small_rep = small.select("*", salts)
    big_salted = big.withColumn("_salt", _salt_col(n_salt))
    return big_salted.join(small_rep, on=[on, "_salt"], how=how).drop("_salt")
