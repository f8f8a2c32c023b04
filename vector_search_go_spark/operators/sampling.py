"""Deterministic stratified sampling (corpus-mix rebalancing).

Training pipelines resample their source mix constantly (downweight a
dominant language/source, upweight a scarce one). Doing it with
random()/sampleBy() makes every run a different corpus; doing it with
a CONTENT-HASH keep-predicate makes the sample a pure function of the
data — the same document is kept or dropped on every run, on every
engine, and appending new data never re-rolls old decisions. Same
rationale as operators.split (which shares the md5-bucket wheel).

Scale shape: one narrow projection + filter, no shuffle, no state —
the predicate pushes into the scan, so rebalancing 100 TB reads each
row once and materializes only the keep set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vector_search_go_spark.operators.split import WHEEL, sql_hex8_to_long


def sql_keep_predicate(
    strata_col: str,
    rates: dict[str, float],
    content_expr: str,
    default_rate: float = 1.0,
    salt: str = "",
) -> str:
    """SQL predicate (valid in both Spark and DuckDB) keeping each row
    with its stratum's probability, decided by the row's content-hash
    bucket. Rates must be representable in permille."""
    hx = f"substr(md5({content_expr} || '{salt}'), 1, 8)"
    bucket = f"(({sql_hex8_to_long(hx)}) % {WHEEL})"
    branches = " ".join(
        f"WHEN '{name}' THEN {bucket} < {_permille(rate, name)}"
        for name, rate in rates.items()
    )
    default = f"{bucket} < {_permille(default_rate, '<default>')}"
    return f"(CASE {strata_col} {branches} ELSE {default} END)"


def _permille(rate: float, name: str) -> int:
    pm = round(rate * WHEEL)
    if not 0 <= pm <= WHEEL or abs(pm - rate * WHEEL) > 1e-9:
        raise ValueError(f"rate for {name!r} must be an exact permille in [0, 1]")
    return pm


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates: dict[str, float],
    content_col: str,
    default_rate: float = 1.0,
    salt: str = "",
) -> DataFrame:
    """Keep each row with probability `rates[stratum]` (else
    `default_rate`), deterministically by content hash. `salt` re-rolls
    the whole sample at once (a new experiment), preserving the
    no-seed-state property."""
    return df.filter(
        F.expr(sql_keep_predicate(strata_col, rates, content_col, default_rate, salt))
    )
