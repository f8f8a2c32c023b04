"""Deterministic content-hash dataset splitting (train/val/test).

Training pipelines split by CONTENT HASH, not random(): the assignment
must survive re-ingestion, dedup re-ordering, and incremental appends
— the same document always lands in the same split, with no seed state
to carry. random()/sample() can't give that (and isn't reproducible
across engines); a hash of the content (or a stable key) can.

The bucket is the first 8 hex chars of md5 read as a number, mod a
permille wheel. Both the Spark side and the DuckDB oracle evaluate the
IDENTICAL SQL fragment (instr/substr/md5 exist in both with the same
argument order — sql_hex8_to_long below), so the split is bit-portable
across engines; each term is cast to BIGINT before multiplying because
Spark int32 multiplication would overflow silently at 16^7 scale.

Scale shape: one narrow projection, no shuffle, no state — the split
of 100 TB is embarrassingly parallel and can be recomputed ad hoc
instead of stored.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

WHEEL = 1000  # permille resolution


def sql_hex8_to_long(hx: str) -> str:
    """SQL (valid in both Spark and DuckDB) turning the first 8 hex
    chars in column/expr `hx` into a BIGINT in [0, 16^8)."""
    return " + ".join(
        f"(instr('0123456789abcdef', substr({hx}, {i + 1}, 1)) - 1)"
        f" * CAST({16 ** (7 - i)} AS BIGINT)"
        for i in range(8)
    )


def sql_split_case(content_expr: str, weights: dict[str, float], salt: str = "") -> str:
    """SQL CASE assigning a split label from the content-hash bucket;
    same text runs on Spark and the oracle. Weights must sum to 1 and
    be representable in permille."""
    cuts = _cuts(weights)
    hx = f"substr(md5({content_expr} || '{salt}'), 1, 8)"
    bucket = f"(({sql_hex8_to_long(hx)}) % {WHEEL})"
    branches = " ".join(
        f"WHEN {bucket} < {hi} THEN '{name}'" for name, hi in cuts[:-1]
    )
    return f"CASE {branches} ELSE '{cuts[-1][0]}' END"


def _cuts(weights: dict[str, float]) -> list[tuple[str, int]]:
    if abs(sum(weights.values()) - 1.0) > 1e-9:
        raise ValueError("split weights must sum to 1")
    cuts, acc = [], 0
    for name, w in weights.items():
        pm = round(w * WHEEL)
        if pm <= 0:
            raise ValueError(f"weight for {name!r} below 1/{WHEEL} resolution")
        acc += pm
        cuts.append((name, acc))
    if cuts[-1][1] != WHEEL:
        raise ValueError("weights must be exact permille fractions")
    return cuts


def hash_split(
    df: DataFrame,
    content_col: str,
    weights: dict[str, float] | None = None,
    salt: str = "",
) -> DataFrame:
    """Append a deterministic `split` column keyed on the content hash.
    `salt` re-rolls every assignment at once (e.g. per experiment)."""
    weights = weights or {"train": 0.8, "val": 0.1, "test": 0.1}
    return df.withColumn(
        "split", F.expr(sql_split_case(content_col, weights, salt))
    )
