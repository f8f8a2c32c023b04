"""Spark-SQL text builders for the metric expressions.

The metrics in ``functions.metrics`` are pure Catalyst expressions, so
they are equally expressible as SQL strings — these builders let
``spark.sql`` / ``selectExpr`` users call the engine's distance
semantics (including the cosine edge guards) without the DataFrame API.
Mirrors the DuckDB builders in ``oracle.vector_sql`` (same fold order),
so SQL-text results are bit-identical to both the column API and the
oracle.
"""

from __future__ import annotations

from vector_search_go_spark.config import TOL


def _cast_double(arr: str) -> str:
    return f"transform({arr}, _x -> CAST(_x AS DOUBLE))"


def _fold_sum(arr: str) -> str:
    return f"aggregate({arr}, CAST(0 AS DOUBLE), (_acc, _v) -> _acc + _v)"


def l2_dist_sql(a: str, b: str) -> str:
    diffsq = (
        f"zip_with({_cast_double(a)}, {_cast_double(b)}, "
        f"(_x, _y) -> (_x - _y) * (_x - _y))"
    )
    return f"sqrt({_fold_sum(diffsq)})"


def dot_sql(a: str, b: str) -> str:
    prods = f"zip_with({_cast_double(a)}, {_cast_double(b)}, (_x, _y) -> _x * _y)"
    return _fold_sum(prods)


def l2_norm_sql(a: str) -> str:
    sq = f"transform({_cast_double(a)}, _x -> _x * _x)"
    return f"sqrt({_fold_sum(sq)})"


def cosine_dist_sql(a: str, b: str) -> str:
    na, nb = l2_norm_sql(a), l2_norm_sql(b)
    raw = f"(CAST(1 AS DOUBLE) - {dot_sql(a, b)} / ({na} * {nb}))"
    return (
        f"CASE WHEN {na} <= {TOL} OR {nb} <= {TOL} THEN CAST(1 AS DOUBLE) "
        f"WHEN {raw} < {TOL} THEN CAST(0 AS DOUBLE) "
        f"ELSE {raw} END"
    )
