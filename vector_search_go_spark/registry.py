"""Query registry backing ``__spark_entry__``.

Each registered query is a (spark_fn, oracle_sql | None) pair. Spark fn
signature: ``(spark, sf_dir) -> DataFrame``. Oracle SQL is ANSI SQL
DuckDB runs against the same parquet tables (pre-registered views). The
driver compares row count + schema + order-insensitive value hash, with
columns sorted by name — so every computed column is aliased identically
on both sides (see the contract in ``__spark_entry__.py``).

Queries registered here without oracle SQL get the driver's weaker
rows-only check (used for randomized / non-SQL-expressible operators,
e.g. the LSH index itself).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, SparkQuery] = {}
_ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    """Decorator: register a (spark, sf_dir) -> DataFrame query."""

    def deco(fn: SparkQuery) -> SparkQuery:
        if name in _QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


def queries() -> dict[str, SparkQuery]:
    _ensure_loaded()
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    _ensure_loaded()
    return dict(_ORACLES)


_LOADED = False


def _ensure_loaded() -> None:
    """Import every module that registers queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    # Imports are for their registration side effects.
    from vector_search_go_spark import queries_vector  # noqa: F401
    from vector_search_go_spark import queries_relational  # noqa: F401
    from vector_search_go_spark import queries_text  # noqa: F401
    from vector_search_go_spark import queries_lsh  # noqa: F401
    from vector_search_go_spark import queries_pipeline  # noqa: F401

    _LOADED = True
