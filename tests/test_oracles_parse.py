"""Every oracle must at least bind/plan in DuckDB against the real
views — catches SQL drift without waiting for the full value comparison."""

from __future__ import annotations

import duckdb
import pytest

from vector_search_go_spark import registry
from vector_search_go_spark.io import TABLES


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return c


@pytest.mark.parametrize("name", sorted(registry.oracle_sql()))
def test_oracle_plans(con, name):
    sql = registry.oracle_sql()[name]
    con.execute(f"EXPLAIN {sql}")
