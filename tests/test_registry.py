"""Driver-contract invariants for the query registry."""

from __future__ import annotations

from vector_search_go_spark import registry


def test_every_oracle_has_a_query():
    qs, oracles = registry.queries(), registry.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 60
    assert all(callable(fn) for fn in qs.values())


def test_entry_module_contract():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", "/root/repo/__spark_entry__.py"
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    assert callable(m.entry)
    assert set(m.oracle_sql()) <= set(m.queries())
