"""Content-hash splitting: determinism, stability, proportions, salting."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vector_search_go_spark.io import table
from vector_search_go_spark.operators.split import hash_split


def _docs(spark, sf_dir):
    return table(spark, sf_dir, "documents").select("doc_id", "text")


def test_deterministic_and_subset_stable(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    full = {r["doc_id"]: r["split"] for r in hash_split(docs, "text").collect()}
    again = {r["doc_id"]: r["split"] for r in hash_split(docs, "text").collect()}
    assert full == again
    # assignments don't move when the surrounding dataset changes
    subset = {
        r["doc_id"]: r["split"]
        for r in hash_split(docs.filter("doc_id % 3 = 0"), "text").collect()
    }
    assert all(full[k] == v for k, v in subset.items())


def test_proportions(spark, sf_dir):
    counts = (
        hash_split(_docs(spark, sf_dir), "text")
        .groupBy("split")
        .count()
        .collect()
    )
    by = {r["split"]: r["count"] for r in counts}
    n = sum(by.values())
    assert set(by) == {"train", "val", "test"}
    assert abs(by["train"] / n - 0.8) < 0.08
    assert abs(by["val"] / n - 0.1) < 0.05
    assert abs(by["test"] / n - 0.1) < 0.05


def test_salt_rerolls(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    a = {r["doc_id"]: r["split"] for r in hash_split(docs, "text").collect()}
    b = {
        r["doc_id"]: r["split"]
        for r in hash_split(docs, "text", salt="exp2").collect()
    }
    assert a != b  # some assignments moved
    assert set(b.values()) == {"train", "val", "test"}


def test_weight_validation(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    with pytest.raises(ValueError, match="sum to 1"):
        hash_split(docs, "text", {"a": 0.5, "b": 0.4})
    with pytest.raises(ValueError, match="resolution"):
        hash_split(docs, "text", {"a": 0.9995, "b": 0.0005})
