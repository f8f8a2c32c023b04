"""Accuracy bounds for the approximate aggregate surface."""

from __future__ import annotations

from pyspark.sql import functions as F

from vector_search_go_spark.io import table
from vector_search_go_spark.queries_relational import approx_aggregates


def test_approx_aggregates_accuracy(spark, sf_dir):
    # the registered query itself now emits band verdicts vs exact —
    # every group must be inside every band
    verdicts = approx_aggregates(spark, sf_dir).collect()
    assert verdicts
    for r in verdicts:
        for c in ("parts_ok", "p50_ok", "p95_ok", "p99_ok"):
            assert r[c] is True, (r["l_returnflag"], c)

    # estimate-level accuracy of the underlying sketch functions,
    # independent of the band plumbing
    li = table(spark, sf_dir, "lineitem")
    approx = {
        r["l_returnflag"]: r
        for r in li.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"),
            F.percentile_approx("l_extendedprice", 0.5, 10000).alias("price_p50"),
        )
        .collect()
    }
    exact = {
        r["l_returnflag"]: r
        for r in li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("parts"),
            F.expr("percentile(l_extendedprice, 0.5)").alias("p50"),
        )
        .collect()
    }
    for k, a in approx.items():
        e = exact[k]
        assert abs(a["approx_parts"] - e["parts"]) / e["parts"] < 0.05
        assert abs(a["price_p50"] - e["p50"]) / e["p50"] < 0.05
