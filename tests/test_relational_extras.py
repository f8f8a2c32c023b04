"""Accuracy bounds for the approximate aggregate surface."""

from __future__ import annotations

from pyspark.sql import functions as F

from vector_search_go_spark.io import table
from vector_search_go_spark.queries_relational import approx_aggregates


def test_approx_aggregates_accuracy(spark, sf_dir):
    approx = {r["l_returnflag"]: r for r in approx_aggregates(spark, sf_dir).collect()}
    exact = {
        r["l_returnflag"]: r
        for r in table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
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
