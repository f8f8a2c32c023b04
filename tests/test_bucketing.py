"""Bucketed-table co-located joins: no shuffle exchange on either side."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vector_search_go_spark.io import table, write_bucketed


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    write_bucketed(
        table(spark, sf_dir, "orders"), "orders_b", "o_orderkey", 8, "o_orderkey"
    )
    write_bucketed(
        table(spark, sf_dir, "lineitem"), "lineitem_b", "l_orderkey", 8, "l_orderkey"
    )
    yield
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    o = spark.table("orders_b")
    li = spark.table("lineitem_b")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = li.join(o, li.l_orderkey == o.o_orderkey).groupBy(
            "o_orderpriority"
        ).agg(F.count(F.lit(1)).alias("n"))
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # the join itself reads bucketed scans directly — the only
        # exchange allowed is the one for the final tiny aggregation
        join_part = plan.split("HashAggregate")[-1]
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning(l_orderkey" not in plan
        assert "Exchange hashpartitioning(o_orderkey" not in plan
        # and the result is right
        want = (
            table(spark, "/root/testdata/sf0.001", "lineitem")
            .join(
                table(spark, "/root/testdata/sf0.001", "orders"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .count()
        )
        assert joined.agg(F.sum("n")).collect()[0][0] == want
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
