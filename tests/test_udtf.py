"""Python UDTF vs the native shingle expression."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vector_search_go_spark.functions.udtf_shingles import UDTF_AVAILABLE
from vector_search_go_spark.queries_text import _shingled_docs

pytestmark = pytest.mark.skipif(not UDTF_AVAILABLE, reason="no @udtf in this pyspark")


def test_udtf_matches_native_shingles(spark, sf_dir):
    from vector_search_go_spark.functions.udtf_shingles import ShingleUDTF

    spark.udtf.register("shingles", ShingleUDTF)
    spark.read.parquet(f"{sf_dir}/documents.parquet").createOrReplaceTempView("docs")
    via_udtf = spark.sql(
        """
        SELECT s.doc_id, s.shingle
        FROM docs, LATERAL shingles(doc_id, text) s
        """
    )
    got = (
        via_udtf.groupBy("doc_id")
        .agg(F.collect_set("shingle").alias("s"))
        .select("doc_id", F.size("s").alias("n"))
    )
    want = _shingled_docs(spark, sf_dir).select(
        "doc_id", F.size("shingles").alias("n")
    )
    g = {r["doc_id"]: r["n"] for r in got.collect()}
    w = {r["doc_id"]: r["n"] for r in want.collect()}
    assert g == w
