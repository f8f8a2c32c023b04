"""SQL-text metric builders == column-API metrics, bit for bit."""

from __future__ import annotations

from pyspark.sql import functions as F

from vector_search_go_spark.functions.metrics import cosine_dist, l2_dist
from vector_search_go_spark.functions.sqltext import cosine_dist_sql, l2_dist_sql
from vector_search_go_spark.io import register_views


def test_sql_text_equals_column_api(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(50)
    a = emb.selectExpr("vec_id as ia", "embedding as va")
    b = emb.selectExpr("vec_id as ib", "embedding as vb")
    pairs = a.crossJoin(b).filter("ia < ib").limit(500)
    via_sql = pairs.selectExpr(
        "ia",
        "ib",
        f"{l2_dist_sql('va', 'vb')} as l2",
        f"{cosine_dist_sql('va', 'vb')} as cosd",
    )
    via_col = pairs.select(
        "ia",
        "ib",
        l2_dist(F.col("va"), F.col("vb")).alias("l2"),
        cosine_dist(F.col("va"), F.col("vb")).alias("cosd"),
    )
    s = {(r["ia"], r["ib"]): (r["l2"], r["cosd"]) for r in via_sql.collect()}
    c = {(r["ia"], r["ib"]): (r["l2"], r["cosd"]) for r in via_col.collect()}
    assert s == c  # bit-exact equality, no tolerance


def test_spark_sql_over_registered_views(spark, sf_dir):
    register_views(spark, sf_dir)
    rows = spark.sql(
        f"""
        SELECT e1.vec_id, {l2_dist_sql('e1.embedding', 'e2.embedding')} AS d
        FROM embeddings e1 JOIN embeddings e2 ON e2.vec_id = 0
        WHERE e1.vec_id < 5
        ORDER BY e1.vec_id
        """
    ).collect()
    assert len(rows) == 5
    assert rows[0]["d"] == 0.0  # vec 0 against itself
