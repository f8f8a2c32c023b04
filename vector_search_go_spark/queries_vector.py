"""Vector-search query pack: exact KNN, metrics, vector stats.

SURVEY.md section 2 rows O14/O15 (metrics), O20 (exact NN), O18 (scaler),
O19 (sampled stats), O23 (matrix min/max). Every entry here has a
bit-exact DuckDB oracle (same fold order — see oracle/vector_sql.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_search_go_spark.functions.metrics import (
    cosine_dist,
    l2_dist,
    l2_norm,
)
from vector_search_go_spark.operators.exact_knn import exact_knn_embeddings
from vector_search_go_spark.oracle.vector_sql import (
    sql_cosine_dist,
    sql_l2_dist,
    sql_l2_norm,
)
from vector_search_go_spark.registry import register

_KNN_ORACLE_TEMPLATE = """
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qvec
  FROM embeddings WHERE vec_id % 50 = 0
), c AS (
  SELECT vec_id AS id, embedding AS vec
  FROM embeddings WHERE vec_id % 50 <> 0
), d AS (
  SELECT query_id, id, {dist} AS dist FROM c CROSS JOIN q
), r AS (
  SELECT query_id, id, dist,
         row_number() OVER (PARTITION BY query_id ORDER BY dist, id) AS rn
  FROM d
)
SELECT query_id, id, dist, CAST(rn AS INT) AS rn FROM r WHERE rn <= 10
"""


@register(
    "knn_exact_l2",
    oracle=_KNN_ORACLE_TEMPLATE.format(dist=sql_l2_dist("vec", "qvec")),
)
def knn_exact_l2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 10-NN, L2, held-out queries (reference annbench.go:56-125)."""
    return exact_knn_embeddings(spark, sf_dir, metric="l2", k=10)


@register(
    "knn_exact_cosine",
    oracle=_KNN_ORACLE_TEMPLATE.format(dist=sql_cosine_dist("vec", "qvec")),
)
def knn_exact_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 10-NN, cosine (reference Angular metric, helpers.go:194-237)."""
    return exact_knn_embeddings(spark, sf_dir, metric="cosine", k=10)


@register(
    "vector_norms",
    oracle=f"""
SELECT vec_id, {sql_l2_norm('embedding')} AS norm,
       CAST(len(embedding) AS INT) AS dim,
       CAST(list_min(list_transform(embedding, _x -> CAST(_x AS DOUBLE))) AS DOUBLE) AS vmin,
       CAST(list_max(list_transform(embedding, _x -> CAST(_x AS DOUBLE))) AS DOUBLE) AS vmax
FROM embeddings
""",
)
def vector_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector norm + min/max (reference GetFloat64Range,
    annbench/annbench.go:127-141, done per-row then aggregable)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    vd = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    return emb.select(
        "vec_id",
        l2_norm(F.col("embedding")).alias("norm"),
        F.size("embedding").alias("dim"),
        F.array_min(vd).alias("vmin"),
        F.array_max(vd).alias("vmax"),
    )


@register(
    "matrix_range",
    oracle="""
SELECT CAST(min(list_min(list_transform(embedding, _x -> CAST(_x AS DOUBLE)))) AS DOUBLE) AS lo,
       CAST(max(list_max(list_transform(embedding, _x -> CAST(_x AS DOUBLE)))) AS DOUBLE) AS hi
FROM embeddings
""",
)
def matrix_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global min/max over the whole matrix (reference GetFloat64Range,
    annbench/annbench.go:127-141 — theirs sorts a copy; min/max agg is the
    scale-correct equivalent)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    vd = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    return emb.agg(
        F.min(F.array_min(vd)).alias("lo"), F.max(F.array_max(vd)).alias("hi")
    )


@register(
    "pairwise_dist_sample",
    oracle=f"""
WITH a AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 25 = 0),
     b AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 25 = 1)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       {sql_l2_dist('a.embedding', 'b.embedding')} AS l2,
       {sql_cosine_dist('a.embedding', 'b.embedding')} AS cos_dist
FROM a CROSS JOIN b
""",
)
def pairwise_dist_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both metrics over a small deterministic pair sample — the direct
    analog of the reference's metric unit surface (lsh_test.go:47-106)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    a = emb.filter(F.col("vec_id") % 25 == 0).select(
        F.col("vec_id").alias("id_a"), F.col("embedding").alias("va")
    )
    b = emb.filter(F.col("vec_id") % 25 == 1).select(
        F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb")
    )
    return a.crossJoin(F.broadcast(b)).select(
        "id_a",
        "id_b",
        l2_dist(F.col("va"), F.col("vb")).alias("l2"),
        cosine_dist(F.col("va"), F.col("vb")).alias("cos_dist"),
    )
