"""Exact (brute-force) nearest-neighbor search.

Parity target: the reference's ``NNMock`` exact-NN oracle
(annbench/annbench.go:56-125) — full scan, distance to every stored
vector, optional distance threshold, top-k by ascending distance. Same
``Indexer`` role as the LSH index (lsh/lsh.go:54-57).

Spark shape: queries x corpus cross join with the **small query side
broadcast** (no shuffle of the corpus — each corpus partition streams
past the in-memory query set exactly once, which is the optimal exact-KNN
plan at any scale), native fold-based distance expression (JVM codegen,
no Python), then WindowGroupLimit top-k.

At 100 TB this is the ground-truth/oracle path by design — the production
ANN path is ``vector_search_go_spark.lsh`` (SURVEY.md section 7 Phase 1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_search_go_spark.config import TOL
from vector_search_go_spark.functions.metrics import dot, l2_norm, metric_dist
from vector_search_go_spark.operators.topk import topk_per_group


def exact_knn_join(
    queries: DataFrame,
    corpus: DataFrame,
    metric: str = "l2",
    k: int = 10,
    threshold: float | None = None,
) -> DataFrame:
    """queries(query_id, qvec) x corpus(id, vec) -> (query_id, id, dist, rn).

    ``threshold`` mirrors the reference's ``distanceThrsh`` filter
    (lsh/lsh.go:177); None means no thresholding.

    For cosine, norms are precomputed once per row on each side before
    the join — one fold per pair (the dot product) instead of three.
    Bit-identical to the inline form: the folds run over the same
    vectors and IEEE multiplication is commutative.
    """
    from vector_search_go_spark.io import ensure_parallelism

    corpus = ensure_parallelism(corpus)
    if metric in ("cosine", "angular"):
        queries = queries.withColumn("_qn", l2_norm(F.col("qvec")))
        corpus = corpus.withColumn("_vn", l2_norm(F.col("vec")))
        cand = corpus.crossJoin(F.broadcast(queries))
        raw = F.lit(1.0) - dot(F.col("qvec"), F.col("vec")) / (
            F.col("_qn") * F.col("_vn")
        )
        dist = F.when(
            (F.col("_qn") <= F.lit(TOL)) | (F.col("_vn") <= F.lit(TOL)), F.lit(1.0)
        ).otherwise(F.when(raw < F.lit(TOL), F.lit(0.0)).otherwise(raw))
        cand = cand.withColumn("dist", dist)
    else:
        cand = corpus.crossJoin(F.broadcast(queries))
        cand = cand.withColumn("dist", metric_dist(metric, F.col("qvec"), F.col("vec")))
    if threshold is not None:
        cand = cand.filter(F.col("dist") <= F.lit(float(threshold)))
    top = topk_per_group(
        cand, ["query_id"], "dist", k, tiebreak_cols=["id"], rank_name="rn"
    )
    return top.select("query_id", "id", "dist", "rn")


def embeddings_split(
    spark: SparkSession, sf_dir: str, query_mod: int = 50
) -> tuple[DataFrame, DataFrame]:
    """Held-out split of the embeddings table (FIXTURES.md B1 convention):
    ``vec_id % query_mod == 0`` are queries, the rest are the corpus."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") % query_mod == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    corpus = emb.filter(F.col("vec_id") % query_mod != 0).select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vec")
    )
    return queries, corpus


def exact_knn_embeddings(
    spark: SparkSession,
    sf_dir: str,
    metric: str = "l2",
    k: int = 10,
    query_mod: int = 50,
    threshold: float | None = None,
) -> DataFrame:
    queries, corpus = embeddings_split(spark, sf_dir, query_mod)
    return exact_knn_join(queries, corpus, metric=metric, k=k, threshold=threshold)
