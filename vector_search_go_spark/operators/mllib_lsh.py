"""MLlib LSH comparison backend (SURVEY.md section 7 Phase 3).

Spark MLlib ships two LSH families — BucketedRandomProjectionLSH
(Euclidean, Gaussian random planes) and MinHashLSH (Jaccard). They are
the sanity baseline to our reference-faithful Annoy-style trees: the
reference uses data-dependent mid-planes (hasher.go:100-134), MLlib uses
data-independent Gaussian projections. Both are exposed so recall can be
compared on the same splits.

Gated behind import-try: MLlib is part of pyspark, but numpy-version
mismatches can break `pyspark.ml` independently of SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

try:
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector
    from pyspark.ml.linalg import Vectors

    MLLIB_AVAILABLE = True
except Exception:  # pragma: no cover - environment-dependent
    MLLIB_AVAILABLE = False


def mllib_knn_l2(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    bucket_length: float = 2.0,
    num_hash_tables: int = 4,
    seed: int = 42,
) -> DataFrame:
    """queries(query_id, qvec) x corpus(id, vec) -> (query_id, id, dist, rn)
    via BucketedRandomProjectionLSH.approxSimilarityJoin."""
    if not MLLIB_AVAILABLE:
        raise ImportError("pyspark.ml unavailable in this environment")
    c = corpus.select("id", array_to_vector(F.col("vec")).alias("features"))
    q = queries.select(
        "query_id", array_to_vector(F.col("qvec")).alias("features")
    )
    lsh = BucketedRandomProjectionLSH(
        inputCol="features",
        outputCol="hashes",
        bucketLength=bucket_length,
        numHashTables=num_hash_tables,
        seed=seed,
    )
    model = lsh.fit(c)
    joined = model.approxSimilarityJoin(q, c, float("inf"), distCol="dist")
    scored = joined.select(
        F.col("datasetA.query_id").alias("query_id"),
        F.col("datasetB.id").alias("id"),
        "dist",
    )
    from vector_search_go_spark.operators.topk import topk_per_group

    return topk_per_group(
        scored, ["query_id"], "dist", k, tiebreak_cols=["id"]
    ).select("query_id", "id", "dist", "rn")
