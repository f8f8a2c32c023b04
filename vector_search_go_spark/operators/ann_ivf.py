"""IVF-style ANN: coarse quantization by nearest-centroid cells.

The scale-path companion to brute-force KNN (exact_knn.py) and the
reference-faithful tree LSH (lsh/): corpus vectors are assigned to the
nearest of C centroids (one broadcast pass), queries probe the nprobe
nearest cells, and exact distance runs only inside probed cells.

Centroids here are a deterministic subset of the corpus (every
``centroid_mod``-th vector) rather than k-means — keeps the operator
seed-free and oracle-expressible; swapping in trained centroids changes
nothing structurally.

At 100 TB: the cell assignment is a broadcast-join projection (no
shuffle of the corpus beyond one write partitioned by cell), and search
cost is |probed cells| not |corpus|.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vector_search_go_spark.functions.metrics import metric_dist
from vector_search_go_spark.operators.topk import topk_per_group


def assign_cells(
    corpus: DataFrame, centroids: DataFrame, metric: str = "cosine"
) -> DataFrame:
    """corpus(id, vec) x centroids(cid, cvec) -> (id, vec, cell):
    nearest centroid per vector, (dist, cid) tie-break.

    Centroids are packed into one broadcast array row and the argmin is
    a single projection (operators.argmin) — the corpus is never
    shuffled or aggregated, so the assignment is a pure map stage."""
    from vector_search_go_spark.io import ensure_parallelism
    from vector_search_go_spark.operators.argmin import argmin_id, pack_centroids

    cents_arr = pack_centroids(centroids)
    cell = argmin_id(
        F.col("_cents"), lambda cv: metric_dist(metric, F.col("vec"), cv)
    )
    return (
        ensure_parallelism(corpus)
        .crossJoin(F.broadcast(cents_arr))
        .select("id", "vec", cell.alias("cell"))
    )


def ivf_search(
    queries: DataFrame,
    cells: DataFrame,
    centroids: DataFrame,
    metric: str = "cosine",
    k: int = 10,
    nprobe: int = 4,
) -> DataFrame:
    """queries(query_id, qvec) -> (query_id, id, dist, rn), probing the
    nprobe nearest cells per query."""
    qprobe = (
        queries.crossJoin(F.broadcast(centroids))
        .withColumn("cdist", metric_dist(metric, F.col("qvec"), F.col("cvec")))
    )
    probes = topk_per_group(
        qprobe, ["query_id"], "cdist", nprobe, tiebreak_cols=["cid"], rank_name="_r"
    ).select("query_id", "qvec", F.col("cid").alias("cell"))
    # queries x nprobe rows — always the small side; without the hint
    # Catalyst picks SortMergeJoin and shuffles the whole cell store.
    cand = F.broadcast(probes).join(cells, on="cell").withColumn(
        "dist", metric_dist(metric, F.col("qvec"), F.col("vec"))
    )
    top = topk_per_group(cand, ["query_id"], "dist", k, tiebreak_cols=["id"])
    return top.select("query_id", "id", "dist", "rn")
