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
from vector_search_go_spark.io import read_parquet_cached
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
    "metric_conversions",
    oracle=f"""
WITH a AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 25 = 0),
     b AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 25 = 1),
     d AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         {sql_cosine_dist('a.embedding', 'b.embedding')} AS cos_dist
  FROM a CROSS JOIN b)
SELECT id_a, id_b, cos_dist,
       sqrt(2 * cos_dist) AS angular,
       (sqrt(2 * cos_dist) * sqrt(2 * cos_dist)) / 2 AS cos_roundtrip
FROM d
""",
)
def metric_conversions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Angular <-> cosine distance conversions (reference
    AngularToCosineDist/CosineDistToAngular, helpers.go:240-246):
    angular = sqrt(2c); roundtrip (a^2)/2 recovers c up to fp."""
    from vector_search_go_spark.functions.metrics import (
        angular_to_cosine_dist,
        cosine_to_angular_dist,
    )

    emb = read_parquet_cached(spark, f"{sf_dir}/embeddings.parquet")
    a = emb.filter(F.col("vec_id") % 25 == 0).select(
        F.col("vec_id").alias("id_a"), F.col("embedding").alias("va")
    )
    b = emb.filter(F.col("vec_id") % 25 == 1).select(
        F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb")
    )
    d = a.crossJoin(F.broadcast(b)).select(
        "id_a", "id_b", cosine_dist(F.col("va"), F.col("vb")).alias("cos_dist")
    )
    ang = cosine_to_angular_dist(F.col("cos_dist"))
    return d.select(
        "id_a",
        "id_b",
        "cos_dist",
        ang.alias("angular"),
        angular_to_cosine_dist(ang).alias("cos_roundtrip"),
    )


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
    emb = read_parquet_cached(spark, f"{sf_dir}/embeddings.parquet")
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
    emb = read_parquet_cached(spark, f"{sf_dir}/embeddings.parquet")
    vd = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    return emb.agg(
        F.min(F.array_min(vd)).alias("lo"), F.max(F.array_max(vd)).alias("hi")
    )


_STATS_ORACLE = """
WITH e AS (
  SELECT t.i - 1 AS dim, vec_id, CAST(embedding[t.i] AS DOUBLE) AS x
  FROM embeddings, range(1, 65) t(i)
), g AS (
  SELECT dim, list(x ORDER BY vec_id) AS xs, count(*) AS n FROM e GROUP BY dim
), m AS (
  SELECT dim, n, xs,
         list_reduce(list_prepend(CAST(0 AS DOUBLE), xs), (_a, _b) -> _a + _b) / n AS mean
  FROM g
)
SELECT CAST(dim AS INT) AS dim, mean,
       list_reduce(list_prepend(CAST(0 AS DOUBLE),
                                list_transform(xs, _v -> abs(_v - mean))),
                   (_a, _b) -> _a + _b) / n AS mad
FROM m
"""


def _stats_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-fixed mean + MAD per dimension. Replicates the reference's
    GetMeanStdSampled semantics (helpers.go:45-80) where "std" is mean
    absolute deviation — NOT true std (SURVEY.md section 2 O19). The
    fold over a vec_id-sorted list makes the double sum order-identical
    to the DuckDB oracle; the production path (operators.stats) uses
    plain avg()."""
    emb = read_parquet_cached(spark, f"{sf_dir}/embeddings.parquet")
    exploded = emb.select(
        "vec_id",
        F.posexplode(
            F.transform(F.col("embedding"), lambda x: x.cast("double"))
        ).alias("dim", "x"),
    )
    g = exploded.groupBy("dim").agg(
        F.sort_array(F.collect_list(F.struct("vec_id", "x"))).alias("pairs"),
        F.count(F.lit(1)).alias("n"),
    )
    xs = F.transform(F.col("pairs"), lambda p: p["x"])
    fold = lambda arr: F.aggregate(arr, F.lit(0.0), lambda a, b: a + b)  # noqa: E731
    m = g.select(
        "dim", "n", xs.alias("xs"), (fold(xs) / F.col("n")).alias("mean")
    )
    mad = fold(F.transform(F.col("xs"), lambda v: F.abs(v - F.col("mean")))) / F.col("n")
    return m.select(F.col("dim").cast("int"), "mean", mad.alias("mad"))


@register("vector_stats_mad", oracle=_STATS_ORACLE)
def vector_stats_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _stats_df(spark, sf_dir)


@register(
    "vector_scale_standard",
    oracle=f"""
WITH m AS ({_STATS_ORACLE}),
arrs AS (
  SELECT list(mean ORDER BY dim) AS mean_arr, list(mad ORDER BY dim) AS mad_arr FROM m
),
s AS (
  SELECT vec_id,
         list_transform(list_zip(embedding, mean_arr, mad_arr),
           _t -> CASE WHEN abs(_t[3]) <= 1e-12
                      THEN CAST(_t[1] AS DOUBLE) - _t[2]
                      ELSE (CAST(_t[1] AS DOUBLE) - _t[2]) / _t[3] END) AS scaled
  FROM embeddings, arrs
  WHERE vec_id < 20
)
SELECT vec_id,
       CAST(unnest(generate_series(0, len(scaled) - 1)) AS INT) AS pos,
       unnest(scaled) AS x
FROM s
""",
)
def vector_scale_standard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Standard scaler (reference NewStandartScaler/Scale,
    helpers.go:152-191): (x - mean)/"std" with the reference's
    zero-std -> divide-by-1 fill; "std" is the MAD from O19.

    Output is exploded to (vec_id, pos, x) scalar rows: the driver's
    canonicalizer sorts columns by value and cannot hash array cells."""
    stats = _stats_df(spark, sf_dir)
    arrs = stats.agg(
        F.sort_array(F.collect_list(F.struct("dim", "mean", "mad"))).alias("s")
    ).select(
        F.transform(F.col("s"), lambda p: p["mean"]).alias("mean_arr"),
        F.transform(F.col("s"), lambda p: p["mad"]).alias("mad_arr"),
    )
    emb = read_parquet_cached(spark, f"{sf_dir}/embeddings.parquet").filter(
        F.col("vec_id") < 20
    )
    xm = F.zip_with(
        F.col("embedding"), F.col("mean_arr"), lambda x, m: x.cast("double") - m
    )
    scaled = F.zip_with(
        xm,
        F.col("mad_arr"),
        lambda v, s: F.when(F.abs(s) <= 1e-12, v).otherwise(v / s),
    )
    return emb.crossJoin(F.broadcast(arrs)).select(
        "vec_id", F.posexplode(scaled).alias("pos", "x")
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
    emb = read_parquet_cached(spark, f"{sf_dir}/embeddings.parquet")
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


_FILTERED_KNN_ORACLE = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qvec, label
  FROM embeddings WHERE vec_id % 50 = 0
), c AS (
  SELECT vec_id AS id, embedding AS vec, label
  FROM embeddings WHERE vec_id % 50 <> 0
), d AS (
  SELECT query_id, id, {sql_l2_dist('vec', 'qvec')} AS dist
  FROM q JOIN c USING (label)
)
SELECT query_id, id, dist, CAST(rn AS INT) AS rn FROM (
  SELECT query_id, id, dist,
         row_number() OVER (PARTITION BY query_id ORDER BY dist, id) AS rn
  FROM d) WHERE rn <= 10
"""


@register("knn_exact_filtered", oracle=_FILTERED_KNN_ORACLE)
def knn_exact_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered vector search: exact L2 top-k restricted to corpus rows
    whose ``label`` equals the query's — the metadata-predicate + ANN
    combination every production vector store exposes. The predicate is
    expressed as the JOIN KEY, not a post-filter: each query only ever
    meets its label's partition of the corpus (here 1/10th), so
    selectivity directly divides scan cost. At 100 TB the corpus is
    written partitioned by the filter column and this equi-join prunes
    partitions; post-filtering an unfiltered top-k (the naive
    alternative) both over-scans and under-fills k."""
    from vector_search_go_spark.operators.topk import topk_per_group

    emb = read_parquet_cached(spark, f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec"), "label"
    )
    c = emb.filter(F.col("vec_id") % 50 != 0).select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vec"), "label"
    )
    cand = F.broadcast(q).join(c, on="label").withColumn(
        "dist", l2_dist(F.col("vec"), F.col("qvec"))
    )
    top = topk_per_group(cand, ["query_id"], "dist", 10, tiebreak_cols=["id"])
    return top.select("query_id", "id", "dist", "rn")


def _projection_oracle() -> str:
    from vector_search_go_spark.operators.projection import (
        projection_matrix,
        sql_projection_fold,
        sql_projection_matrix_cte,
    )

    pm = projection_matrix(64, 16, seed=7)
    return f"""
WITH {sql_projection_matrix_cte(pm)}
SELECT vec_id, j.pos - 1 AS pos, {sql_projection_fold(pm)} AS x
FROM embeddings, mat, range(1, 17) j(pos)
"""


@register("embed_random_projection", oracle=_projection_oracle())
def embed_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded Johnson-Lindenstrauss random projection 64-d -> 16-d
    (operators.projection): the standard dim-reduction stage in front of
    high-dimensional ANN indexing. Pure per-row map — no shuffle, the
    matrix rides in the Arrow kernel's closure — and the accumulation
    order matches the oracle's list_reduce fold, so even with the
    Gaussian matrix inlined into the SQL as a literal the comparison is
    bit-exact. Output exploded to (vec_id, pos, x) scalars. The
    reference indexes raw vectors only (lsh/hasher.go:100-138); this is
    the width-reduction a 784-d-at-100-TB deployment would bolt on
    first."""
    from vector_search_go_spark.operators.projection import (
        project_arrow,
        projection_matrix,
    )

    emb = read_parquet_cached(spark, f"{sf_dir}/embeddings.parquet")
    proj = project_arrow(projection_matrix(64, 16, seed=7))
    return (
        emb.select("vec_id", proj(F.col("embedding")).alias("y"))
        .select("vec_id", F.posexplode("y").alias("pos", "x"))
        .select("vec_id", F.col("pos").cast("bigint").alias("pos"), "x")
    )
