"""LSH query-pack entries (SURVEY.md section 2 O2-O13, O21-O22).

These are deterministic (seeded forest, (dist, id) tie-breaks) but NOT
SQL-expressible — the bucket structure depends on our random trees — so
they are registered without oracle SQL and get the driver's rows-only
check; correctness is enforced instead by:
  - tests/test_lsh_e2e.py (reference fixtures, lsh/lsh_test.go:281-341)
  - the epsilon-recall gate vs the exact-KNN oracle (lsh_recall_*),
    mirroring the reference's annbench harness.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_search_go_spark.config import LshConfig
from vector_search_go_spark.lsh.index import LshIndex
from vector_search_go_spark.lsh.search import lsh_search
from vector_search_go_spark.operators.exact_knn import embeddings_split, exact_knn_join
from vector_search_go_spark.operators.recall import distance_based_precision_recall
from vector_search_go_spark.io import read_parquet_cached
from vector_search_go_spark.registry import register

# 40 trees / kmin 100: eps-recall ~0.995 on both metrics at sf0.1 and
# >= 0.93 at sf0.01 — inside the reference bands (>=0.93 Euclidean,
# >=0.85 cosine, BASELINE.md). Like the reference's own configs
# (KMinVecs 200-300 on 60k-1M corpora), the min-bucket size stays
# constant as the corpus grows, so the candidate fraction shrinks with
# scale; at these toy corpus sizes candidates are a large fraction of
# the corpus by construction.
_CFG = dict(dims=64, n_trees=40, k_min_vecs=100, seed=42)

# Hot-bucket cap for the dedup self-join. Natural buckets sit just
# under 2 x k_min_vecs (a split stops once a side would drop below
# k_min_vecs), so 16x the dedup index's k_min_vecs=50 only ever fires
# on unsplittable duplicate-heavy/low-entropy regions — the
# sf0.01/sf0.1 gates see zero capped buckets and keep their exact
# semantics, while adversarial corpora get linear (star) instead of
# quadratic (all-pairs) candidate growth. See dedup_embedding_lsh and
# tests/test_lsh_e2e.py::test_hot_bucket_bound.
_DEDUP_BUCKET_CAP = 800


def hot_bucket_chain_pairs(
    members: DataFrame, dims: int, seed: int, width: int = 2
) -> DataFrame:
    """Bounded candidate pairs for OVERSIZED buckets: sorted-neighborhood
    chaining (Hernandez & Stolfo's blocking technique) instead of the
    sz^2 self-join — at most ``width * |bucket|`` pairs per bucket.

    ``members`` = (tree, hash, id, vec) rows of hot buckets only. Each
    bucket's members sort by two fixed seeded gaussian projections of
    the vector (ties by id); every member links to its next ``width``
    neighbors in that order. Exact/near-duplicate vectors have
    (near-)identical projections, so a duplicate cluster occupies a
    contiguous run and its consecutive links keep it CONNECTED for the
    connected-components consumer — regardless of which ids the bucket
    holds (a min-id star anchor breaks when the anchor happens not to
    be a duplicate: every star pair fails the verification threshold
    and the whole cluster is dropped). Pathological interleavings —
    >= ``width`` consecutive foreign members whose projections fall
    inside a cluster's run — can still split a cluster into multiple
    components (each internally deduped); that residual trade mirrors
    the reference's MaxCandidates truncation (lsh/lsh.go:143,162).
    Connectivity is pinned by
    tests/test_lsh_e2e.py::test_hot_bucket_chain_connectivity."""
    import numpy as np
    from pyspark.sql import Window

    rng = np.random.default_rng(seed)
    projs = [rng.standard_normal(dims) for _ in range(2)]

    def dot_lit(g: "np.ndarray"):
        garr = F.array(*[F.lit(float(x)) for x in g])
        return F.aggregate(
            F.zip_with("vec", garr, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    w = Window.partitionBy("tree", "hash").orderBy("p1", "p2", "id")
    chained = members.select(
        "tree",
        "hash",
        "id",
        dot_lit(projs[0]).alias("p1"),
        dot_lit(projs[1]).alias("p2"),
    ).select(
        "id",
        F.array(
            *[F.lead("id", d).over(w) for d in range(1, width + 1)]
        ).alias("nbrs"),
    )
    return (
        chained.select("id", F.explode("nbrs").alias("nb"))
        # nb == id when the members table carries replayed duplicate
        # (tree, hash, id) rows (the streaming sink is at-least-once):
        # drop the degenerate self-pair so id_a < id_b always holds,
        # matching the small-bucket self-join's strict filter
        .filter(F.col("nb").isNotNull() & (F.col("nb") != F.col("id")))
        .select(
            F.least("id", "nb").alias("id_a"), F.greatest("id", "nb").alias("id_b")
        )
    )


# One trained index per (sf_dir, metric) per process: entries like
# lsh_knn_l2 and lsh_recall_l2 share the same deterministic model, so
# retraining per query entry would only re-run identical work.
_INDEX_MEMO: dict[tuple[str, str, str], LshIndex] = {}


def _index(spark: SparkSession, sf_dir: str, metric: str) -> tuple[LshIndex, DataFrame, DataFrame]:
    import os

    from vector_search_go_spark.operators import model_store

    queries, corpus = embeddings_split(spark, sf_dir)
    # applicationId in the key: cached DataFrames die with their session,
    # so a fresh session (e.g. a new driver run) must retrain.
    mkey = "angular" if metric != "l2" else "l2"
    key = (spark.sparkContext.applicationId, sf_dir, mkey)
    idx = _INDEX_MEMO.get(key)
    if idx is None:
        # cross-process persistence (reference DumpHasher/LoadHasher,
        # lsh/lsh.go:200-207): a saved index is loaded, not retrained —
        # training is deterministic (seeded), so load == retrain.
        # store_path: the layout version is part of the cache key, so a
        # saver-format change forces a rebuild (VERDICT r6 item 6)
        path = model_store.store_path(f"lsh_index_{mkey}", sf_dir)
        if os.path.exists(os.path.join(path, "buckets", "_SUCCESS")):
            idx = LshIndex.load(spark, path)
        else:
            cfg = LshConfig(is_angular=(metric != "l2"), **_CFG)
            idx = LshIndex.train(spark, corpus, cfg, id_col="id", vec_col="vec")
            idx.save(path)
        idx.buckets = idx.buckets.cache()
        _INDEX_MEMO[key] = idx
    return idx, queries, corpus


@register("lsh_knn_l2")
def lsh_knn_l2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train + batch ANN search, L2 (reference Train lsh.go:106-134 +
    Search lsh.go:137-197), k=10 over the held-out embeddings split."""
    idx, queries, _ = _index(spark, sf_dir, "l2")
    return lsh_search(idx, queries, metric="l2", k=10)


@register("lsh_knn_cosine")
def lsh_knn_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same pipeline under the angular metric (normalized hashing,
    reference hasher.go:198-205)."""
    idx, queries, _ = _index(spark, sf_dir, "cosine")
    return lsh_search(idx, queries, metric="cosine", k=10)


@register("lsh_recall_l2")
def lsh_recall_l2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epsilon=0.05 distance-based precision/recall of LSH vs the exact
    oracle (reference DistanceBasedPrecisionRecall, annbench.go:165-187)."""
    idx, queries, corpus = _index(spark, sf_dir, "l2")
    # one query-batch collect feeds the search's driver-side hashing AND
    # the exact-truth kernel (r12, guide §8.4 "decide with small rows")
    qrows = queries.select("query_id", "qvec").collect()
    pred = lsh_search(idx, queries, metric="l2", k=10, qrows=qrows)
    truth = exact_knn_join(queries, corpus, metric="l2", k=10, qrows=qrows)
    return distance_based_precision_recall(pred, truth, epsilon=0.05)


@register("lsh_recall_cosine")
def lsh_recall_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cosine-metric epsilon-recall (the reference's weak spot: angular
    datasets need many trees and still lose recall, README.md:164-167 —
    BASELINE.md band >= 0.85)."""
    idx, queries, corpus = _index(spark, sf_dir, "cosine")
    qrows = queries.select("query_id", "qvec").collect()
    pred = lsh_search(idx, queries, metric="cosine", k=10, qrows=qrows)
    truth = exact_knn_join(queries, corpus, metric="cosine", k=10, qrows=qrows)
    return distance_based_precision_recall(pred, truth, epsilon=0.05)


@register("lsh_bucket_profile")
def lsh_bucket_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucket-size distribution per tree — the observability view of the
    (tree, hash, id) store (reference KVStore, store/kv/store.go:16-101).

    ``n_oversize`` surfaces buckets above 8 x k_min_vecs — natural
    buckets stay under 2 x k_min_vecs, so any hit flags an
    unsplittable duplicate-heavy/low-entropy region whose search
    fan-in the hot-bucket bound (lsh/search.py bound_hot_buckets)
    would thin; ``sum_sz`` must equal the corpus size in every tree
    (each vector lands in exactly one bucket per tree) — the invariant
    the oracle-checked ``lsh_bucket_invariant`` pins."""
    idx, _, _ = _index(spark, sf_dir, "l2")
    oversize = 8 * idx.config.k_min_vecs
    sizes = idx.bucket_stats()
    return sizes.groupBy("tree").agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.min("sz").alias("min_sz"),
        F.max("sz").alias("max_sz"),
        F.avg("sz").alias("avg_sz"),
        F.sum("sz").alias("sum_sz"),
        F.sum((F.col("sz") > oversize).cast("long")).alias("n_oversize"),
    )


@register(
    "lsh_bucket_invariant",
    oracle="""
    SELECT t.tree,
           (SELECT count(*) FROM embeddings WHERE vec_id % 50 <> 0) AS sum_sz
    FROM (SELECT unnest(range(40)) AS tree) t
    ORDER BY tree
    """,
)
def lsh_bucket_invariant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Machine-checked store invariant with a REAL oracle despite the
    randomized bucket structure: every corpus vector lands in exactly
    one bucket per tree (reference Train writes one SetHash per tree
    per vector, lsh/lsh.go:117-127), so per-tree total bucket mass ==
    corpus row count — a quantity DuckDB derives from the
    embeddings_split convention (vec_id % 50 != 0) without knowing the
    trees."""
    idx, _, _ = _index(spark, sf_dir, "l2")
    return (
        idx.bucket_stats()
        .groupBy("tree")
        .agg(F.sum("sz").alias("sum_sz"))
        .select(F.col("tree").cast("long").alias("tree"), "sum_sz")
    )


@register("dedup_embedding_lsh")
def dedup_embedding_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs AT SCALE: the bucketed LSH
    similarity self-join that ``dedup_embedding_cosine`` (the bounded
    all-pairs oracle path, queries_text.py) defers to.

    Shape: hash every embedding into a seeded angular forest, self-join
    the (tree, hash) bucket store (only vectors sharing a bucket ever
    meet — never all-pairs), dedup candidate pairs, then verify with the
    EXACT cosine distance and keep pairs <= the same 0.6 threshold the
    all-pairs query uses. Candidate cost is sum(bucket^2) per tree, the
    quantity lsh_bucket_profile watches; at 100 TB the bucket join
    co-partitions on (tree, hash) and the corpus never shuffles.

    Registered rows-only: bucket traversal is not SQL-expressible. The
    LSH-vs-exact pair recall is gated in
    tests/test_lsh_e2e.py::test_dedup_embedding_lsh_recall instead."""
    from vector_search_go_spark.operators.argmin import pairwise_dist_udf

    emb = read_parquet_cached(spark, f"{sf_dir}/embeddings.parquet").select(
        F.col("vec_id").alias("id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("vec"),
    )
    import os

    from vector_search_go_spark.operators import model_store

    # 32 trees: the 0.6 cosine threshold admits only-weakly-similar
    # pairs (66 degrees apart), which few random hyperplane trees agree
    # on — 8 trees measured 0.6 pair-recall vs the exact path, 32 trees
    # 1.0 (test_dedup_embedding_lsh_recall). Config is part of the
    # model key so retuning can never load a stale forest.
    cfg = LshConfig(dims=64, n_trees=32, k_min_vecs=50, seed=23, is_angular=True)
    path = model_store.store_path(
        f"lsh_dedup_index_angular_t{cfg.n_trees}k{cfg.k_min_vecs}s{cfg.seed}",
        sf_dir,
    )
    if os.path.exists(os.path.join(path, "buckets", "_SUCCESS")):
        idx = LshIndex.load(spark, path)
    else:
        idx = LshIndex.train(spark, emb, cfg)
        idx.save(path)
    b = idx.buckets
    # Hot-bucket bound (reference analog: MaxCandidates scan truncation,
    # lsh/lsh.go:143,162). The self-join cost is sum(bucket^2) per tree,
    # and k_min_vecs bounds bucket MINIMUM size only — a duplicate-heavy
    # or low-entropy corpus (exactly what dedup inputs look like) leaves
    # unsplittable giant buckets. Buckets above _DEDUP_BUCKET_CAP
    # contribute sorted-neighborhood CHAIN pairs (hot_bucket_chain_pairs
    # above) instead of all pairs: linear in bucket size, deterministic,
    # and duplicate clusters stay connected for the connected-components
    # consumer (dedup_cluster_groups) no matter which ids share the
    # bucket. The trade (pair-level completeness inside pathological
    # buckets) mirrors the reference's truncation trade. Gates:
    # tests/test_lsh_e2e.py::test_dedup_embedding_lsh_recall (pair
    # recall 1.0 on normal data — no natural bucket nears the cap),
    # test_hot_bucket_bound (adversarial corpus: bounded candidates,
    # cluster fully connected) and test_hot_bucket_chain_connectivity
    # (crafted bucket: two clusters + foreign min-id member).
    hot = idx.bucket_stats().filter(F.col("sz") > _DEDUP_BUCKET_CAP).select(
        "tree", "hash"
    )
    small = b.join(F.broadcast(hot), on=["tree", "hash"], how="left_anti")
    pairs = (
        small.select("tree", "hash", F.col("id").alias("id_a"))
        .join(
            small.select("tree", "hash", F.col("id").alias("id_b")),
            on=["tree", "hash"],
        )
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
    )
    hot_members = b.join(F.broadcast(hot), on=["tree", "hash"]).join(emb, on="id")
    chain = hot_bucket_chain_pairs(hot_members, dims=cfg.dims, seed=cfg.seed)
    cand = pairs.union(chain).dropDuplicates(["id_a", "id_b"])
    va = emb.select(F.col("id").alias("id_a"), F.col("vec").alias("va"))
    vb = emb.select(F.col("id").alias("id_b"), F.col("vec").alias("vb"))
    cos = pairwise_dist_udf("cosine")(F.col("va"), F.col("vb"))
    return (
        cand.join(va, on="id_a")
        .join(vb, on="id_b")
        .withColumn("cos_dist", cos)
        .filter(F.col("cos_dist") <= 0.6)
        .select("id_a", "id_b", "cos_dist")
    )


@register(
    "lsh_model_hashes",
    oracle="SELECT CAST(0 AS BIGINT) AS n_mismatched_bucket_rows",
)
def lsh_model_hashes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Serialization round-trip probe: hash the corpus, save/load the
    model as JSON (reference DumpHasher/LoadHasher, lsh/lsh.go:200-207),
    re-hash, return the count of bucket rows whose hashes disagree.
    The oracle pins the invariant itself — the roundtrip must produce
    ZERO mismatches — so the driver's hash compare IS the
    serialization-fidelity check (VERDICT r3 item 5 pattern)."""
    from vector_search_go_spark.lsh.hasher import Forest

    idx, _, corpus = _index(spark, sf_dir, "l2")
    reloaded = Forest.from_json(idx.forest.to_json())
    b2 = LshIndex._bucketize(spark, corpus, reloaded)
    diff = idx.buckets.exceptAll(b2).union(b2.exceptAll(idx.buckets))
    return diff.agg(F.count(F.lit(1)).alias("n_mismatched_bucket_rows"))


@register("ann_advisor_auto_train")
def ann_advisor_auto_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The advisor wired into the facade (VERDICT r4 item 4):
    ``VectorSearchEngine.train(df, auto=True)`` measures
    scan/LSH/IVF on a bounded seeded probe (operators.tune
    advisor_report) and trains the winner; this query exposes the
    resulting decision — chosen family/config, its measured
    (eps_recall, cand_frac), and the backend the engine actually
    trained. Rows-only: the decision derives from index traversal, not
    SQL; determinism comes from seeded probes and the lexicographic
    recommendation tie-break (pinned in EXPECTED_HASHES)."""
    from vector_search_go_spark.engine import VectorSearchEngine
    from vector_search_go_spark.operators.exact_knn import embeddings_split

    _, corpus = embeddings_split(spark, sf_dir)
    eng = VectorSearchEngine(spark, metric="cosine", backend="lsh")
    # probe at the workload MaxDist ann_index_advisor uses (0.6): on
    # concentrated angular corpora an un-thresholded eps-recall is
    # trivially in-band and cannot rank index families
    eng.train(corpus, auto=True, probe_threshold=0.6)
    d = eng.advisor_decision
    return spark.createDataFrame(
        [
            (
                d["family"],
                d["config"],
                round(d["eps_recall"], 4),
                round(d["cand_frac"], 4),
                eng.backend,
            )
        ],
        "family string, config string, eps_recall double, "
        "cand_frac double, backend string",
    )


@register("ann_index_advisor")
def ann_index_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measured scan-vs-LSH-vs-IVF recommendation (operators.tune
    advisor_report): one row per candidate config with its ε-recall vs
    the exact oracle and its candidate fraction; ``recommended`` marks
    the cheapest in-band config, with the exact scan always available
    as the fraction-1.0 fallback. The reference hardcodes this
    judgment per dataset (annbench_test.go:215-260); the SCALE.md
    angular probes showed it must be measured (near-uniform corpora
    admit NO pruning index). Registered rows-only: bucket/cell
    traversal is not SQL-expressible; determinism (seeded forests,
    first-k k-means init, lexicographic tie-break on the
    recommendation) is pinned by the cross-session hash in
    EXPECTED_HASHES and gated in tests/test_tune.py."""
    from vector_search_go_spark.operators.exact_knn import embeddings_split
    from vector_search_go_spark.operators.tune import advisor_report

    queries, corpus = embeddings_split(spark, sf_dir)
    return advisor_report(
        spark,
        corpus,
        queries,
        metric="cosine",
        k=10,
        threshold=0.6,
        recall_band=0.85,
        lsh_configs=((8, 50), (32, 50)),
        ivf_configs=((16, 2), (16, 4)),
        seed=23,
    ).orderBy("family", "config")


# ---------------------------------------------------------------------------
# Driver-checkable verdict entries (VERDICT r5 item 1).
#
# The raw LSH entries above (lsh_knn_*, lsh_recall_*, lsh_bucket_profile,
# dedup_embedding_lsh, ann_index_advisor, ann_advisor_auto_train) emit
# bucket-traversal-dependent values no fixed SQL can reproduce, so for four
# rounds they sat in the driver window as `err:"no_oracle"` rows-only checks.
# These sibling entries run the SAME pipelines and reduce them to
# SQL-decidable verdicts — counts DuckDB derives independently, invariants
# whose violation count must be zero, and bands the reference itself
# publishes (BASELINE.md) — following the two patterns already driver-green
# in-repo: invariant verdicts (lsh_model_hashes, lsh_bucket_invariant) and
# band verdicts (approx_aggregates, queries_relational.py percentile bands).
# The raw entries stay registered (bench.py headlines, EXPECTED_HASHES pins)
# below the 50-slot window; these take their priority slots so every window
# entry carries a full oracle verdict.
# ---------------------------------------------------------------------------


def _knn_verdict(
    pred: DataFrame, queries: DataFrame, corpus: DataFrame, metric: str, k: int
) -> DataFrame:
    """Reduce a (query_id, id, dist, rn) ANN result to three invariant
    violation counts, each zero for a correct search (reference Search
    semantics, lsh/lsh.go:137-197):

      n_dist_mismatch   — returned dist != the metric recomputed from the
                          (qvec, vec) pair with the Catalyst fold
                          (functions.metrics.metric_dist). Exact equality,
                          not a tolerance: the Arrow scorer and the fold
                          use the same sequential IEEE adds (parity pinned
                          by tests/test_argmin_parity.py).
      n_bad_rowcount    — queries whose result set is not exactly k rows
                          (k_min_vecs=100 buckets guarantee >= k
                          candidates per probe at these corpora), plus
                          queries missing from the result entirely.
      n_rank_violations — rows whose rn disagrees with row_number over
                          (dist, id) — the deterministic heap-pop order
                          (lsh.go:192-196).
    """
    from pyspark.sql import Window

    from vector_search_go_spark.functions.metrics import metric_dist

    # pred is k x |queries| rows (hundreds); broadcast it into the
    # corpus join so the verification never shuffles the corpus —
    # Catalyst can't estimate pred's size through the window+UDF
    # lineage and would fall back to a sort-merge join (plan-audited
    # in PLANS.md)
    joined = F.broadcast(
        pred.join(F.broadcast(queries.select("query_id", "qvec")), "query_id")
    ).join(corpus.select("id", "vec"), "id")
    n_mismatch = joined.select(
        (F.col("dist") != metric_dist(metric, F.col("qvec"), F.col("vec")))
        .cast("long")
        .alias("m")
    ).agg(F.coalesce(F.sum("m"), F.lit(0)).alias("n_dist_mismatch"))

    per_q = pred.groupBy("query_id").agg(F.count(F.lit(1)).alias("n"))
    bad = (
        queries.select("query_id")
        .join(F.broadcast(per_q), "query_id", "left")
        .select(
            (F.coalesce("n", F.lit(0)) != k).cast("long").alias("b")
        )
        .agg(F.coalesce(F.sum("b"), F.lit(0)).alias("n_bad_rowcount"))
    )

    w = Window.partitionBy("query_id").orderBy("dist", "id")
    rank = pred.select(
        (F.col("rn") != F.row_number().over(w)).cast("long").alias("v")
    ).agg(F.coalesce(F.sum("v"), F.lit(0)).alias("n_rank_violations"))

    return n_mismatch.crossJoin(bad).crossJoin(rank)


_KNN_VERDICT_ORACLE = """
SELECT CAST(0 AS BIGINT) AS n_dist_mismatch,
       CAST(0 AS BIGINT) AS n_bad_rowcount,
       CAST(0 AS BIGINT) AS n_rank_violations
"""


@register("lsh_knn_l2_verdict", oracle=_KNN_VERDICT_ORACLE)
def lsh_knn_l2_verdict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full train+search L2 pipeline (lsh_knn_l2's exact plan), reduced
    to the zero-violation verdict the oracle pins."""
    idx, queries, corpus = _index(spark, sf_dir, "l2")
    pred = lsh_search(idx, queries, metric="l2", k=10)
    return _knn_verdict(pred, queries, corpus, "l2", k=10)


@register("lsh_knn_cosine_verdict", oracle=_KNN_VERDICT_ORACLE)
def lsh_knn_cosine_verdict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Angular-metric twin of lsh_knn_l2_verdict (normalized hashing,
    reference hasher.go:198-205)."""
    idx, queries, corpus = _index(spark, sf_dir, "cosine")
    pred = lsh_search(idx, queries, metric="cosine", k=10)
    return _knn_verdict(pred, queries, corpus, "cosine", k=10)


def _recall_band(
    spark: SparkSession, sf_dir: str, metric: str, band: float
) -> DataFrame:
    """Epsilon-recall of LSH vs the exact oracle, emitted as a band
    verdict: n_queries (DuckDB re-derives it from the embeddings_split
    convention) + precision/recall >= the reference's published band
    (BASELINE.md: >=0.93 Euclidean, >=0.85 angular; measured here:
    1.0/1.0 at sf0.01, 0.995/0.995 at sf0.1 on both metrics)."""
    idx, queries, corpus = _index(spark, sf_dir, metric)
    # shared query-batch collect (r12) — see lsh_recall_l2
    qrows = queries.select("query_id", "qvec").collect()
    pred = lsh_search(idx, queries, metric=metric, k=10, qrows=qrows)
    truth = exact_knn_join(queries, corpus, metric=metric, k=10, qrows=qrows)
    pr = distance_based_precision_recall(pred, truth, epsilon=0.05)
    return pr.agg(
        F.count(F.lit(1)).alias("n_queries"),
        (F.avg("precision") >= F.lit(band)).alias("precision_in_band"),
        (F.avg("recall") >= F.lit(band)).alias("recall_in_band"),
    )


_RECALL_BAND_ORACLE = """
SELECT (SELECT count(*) FROM embeddings WHERE vec_id % 50 = 0) AS n_queries,
       TRUE AS precision_in_band,
       TRUE AS recall_in_band
"""


@register("lsh_recall_l2_band", oracle=_RECALL_BAND_ORACLE)
def lsh_recall_l2_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lsh_recall_l2's pipeline under the reference's Euclidean recall
    band (annbench_test.go precision/recall thresholds, BASELINE.md
    >=0.93). n_queries doubles as a completeness check: a query that
    drops out of the LSH result entirely shrinks the count and fails
    the row-count compare."""
    return _recall_band(spark, sf_dir, "l2", band=0.93)


@register("lsh_recall_cosine_band", oracle=_RECALL_BAND_ORACLE)
def lsh_recall_cosine_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lsh_recall_cosine's pipeline under the reference's angular band
    (BASELINE.md >=0.85 — the reference's own weak metric,
    README.md:164-167)."""
    return _recall_band(spark, sf_dir, "cosine", band=0.85)


@register(
    "lsh_bucket_profile_verdict",
    oracle="""
    SELECT t.tree,
           (SELECT count(*) FROM embeddings WHERE vec_id % 50 <> 0) AS sum_sz,
           TRUE AS partitions_ok,
           CAST(0 AS BIGINT) AS n_oversize
    FROM (SELECT unnest(range(40)) AS tree) t
    ORDER BY tree
    """,
)
def lsh_bucket_profile_verdict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lsh_bucket_profile's per-tree store scan, banded: per tree,
    total bucket mass == corpus count (every vector lands in exactly
    one bucket per tree, lsh.go:117-127 — the lsh_bucket_invariant
    check, kept per-row here), the tree genuinely partitions the
    corpus (>= 2 nonempty buckets: the root plane passes through the
    midpoint of two sample points, so both sides are nonempty whenever
    n > 1 — random_plane, hasher.go:94-117), and zero oversize buckets
    (> 8 x k_min_vecs) on this corpus. NOTE a child bucket may be
    SMALLER than k_min_vecs — the reference grows children whenever a
    side exceeds KMinVecs and the resulting halves can be any size
    (hasher.go:153-160) — so no per-bucket minimum is pinned."""
    idx, _, _ = _index(spark, sf_dir, "l2")
    kmin = idx.config.k_min_vecs
    return (
        idx.bucket_stats()
        .groupBy("tree")
        .agg(
            F.sum("sz").alias("sum_sz"),
            (F.count(F.lit(1)) >= 2).alias("partitions_ok"),
            F.sum((F.col("sz") > 8 * kmin).cast("long")).alias("n_oversize"),
        )
        .select(F.col("tree").cast("long").alias("tree"), "sum_sz",
                "partitions_ok", "n_oversize")
    )


@register(
    "dedup_embedding_lsh_verdict",
    oracle="""
WITH n AS (
  SELECT vec_id,
         sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
              list_transform(embedding, _x -> CAST(_x AS DOUBLE) * CAST(_x AS DOUBLE))),
              (_a, _b) -> _a + _b)) AS nrm,
         embedding
  FROM embeddings WHERE vec_id < 200
)
SELECT count(*) AS n_exact_pairs,
       CAST(0 AS BIGINT) AS n_missed,
       CAST(0 AS BIGINT) AS n_false
FROM n a JOIN n b ON a.vec_id < b.vec_id
WHERE 1 - list_reduce(list_prepend(CAST(0 AS DOUBLE),
            list_transform(list_zip(a.embedding, b.embedding),
                           _t -> CAST(_t[1] AS DOUBLE) * CAST(_t[2] AS DOUBLE))),
            (_x, _y) -> _x + _y) / (a.nrm * b.nrm) <= 0.6
""",
)
def dedup_embedding_lsh_verdict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pair-completeness verdict for the bucketed LSH dedup self-join:
    DuckDB counts the TRUE near-dup pairs (exact all-pairs cosine <=
    0.6) inside the bounded vec_id < 200 region — the same bound
    dedup_embedding_cosine uses — and the verdict pins that the LSH
    path (which runs over the FULL corpus; only the scoring is
    regioned) missed none of them and produced no pair outside the
    threshold. n_false == 0 is structural (every LSH candidate is
    re-verified with the exact distance before emission); n_missed ==
    0 is the measured 1.0 pair recall of the 32-tree forest
    (tests/test_lsh_e2e.py::test_dedup_embedding_lsh_recall), now
    driver-checked."""
    region = F.col("id_a") < 200
    lsh_pairs = (
        dedup_embedding_lsh(spark, sf_dir)
        .filter(region & (F.col("id_b") < 200))
        .select("id_a", "id_b")
    )
    from vector_search_go_spark.queries_text import dedup_embedding_cosine

    exact_pairs = dedup_embedding_cosine(spark, sf_dir).select("id_a", "id_b")
    n_exact = exact_pairs.agg(F.count(F.lit(1)).alias("n_exact_pairs"))
    # both sides are region-bounded pair lists (tens of rows), but the
    # LSH side's size is unknowable through the bucket-join lineage —
    # broadcast the anti-join right sides explicitly or Catalyst
    # sort-merge-joins them (plan-audited)
    n_missed = (
        exact_pairs.join(F.broadcast(lsh_pairs), ["id_a", "id_b"], "left_anti")
        .agg(F.count(F.lit(1)).alias("n_missed"))
    )
    n_false = (
        lsh_pairs.join(F.broadcast(exact_pairs), ["id_a", "id_b"], "left_anti")
        .agg(F.count(F.lit(1)).alias("n_false"))
    )
    return n_exact.crossJoin(n_missed).crossJoin(n_false)


@register(
    "ann_index_advisor_verdict",
    oracle="""
    SELECT CAST(5 AS BIGINT) AS n_configs,
           CAST(1 AS BIGINT) AS n_recommended,
           TRUE AS scan_present,
           TRUE AS recommended_in_band,
           TRUE AS recalls_valid,
           TRUE AS fracs_valid
    """,
)
def ann_index_advisor_verdict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ann_index_advisor's report (same probe, configs, and seed),
    reduced to its structural contract: exactly the 5 requested
    configs, exactly one recommendation, the exact-scan fallback row
    present at (recall 1.0, fraction 1.0), the recommended row inside
    the recall band, and every measured quantity in its unit range.
    The report VALUES stay pinned by EXPECTED_HASHES + test_tune; this
    entry makes the decision procedure itself driver-checkable."""
    from vector_search_go_spark.operators.tune import advisor_report

    queries, corpus = embeddings_split(spark, sf_dir)
    rep = advisor_report(
        spark,
        corpus,
        queries,
        metric="cosine",
        k=10,
        threshold=0.6,
        recall_band=0.85,
        lsh_configs=((8, 50), (32, 50)),
        ivf_configs=((16, 2), (16, 4)),
        seed=23,
    )
    scan_row = (
        (F.col("family") == "exact")
        & (F.col("config") == "scan")
        & (F.col("eps_recall") == 1.0)
        & (F.col("cand_frac") == 1.0)
    )
    return rep.agg(
        F.count(F.lit(1)).alias("n_configs"),
        F.sum(F.col("recommended").cast("long")).alias("n_recommended"),
        (F.max(scan_row.cast("int")) == 1).alias("scan_present"),
        (
            F.sum((F.col("recommended") & ~F.col("in_band")).cast("int")) == 0
        ).alias("recommended_in_band"),
        (
            F.sum(
                ((F.col("eps_recall") < 0) | (F.col("eps_recall") > 1)).cast("int")
            )
            == 0
        ).alias("recalls_valid"),
        (
            F.sum(
                ((F.col("cand_frac") <= 0) | (F.col("cand_frac") > 1)).cast("int")
            )
            == 0
        ).alias("fracs_valid"),
    )


@register(
    "ann_advisor_auto_train_verdict",
    oracle="""
    SELECT TRUE AS family_valid,
           TRUE AS backend_matches,
           TRUE AS recall_valid,
           TRUE AS frac_valid,
           TRUE AS gate_ok
    """,
)
def ann_advisor_auto_train_verdict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The facade's measured auto-train decision
    (VectorSearchEngine.train(auto=True), ann_advisor_auto_train's
    exact call), reduced to its contract: the chosen family is one of
    the three the advisor ranks, the engine actually trained the
    backend the decision names, the measured (eps_recall, cand_frac)
    pair sits in unit range, and the break-even gate held — an indexed
    family was only chosen at cand_frac <= the facade's 0.33
    max_useful_frac (SCALE.md GloVe row rationale; engine.py train)."""
    from vector_search_go_spark.engine import VectorSearchEngine

    _, corpus = embeddings_split(spark, sf_dir)
    eng = VectorSearchEngine(spark, metric="cosine", backend="lsh")
    eng.train(corpus, auto=True, probe_threshold=0.6)
    d = eng.advisor_decision
    family_backend = {"exact": "exact", "lsh": "lsh", "ivf": "ivf"}
    return spark.createDataFrame(
        [
            (
                d["family"] in family_backend,
                family_backend.get(d["family"]) == eng.backend,
                0.0 <= d["eps_recall"] <= 1.0,
                0.0 < d["cand_frac"] <= 1.0,
                d["family"] == "exact" or d["cand_frac"] <= 0.33,
            )
        ],
        "family_valid boolean, backend_matches boolean, recall_valid boolean, "
        "frac_valid boolean, gate_ok boolean",
    )


@register(
    "serving_sharded_scan_knn",
    oracle="""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qvec
  FROM embeddings WHERE vec_id % 50 = 0
), c AS (
  SELECT vec_id AS id, embedding AS vec
  FROM embeddings WHERE vec_id % 50 <> 0
), d AS (
  SELECT query_id, id,
         sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
              list_transform(list_zip(vec, qvec),
                _t -> (CAST(_t[1] AS DOUBLE) - CAST(_t[2] AS DOUBLE))
                    * (CAST(_t[1] AS DOUBLE) - CAST(_t[2] AS DOUBLE)))),
              (_a, _b) -> _a + _b)) AS dist
  FROM c CROSS JOIN q
), r AS (
  SELECT query_id, id, dist,
         row_number() OVER (PARTITION BY query_id ORDER BY dist, id) AS rn
  FROM d
)
SELECT query_id, id, dist, CAST(rn AS INT) AS rn FROM r WHERE rn <= 10
""",
)
def serving_sharded_scan_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The round-6 sharded serving tier under the driver's VALUE check:
    exact k=10 L2 KNN answered ENTIRELY by the driver-side shard router
    — scan_save(shards=3) writes three id-hash shard stores,
    ShardedReader fans each query across three LocalScanReaders and
    merges per-shard top-k (serve/sharded.py) — then compared
    bit-exactly against DuckDB's own cross-join KNN. A hash match
    certifies the whole serving stack at once: the shard split loses no
    rows, the per-shard two-stage scorer reproduces the sequential-IEEE
    fold (the TWO_STAGE_MARGIN proof), and the selection-monotone merge
    with the (dist, id) tie-break equals the global top-k. The
    query-side collect is the serving API's own shape (tens of rows).
    Reference anchor: NNMock full-scan Search (annbench.go:56-125) +
    the Store pluggability this composes over (store/store.go:12-18)."""
    import os

    from vector_search_go_spark.operators import model_store
    from vector_search_go_spark.operators.exact_knn import scan_save
    from vector_search_go_spark.serve.sharded import ShardedReader

    queries, corpus = embeddings_split(spark, sf_dir)
    path = model_store.store_path("scan_sharded3_l2", sf_dir)
    if not os.path.exists(os.path.join(path, "shards_meta")):
        scan_save(spark, corpus, path, metric="l2", shards=3)
    reader = ShardedReader(path)
    try:
        qrows = sorted(queries.collect(), key=lambda r: r["query_id"])
        pdf = reader.search_many(
            [list(r["qvec"]) for r in qrows],
            k=10,
            query_ids=[int(r["query_id"]) for r in qrows],
        )
    finally:
        reader.close()
    return spark.createDataFrame(
        [
            (int(q), int(i), float(d), int(rn))
            for q, i, d, rn in zip(pdf["query_id"], pdf["id"], pdf["dist"], pdf["rn"])
        ],
        "query_id bigint, id bigint, dist double, rn int",
    )


@register(
    "store_tombstone_knn",
    oracle="""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qvec
  FROM embeddings WHERE vec_id % 50 = 0
), c AS (
  SELECT vec_id AS id, embedding AS vec
  FROM embeddings WHERE vec_id % 50 <> 0 AND vec_id % 7 <> 1
), d AS (
  SELECT query_id, id,
         sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
              list_transform(list_zip(vec, qvec),
                _t -> (CAST(_t[1] AS DOUBLE) - CAST(_t[2] AS DOUBLE))
                    * (CAST(_t[1] AS DOUBLE) - CAST(_t[2] AS DOUBLE)))),
              (_a, _b) -> _a + _b)) AS dist
  FROM c CROSS JOIN q
), r AS (
  SELECT query_id, id, dist,
         row_number() OVER (PARTITION BY query_id ORDER BY dist, id) AS rn
  FROM d
)
SELECT query_id, id, dist, CAST(rn AS INT) AS rn FROM r WHERE rn <= 10
""",
)
def store_tombstone_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tombstone deletes under the driver's VALUE check (r8, VERDICT r7
    missing item 2): a 3-shard scan store takes delete_ids for every
    corpus id with id % 97 == 3 (routed per shard by the layout's own
    id-hash rule), then the shard router serves exact k=10 L2 KNN over
    what remains — compared bit-exactly against DuckDB computing the
    same KNN over the corpus MINUS the deleted ids. A hash match
    certifies the whole delete path at once: delete_ids routed every id
    to its owning shard, every shard reader masked its tombstones
    before scoring, and no live row was lost or reordered by the merge.
    Idempotent across runs: the tombstones are written once next to the
    cached store (delete is append-only; re-running re-reads them).
    Reference anchor: store.Clear (store/store.go:17) is whole-store —
    this is the row-level erasure its pipeline framing demands."""
    import os

    from vector_search_go_spark.operators import model_store
    from vector_search_go_spark.operators.exact_knn import scan_save
    from vector_search_go_spark.serve.sharded import ShardedReader
    from vector_search_go_spark.streaming.delete import delete_ids

    queries, corpus = embeddings_split(spark, sf_dir)
    path = model_store.store_path("scan_sharded3_l2_tomb", sf_dir)
    if not os.path.exists(os.path.join(path, "shards_meta")):
        scan_save(spark, corpus, path, metric="l2", shards=3)
    if not any(
        os.path.exists(os.path.join(path, f"shard={k}", "tombstones"))
        for k in range(3)
    ):
        delete_ids(spark, path, corpus.filter(F.col("id") % 7 == 1).select("id"))
    reader = ShardedReader(path)
    try:
        qrows = sorted(queries.collect(), key=lambda r: r["query_id"])
        pdf = reader.search_many(
            [list(r["qvec"]) for r in qrows],
            k=10,
            query_ids=[int(r["query_id"]) for r in qrows],
        )
    finally:
        reader.close()
    return spark.createDataFrame(
        [
            (int(q), int(i), float(d), int(rn))
            for q, i, d, rn in zip(pdf["query_id"], pdf["id"], pdf["dist"], pdf["rn"])
        ],
        "query_id bigint, id bigint, dist double, rn int",
    )
