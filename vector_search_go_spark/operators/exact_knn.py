"""Exact (brute-force) nearest-neighbor search.

Parity target: the reference's ``NNMock`` exact-NN oracle
(annbench/annbench.go:56-125) — full scan, distance to every stored
vector, optional distance threshold, top-k by ascending distance. Same
``Indexer`` role as the LSH index (lsh/lsh.go:54-57).

Spark shape: the corpus streams past the in-memory query set exactly
once (no corpus shuffle — the optimal exact-KNN plan at any scale),
then WindowGroupLimit top-k. Default distance kernel is an
Arrow-batched numpy matrix per corpus batch (mapInPandas, query matrix
in the closure); ``impl='expr'`` keeps the pure-Catalyst broadcast
cross join + fold expression as the bit-identical oracle reference.

At 100 TB this is the ground-truth/oracle path by design — the production
ANN path is ``vector_search_go_spark.lsh`` (SURVEY.md section 7 Phase 1).
"""

from __future__ import annotations

import numpy as np
import pandas as pd  # noqa: F401 — module scope so pandas_udf signatures
# survive postponed annotation evaluation
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_search_go_spark.config import TOL
from vector_search_go_spark.functions.metrics import dot, l2_norm, metric_dist
from vector_search_go_spark.io import read_parquet_cached
from vector_search_go_spark.operators.topk import topk_per_group


def exact_knn_join(
    queries: DataFrame,
    corpus: DataFrame,
    metric: str = "l2",
    k: int = 10,
    threshold: float | None = None,
    impl: str = "arrow",
    qrows: list | None = None,
) -> DataFrame:
    """queries(query_id, qvec) x corpus(id, vec) -> (query_id, id, dist, rn).

    ``qrows``: a pre-collected (query_id, qvec) row list for the arrow
    impl — callers that already materialized the query batch (the
    recall-vs-exact entries share one collect between the pred chain
    and this truth chain) pass it to skip the per-invocation collect
    job. Must hold exactly the rows ``queries`` would produce.

    ``threshold`` mirrors the reference's ``distanceThrsh`` filter
    (lsh/lsh.go:177); None means no thresholding.

    ``impl='expr'``: broadcast cross join + native fold distance — the
    pure-Catalyst oracle reference. For cosine, norms are precomputed
    once per row on each side — one fold per pair instead of three
    (bit-identical: same folds, same vectors).

    ``impl='arrow'`` (default): ``mapInPandas`` over corpus batches
    with the query matrix in the closure (queries are the
    broadcast-small side by contract — collecting them driver-side is
    the same bound as the broadcast). Each batch emits only its LOCAL
    exact top-k rows per query: top-k under the global (dist, id)
    order is selection-monotone across any partition of the corpus, so
    the global winners are exactly the winners of the per-batch
    winners, and the threshold filter only ever removes a suffix of
    that order — |batch| x k rows cross the shuffle instead of
    |batch| x |queries| pairs. Inside a batch the local top-k is found
    two-stage: a BLAS approximate pass bounds the per-query k-th
    distance, the SEQUENTIAL per-dimension kernels (operators.argmin —
    the exact IEEE order of the fold) rescore everything within a
    provable margin, and emitted distances are always the exact
    values (parity pinned by the knn oracle hashes and
    tests/test_argmin_parity.py).
    """
    from vector_search_go_spark.io import ensure_parallelism

    corpus = ensure_parallelism(corpus)
    if impl == "arrow":
        return _exact_knn_arrow(queries, corpus, metric, k, threshold, qrows=qrows)
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


def exact_local_topk_kernel(qrows, metric: str, k: int):
    """Per-batch exact-KNN local top-k as a reusable closure:
    ``fn(V, ids_b) -> (q_arr, i_arr, d_arr)`` with the EXACT logic of
    ``_exact_knn_arrow``'s batch loop (two-stage BLAS bound +
    sequential-IEEE rescore above 65,536 pairs, full sequential matrix
    below). Factored out so fused pred+truth kernels (the
    ``*_recall_vs_exact`` entries share one corpus scan between the ANN
    chain and this truth chain — guide §8.4) run the bit-identical
    code path. ``qrows`` must be the sorted (query_id, qvec) batch."""
    from vector_search_go_spark.operators.argmin import _seq_cosine, _seq_sq_l2

    qids = np.array([r["query_id"] for r in qrows], dtype=np.int64)
    Q = np.array([list(r["qvec"]) for r in qrows], dtype=np.float64)
    is_cos = metric in ("cosine", "angular")
    q2 = np.einsum("ij,ij->i", Q, Q)
    nq = np.sqrt(q2)
    # margin for the approximate stage (same bound as the serving
    # reader's two-stage scorer, serve/local_reader.py): BLAS distance
    # error is ~1e-7 x scale worst-case, selection within margin of the
    # per-query k-th approximate distance provably contains the exact
    # (dist, id) top-k
    MARGIN = 1e-4

    def _emit(ids_b, sel_rows, sel_cols, dist_sel, kk):
        # exact local top-kk per query among the rescored (row, col)
        # pairs — (dist, id) lexicographic, the global order
        out_q, out_i, out_d = [], [], []
        for j in np.unique(sel_cols):
            mask = sel_cols == j
            d, rid = dist_sel[mask], ids_b[sel_rows[mask]]
            take = np.lexsort((rid, d))[:kk]
            out_q.append(np.full(len(take), qids[j], dtype=np.int64))
            out_i.append(rid[take])
            out_d.append(d[take])
        return (
            np.concatenate(out_q),
            np.concatenate(out_i),
            np.concatenate(out_d),
        )

    def _seq_pair(V, rows, cols):
        # sequential-IEEE distances of the selected (corpus row, query)
        # pairs only — identical per-pair arithmetic to the full-matrix
        # kernels (operand broadcast order preserved)
        A, B = V[rows], Q[cols]
        if not is_cos:
            s = np.zeros(len(A))
            for d in range(A.shape[1]):
                diff = A[:, d] - B[:, d]
                s += diff * diff
            return np.sqrt(s)
        na = np.zeros(len(A))
        for d in range(A.shape[1]):
            na += A[:, d] * A[:, d]
        na = np.sqrt(na)
        nb = nq[cols]
        dot = np.zeros(len(A))
        for d in range(A.shape[1]):
            dot += A[:, d] * B[:, d]
        raw = 1.0 - dot / (na * nb)
        out = np.where(raw < 1e-6, 0.0, raw)
        return np.where((na <= 1e-6) | (nb <= 1e-6), 1.0, out)

    def batch_fn(V, ids_b):
        n_v, n_q = len(V), len(Q)
        kk = min(k, n_v)
        if n_v * n_q <= 65536:
            # small block: the full sequential matrix is cheaper
            # than two stages
            D = _seq_cosine(V, Q) if is_cos else np.sqrt(_seq_sq_l2(V, Q))
            rows, cols = np.nonzero(np.ones_like(D, dtype=bool))
            return _emit(ids_b, rows, cols, D[rows, cols], kk)
        n2 = np.einsum("ij,ij->i", V, V)
        G = V @ Q.T
        if is_cos:
            nv = np.sqrt(n2)
            with np.errstate(divide="ignore", invalid="ignore"):
                approx = 1.0 - G / (nv[:, None] * nq[None, :])
            approx = np.where(
                (nv[:, None] <= 1e-6) | (nq[None, :] <= 1e-6), 1.0, approx
            )
            m = MARGIN
        else:
            approx = np.sqrt(
                np.maximum(n2[:, None] - 2.0 * G + q2[None, :], 0.0)
            )
            m = MARGIN * max(
                1.0, float(np.sqrt(n2.max() + q2.max()))
            )
        cut = np.partition(approx, kk - 1, axis=0)[kk - 1] + m
        rows, cols = np.nonzero(approx <= cut[None, :])
        dist_sel = _seq_pair(V, rows, cols)
        return _emit(ids_b, rows, cols, dist_sel, kk)

    return batch_fn


def _exact_knn_arrow(
    queries: DataFrame,
    corpus: DataFrame,
    metric: str,
    k: int,
    threshold: float | None,
    qrows: list | None = None,
) -> DataFrame:
    if qrows is None:
        qrows = queries.select("query_id", "qvec").collect()
    qrows = sorted(qrows, key=lambda r: r["query_id"])
    if len(qrows) == 0:
        # empty query batch: Q is 1-D and every kernel slice below is
        # invalid — short-circuit to a well-formed empty result
        return queries.sparkSession.createDataFrame(
            [], "query_id long, id long, dist double, rn int"
        )
    batch_fn = exact_local_topk_kernel(qrows, metric, k)

    def gen(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.array(pdf["vec"].tolist(), dtype=np.float64)
            ids_b = pdf["id"].to_numpy()
            q_o, i_o, d_o = batch_fn(V, ids_b)
            yield pd.DataFrame({"query_id": q_o, "id": i_o, "dist": d_o})

    cand = corpus.mapInPandas(gen, "query_id long, id long, dist double")
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
    emb = read_parquet_cached(spark, f"{sf_dir}/embeddings.parquet")
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


def scan_save(
    spark: SparkSession,
    vectors: DataFrame,
    path: str,
    metric: str = "l2",
    shards: int | None = None,
) -> None:
    """Persist a corpus as a SCAN store — the serving layout for the
    backend the measured advisor picks when no index prunes (the
    SCALE.md angular probes; reference anchor: NNMock's full-scan
    Search, annbench/annbench.go:56-125). Layout: ``{path}/vectors``
    (id-sorted parquet, same shape as LshIndex.save's vector table) +
    ``{path}/store_meta`` recording family/metric/dims — the metric
    guard engine.load and serve.LocalScanReader enforce.

    There is deliberately NO model component: exact search cannot go
    stale, so maintain() on this layout is a no-op by construction.

    ``shards=N``: the sharded serving layout (serve.sharded) — each
    {path}/shard=K is a complete scan store of the id-subset
    pmod(xxhash64(id), N) == K. The scan is where sharding pays most:
    per-query work is O(shard), so N parallel readers hold ms/q flat
    as the corpus grows N-fold (the SCALE.md sharded row)."""
    import json as _json

    if shards is not None:
        from vector_search_go_spark.serve.sharded import (
            check_shard_population,
            shard_expr,
            write_shards_meta,
        )

        # pin the corpus once — the N per-shard writes below would
        # otherwise re-run its lineage N more times (the LshIndex.save
        # sharded-branch lesson)
        was_cached = vectors.is_cached
        if not was_cached:
            vectors = vectors.cache()
            vectors.count()
        try:
            check_shard_population(vectors, shards, "scan corpus")
            sh = shard_expr(shards)
            for k in range(shards):
                scan_save(
                    spark, vectors.filter(sh == k), f"{path}/shard={k}",
                    metric=metric,
                )
            write_shards_meta(spark, path, "scan", shards, metric=metric)
        finally:
            if not was_cached:
                vectors.unpersist()
        return

    vectors = vectors.select("id", "vec")
    first = vectors.select("vec").head()
    if first is None:
        raise ValueError("scan_save: corpus is empty — nothing to persist")
    dims = len(first["vec"])
    (
        # id-sorted, modest row groups: the local reader preloads the
        # whole table (a scan touches every row by definition), but
        # id-sorted order keeps the preloaded matrix gather-free and
        # lets any future id-pruned consumer skip row groups
        vectors.repartitionByRange(8, "id")
        .sortWithinPartitions("id")
        .write.mode("overwrite")
        .option("parquet.block.size", 512 << 10)
        .parquet(f"{path}/vectors")
    )
    spark.createDataFrame(
        [(_json.dumps({"family": "scan", "metric": metric, "dims": dims}),)],
        "meta_json string",
    ).coalesce(1).write.mode("overwrite").json(f"{path}/store_meta")
