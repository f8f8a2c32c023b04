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
    corpus: DataFrame, centroids: DataFrame, metric: str = "cosine",
    impl: str = "arrow",
) -> DataFrame:
    """corpus(id, vec) x centroids(cid, cvec) -> (id, vec, cell):
    nearest centroid per vector, (dist, cid) tie-break. Never shuffles
    or aggregates the corpus — a pure map stage either way.

    ``impl='expr'`` packs centroids into one broadcast array row with
    the argmin in a single projection (operators.argmin) — zero Python
    but interpreted higher-order lambdas. ``impl='arrow'`` (default) is
    the Arrow-batched numpy argmin with fold-order-identical distances
    (operators.argmin.argmin_id_arrow) — bit-identical output, ~30x at
    the 1M probe."""
    from vector_search_go_spark.io import ensure_parallelism

    if impl == "expr":
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

    from vector_search_go_spark.operators.argmin import argmin_id_arrow

    nearest = argmin_id_arrow(
        centroids, metric="l2" if metric == "l2" else "cosine"
    )
    return ensure_parallelism(corpus).select(
        "id", "vec", nearest(F.col("vec")).alias("cell")
    )


def probe_cells_local(qrows, cids, cmat, metric: str, nprobe: int):
    """Driver-side probe selection over the KB-sized centroid model:
    per query, the ``nprobe`` nearest cells under the exact
    (dist, cid) order the crossJoin + rank-window path produced — the
    same sequential-IEEE kernels (argmin._seq_sq_l2 / _seq_cosine), so
    the selected cell sets are bit-identical (parity pinned in
    tests/test_argmin_parity.py and the ivf/ivfpq oracle hashes).

    Probe selection is query-batch x centroids work (rows x KBs); the
    serving readers already do it driver-side (pq.ivfpq_point_search),
    and running it through the cluster cost a crossJoin + window
    shuffle + broadcast-build job per invocation (guide §8: decide with
    small rows, move heavy rows once). Returns a list of
    (query_row, [cell, ...]) pairs in input order."""
    import numpy as np

    from vector_search_go_spark.operators.argmin import (
        _seq_cosine,
        _seq_sq_l2,
    )

    if not qrows:
        return []
    Q = np.array([list(r["qvec"]) for r in qrows], dtype=np.float64)
    if metric == "l2":
        D = np.sqrt(_seq_sq_l2(Q, cmat))
    else:
        D = _seq_cosine(Q, cmat)
    cids = np.asarray(cids)
    out = []
    for i, r in enumerate(qrows):
        order = np.lexsort((cids, D[i]))[:nprobe]
        out.append((r, [int(cids[j]) for j in order]))
    return out


def ivf_scores_fused(
    corpus: DataFrame,
    centroids,
    cell_to_queries: dict,
    qrows: list,
    metric: str = "cosine",
    local_topk: int | None = None,
    truth_fn=None,
) -> DataFrame:
    """(query_id, id, dist) over the IVF candidate set with coarse
    assignment and candidate scoring FUSED into one Arrow stage over
    the corpus (guide §4.2) — replaces the assign_cells projection +
    broadcast(probes) join + broadcast(queries) join +
    pairwise_dist_udf chain, which crossed the Python boundary twice
    and built two broadcasts per invocation.

    Bit-identical piece by piece: assignment is argmin_id_arrow's
    first-min argmin over ascending cids in the same distance domain
    (sqrt'd L2 / cosine — tests/test_argmin_parity.py); candidate
    distances are the _seq_* mesh kernels, whose per-pair arithmetic
    is the pairwise_dist_udf fold with operand products commuted
    (IEEE-exact); ``local_topk`` is the exact per-batch (dist, id)
    truncation (selection-monotone for the downstream topk(k)).

    ``centroids`` = DataFrame or preloaded (cids, matrix);
    ``cell_to_queries`` maps cell id -> probing query ids
    (probe_cells_local's inverse); ``qrows`` the collected query batch.
    ``truth_fn`` (exact_knn.exact_local_topk_kernel): when given, each
    batch also emits exact-KNN local top-k rows from the SAME decoded
    V matrix with a ``_truth`` flag — the recall entry splits the
    chains behind one localCheckpoint (guide §8.4)."""
    import numpy as np
    import pandas as pd

    from vector_search_go_spark.operators.argmin import (
        _seq_cosine,
        _seq_sq_l2,
        collect_centroids,
        local_topk_flat,
    )

    spark = corpus.sparkSession
    out_schema = "query_id long, id long, dist double" + (
        ", _truth boolean" if truth_fn is not None else ""
    )
    if not qrows:
        return spark.createDataFrame([], out_schema)
    qrows = sorted(qrows, key=lambda r: r["query_id"])
    qpos = {int(r["query_id"]): i for i, r in enumerate(qrows)}
    Q = np.array([list(r["qvec"]) for r in qrows], dtype=np.float64)
    if isinstance(centroids, tuple):
        cids, cmat = centroids
    else:
        cids, cmat = collect_centroids(centroids)
    cids = np.asarray(cids, dtype=np.int64)
    is_l2 = metric == "l2"
    c2q = {int(c): [int(q) for q in qs] for c, qs in cell_to_queries.items()}

    def gen(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.array(pdf["vec"].tolist(), dtype=np.float64)
            ids_b = pdf["id"].to_numpy()
            if truth_fn is not None:
                tq, ti, td = truth_fn(V, ids_b)
                if len(tq):
                    yield pd.DataFrame(
                        {
                            "query_id": tq,
                            "id": ti,
                            "dist": td,
                            "_truth": np.ones(len(tq), dtype=bool),
                        }
                    )
            # assignment in the same distance domain as
            # argmin_id_arrow: sqrt'd L2 / cosine, first-min over
            # ascending cids
            Dc = np.sqrt(_seq_sq_l2(V, cmat)) if is_l2 else _seq_cosine(V, cmat)
            cells = cids[Dc.argmin(axis=1)]
            out_q, out_i, out_d = [], [], []
            for c in np.unique(cells):
                qs = c2q.get(int(c))
                if not qs:
                    continue
                m = cells == c
                Vm = V[m]
                idm = ids_b[m]
                qidx = np.array([qpos[q] for q in qs], dtype=np.int64)
                Dm = (
                    np.sqrt(_seq_sq_l2(Vm, Q[qidx]))
                    if is_l2
                    else _seq_cosine(Vm, Q[qidx])
                )
                for jj, q in enumerate(qs):
                    out_q.append(np.full(len(idm), q, dtype=np.int64))
                    out_i.append(idm)
                    out_d.append(Dm[:, jj])
            if not out_q:
                continue
            q_arr = np.concatenate(out_q)
            i_arr = np.concatenate(out_i)
            d_arr = np.concatenate(out_d)
            if local_topk is not None and len(d_arr) > local_topk:
                keep = local_topk_flat(q_arr, i_arr, d_arr, local_topk)
                q_arr, i_arr, d_arr = q_arr[keep], i_arr[keep], d_arr[keep]
            out = {"query_id": q_arr, "id": i_arr, "dist": d_arr}
            if truth_fn is not None:
                out["_truth"] = np.zeros(len(q_arr), dtype=bool)
            yield pd.DataFrame(out)

    return corpus.select("id", "vec").mapInPandas(gen, out_schema)


def ivf_search(
    queries: DataFrame,
    cells: DataFrame,
    centroids: DataFrame,
    metric: str = "cosine",
    k: int = 10,
    nprobe: int = 4,
    impl: str = "arrow",
    broadcast_queries: bool = True,
) -> DataFrame:
    """queries(query_id, qvec) -> (query_id, id, dist, rn), probing the
    nprobe nearest cells per query.

    ``broadcast_queries`` (the lsh_search contract flag, VERDICT r11
    what's-wrong #1): the arrow path collects the query batch to the
    driver for driver-side probe selection — correct only when queries
    are the broadcast-small side. Pass False for query batches that
    must stay distributed: probes are then selected with the
    crossJoin + rank-window plan (no driver collect anywhere) and
    scoring keeps the Arrow pairwise kernel — bit-identical output.

    The candidate distance (the hot expression — every probed-cell
    member per query) uses the Arrow pairwise kernel by default;
    Spark's higher-order fold evaluates interpreted per element, so at
    large cells the lambda dispatch dominates. Bit-identical to
    ``impl='expr'`` (same sequential IEEE adds; parity pinned in
    tests/test_argmin_parity.py).

    The probe list (queries x nprobe rows) is selected driver-side on
    the arrow path (probe_cells_local): it is a pure function of the
    query batch and the KB-sized centroid model, and materializing it
    as a local relation removes a crossJoin + rank-window shuffle +
    broadcast-build job per invocation while shipping the same rows to
    the same broadcast join. ``impl='expr'`` keeps the pure-Catalyst
    probe so the expression path stays exercised end-to-end."""
    if impl == "arrow" and not broadcast_queries:
        from vector_search_go_spark.operators.argmin import pairwise_dist_udf

        # distributed probe selection (the pre-r11 crossJoin + window
        # shape): same (cdist, cid) ranking, no driver collect; the
        # candidate scorer stays the Arrow pairwise kernel, so rows are
        # bit-identical to the collected path (probe_cells_local uses
        # the same sequential-IEEE kernels by construction)
        qprobe = (
            queries.crossJoin(F.broadcast(centroids))
            .withColumn("cdist", metric_dist(metric, F.col("qvec"), F.col("cvec")))
        )
        probes = topk_per_group(
            qprobe, ["query_id"], "cdist", nprobe, tiebreak_cols=["cid"],
            rank_name="_r",
        ).select("query_id", "qvec", F.col("cid").alias("cell"))
        cand = (
            probes.join(cells, on="cell")
            .withColumn(
                "dist", pairwise_dist_udf(metric)(F.col("qvec"), F.col("vec"))
            )
        )
        top = topk_per_group(cand, ["query_id"], "dist", k, tiebreak_cols=["id"])
        return top.select("query_id", "id", "dist", "rn")
    if impl == "arrow":
        from pyspark.sql.types import StructField, StructType

        from vector_search_go_spark.operators.argmin import (
            collect_centroids,
            pairwise_dist_udf,
        )

        qrows = sorted(
            queries.select("query_id", "qvec").collect(),
            key=lambda r: r["query_id"],
        )
        cids, cmat = collect_centroids(centroids)
        probed = probe_cells_local(qrows, cids, cmat, metric, nprobe)
        # the local probe relation carries keys only — qvec joins back
        # from the broadcast query table below, so |queries| x nprobe
        # vectors never round-trip through the driver
        schema = StructType(
            [
                queries.select("query_id").schema.fields[0],
                StructField("cell", centroids.schema["cid"].dataType, True),
            ]
        )
        probes = queries.sparkSession.createDataFrame(
            [(r["query_id"], c) for r, cs in probed for c in cs],
            schema,
        )
        cand = (
            F.broadcast(probes)
            .join(cells, on="cell")
            .join(F.broadcast(queries.select("query_id", "qvec")), on="query_id")
            .withColumn(
                "dist", pairwise_dist_udf(metric)(F.col("qvec"), F.col("vec"))
            )
        )
        top = topk_per_group(cand, ["query_id"], "dist", k, tiebreak_cols=["id"])
        return top.select("query_id", "id", "dist", "rn")
    else:
        qprobe = (
            queries.crossJoin(F.broadcast(centroids))
            .withColumn("cdist", metric_dist(metric, F.col("qvec"), F.col("cvec")))
        )
        probes = topk_per_group(
            qprobe, ["query_id"], "cdist", nprobe, tiebreak_cols=["cid"],
            rank_name="_r",
        ).select("query_id", "qvec", F.col("cid").alias("cell"))
        dist_col = metric_dist(metric, F.col("qvec"), F.col("vec"))
    # queries x nprobe rows — always the small side; without the hint
    # Catalyst picks SortMergeJoin and shuffles the whole cell store.
    cand = F.broadcast(probes).join(cells, on="cell").withColumn("dist", dist_col)
    top = topk_per_group(cand, ["query_id"], "dist", k, tiebreak_cols=["id"])
    return top.select("query_id", "id", "dist", "rn")


def ivf_save(
    spark, corpus: DataFrame, centroids: DataFrame, path: str,
    metric: str = "cosine",
    shards: int | None = None,
) -> None:
    """Persist an IVF index as a serving store: ``{path}/cells`` =
    (id, vec) parquet partitioned by cell, ``{path}/centroids`` = the
    model. Unlike the LSH bucket store (ids duplicated across trees, so
    vectors live in a separate table), IVF assigns each id exactly once
    — vectors COLOCATE with their cell and a point lookup reads them
    straight out of the pruned partitions, no second fetch join.

    Layout mirrors LshIndex.save: a handful of cells per task via range
    partitioning, rows sorted by (cell, id) for row-group locality.

    ``shards=N``: the sharded serving layout (serve.sharded) — each
    {path}/shard=K is a complete ivf_save of the id-subset
    pmod(xxhash64(id), N) == K against the SAME centroids (every shard
    probes identical cells, so the per-shard top-k merge is exact —
    serve/sharded.py). No cross-shard coupling exists for IVF (one
    cell row per id), so no analog of the LSH hot_buckets table is
    needed."""
    if shards is not None:
        from vector_search_go_spark.serve.sharded import (
            check_shard_population,
            shard_expr,
            write_shards_meta,
        )

        # pin both inputs once: the per-shard saves below would
        # otherwise re-run the corpus lineage N more times and the
        # centroid producer (usually a lazy kmeans_fit plan, itself
        # corpus-sized) ~2x per shard — the same N-fold build blow-up
        # LshIndex.save's sharded branch caches buckets to avoid
        centroids = spark.createDataFrame(
            centroids.collect(), centroids.schema
        )
        was_cached = corpus.is_cached
        if not was_cached:
            corpus = corpus.cache()
            corpus.count()
        try:
            check_shard_population(corpus, shards, "ivf corpus")
            sh = shard_expr(shards)
            for k in range(shards):
                ivf_save(
                    spark, corpus.filter(sh == k), centroids,
                    f"{path}/shard={k}", metric=metric,
                )
            write_shards_meta(spark, path, "ivf", shards, metric=metric)
        finally:
            if not was_cached:
                corpus.unpersist()
        return
    cells = assign_cells(corpus, centroids, metric=metric)
    (
        cells.repartitionByRange(8, "cell")
        .sortWithinPartitions("cell", "id")
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(f"{path}/cells")
    )
    centroids.write.mode("overwrite").parquet(f"{path}/centroids")
    # assignment metric rides with the store: cell membership is only
    # meaningful under the metric it was computed with, and a drift
    # rebuild (streaming.maintain.maintain_ivf) must reuse it rather
    # than guess
    import json as _json

    spark.createDataFrame(
        [(_json.dumps({"family": "ivf", "metric": metric}),)],
        "meta_json string",
    ).coalesce(1).write.mode("overwrite").json(f"{path}/store_meta")
    # build-time cell-mass baseline for drift maintenance
    # (streaming.maintain.cell_staleness) — aggregated from the
    # just-written store, like LshIndex.save's build_stats. Refresh
    # first: maintain_ivf re-saves over a path this session already
    # read, and a stale file listing would list deleted pre-rebuild
    # files (the hazard documented at lsh/index.py build_stats).
    spark.catalog.refreshByPath(f"{path}/cells")
    (
        spark.read.parquet(f"{path}/cells")
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("sz"))
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(f"{path}/build_stats")
    )


def load_ivf_model(spark, centroids_path: str):
    """Collect a saved store's centroid table to the (ids, matrix)
    closure payload (operators.argmin.collect_centroids — model-sized).
    Serving processes load once and pass the result to every
    ivf_point_search/ivfpq_point_search call, so a lookup pays no extra
    model-collect job."""
    from vector_search_go_spark.operators.argmin import collect_centroids

    return collect_centroids(spark.read.parquet(centroids_path))


def probe_cells_for(
    spark, centroids_path: str, qvec, metric: str, nprobe: int, model=None
) -> list:
    """Driver-side coarse probe for a saved store: score the centroids
    with the SAME sequential-IEEE kernels as the distributed path,
    return the nprobe nearest cell ids under the (dist, cid) tie-break
    topk_per_group would apply. ``model`` = a preloaded
    load_ivf_model() result (skips the per-call collect)."""
    import numpy as np

    from vector_search_go_spark.operators.argmin import _seq_cosine, _seq_sq_l2

    cids, C = model if model is not None else load_ivf_model(spark, centroids_path)
    q = np.asarray([list(qvec)], dtype=np.float64)
    d = np.sqrt(_seq_sq_l2(q, C))[0] if metric == "l2" else _seq_cosine(q, C)[0]
    return [int(cids[i]) for i in np.lexsort((cids, d))[:nprobe]]


def probe_cells_batch(
    spark, centroids_path: str, Q, metric: str, nprobe: int, model=None
) -> list:
    """Batch twin of probe_cells_for: one vectorized driver-side score
    of the centroid matrix for the whole query batch. Returns one
    nprobe-list per query row, same kernels and (dist, cid) tie-break
    as the single-query path — row i's list == probe_cells_for(Q[i])."""
    import numpy as np

    from vector_search_go_spark.operators.argmin import _seq_cosine, _seq_sq_l2

    cids, C = model if model is not None else load_ivf_model(spark, centroids_path)
    Q = np.asarray(Q, dtype=np.float64)
    D = np.sqrt(_seq_sq_l2(Q, C)) if metric == "l2" else _seq_cosine(Q, C)
    return [
        [int(cids[i]) for i in np.lexsort((cids, D[r]))[:nprobe]]
        for r in range(len(Q))
    ]


def ivf_point_search_batch(
    spark,
    path: str,
    queries,
    metric: str = "cosine",
    k: int = 10,
    nprobe: int = 4,
    threshold: float | None = None,
    model=None,
) -> DataFrame:
    """Serve a SMALL batch of queries from a saved IVF store in ONE
    job (micro-batch serving — amortizes Spark's fixed per-job floor
    that dominates single-query latency; see SCALE.md serving table).

    ``queries`` = [(query_id, qvec), ...]. The coarse probe runs
    driver-side for the whole batch at once (probe_cells_batch), the
    cells scan reads the UNION of probed cells exactly once
    (``cell IN (...)`` partition pruning), each scanned row maps back
    to its probing queries via a broadcast (cell -> query ids) table
    built driver-side, and scoring fans in (one Arrow crossing per
    candidate row regardless of batch size). Bit-identical per query
    to ivf_point_search (tests/test_serving_batch.py)."""
    import numpy as np

    from vector_search_go_spark.operators.argmin import fanin_query_scorer
    from vector_search_go_spark.operators.topk import topk_per_group

    if not queries:
        raise ValueError("ivf_point_search_batch needs at least one query")
    qids = [int(q) for q, _ in queries]
    if len(set(qids)) != len(qids):
        raise ValueError("duplicate query_id in batch")
    Q = np.asarray([list(v) for _, v in queries], dtype=np.float64)
    probed = probe_cells_batch(
        spark, f"{path}/centroids", Q, metric, nprobe, model=model
    )
    cell_qids: dict[int, list[int]] = {}
    for qid, cells_q in zip(qids, probed):
        for c in cells_q:
            cell_qids.setdefault(c, []).append(qid)
    map_df = spark.createDataFrame(
        sorted((c, sorted(qs)) for c, qs in cell_qids.items()),
        "cell int, qids array<bigint>",
    )
    queries_df = spark.createDataFrame(
        [(qid, [float(x) for x in Q[i]]) for i, qid in enumerate(qids)],
        "query_id bigint, qvec array<double>",
    )
    from vector_search_go_spark.streaming.delete import mask_tombstones

    cells = mask_tombstones(spark, path, spark.read.parquet(f"{path}/cells")).filter(
        F.col("cell").isin(sorted(cell_qids))
    )
    id_t = cells.schema["id"].dataType.simpleString()
    scored = cells.join(F.broadcast(map_df), on="cell").mapInPandas(
        fanin_query_scorer(queries_df, metric, local_topk=k),
        schema=f"query_id bigint, id {id_t}, dist double",
    )
    if threshold is not None:
        scored = scored.filter(F.col("dist") <= threshold)
    top = topk_per_group(scored, ["query_id"], "dist", k, tiebreak_cols=["id"])
    return top.select("query_id", "id", "dist", "rn")


def ivf_point_search(
    spark,
    path: str,
    qvec,
    metric: str = "cosine",
    k: int = 10,
    nprobe: int = 4,
    threshold: float | None = None,
    model=None,
) -> DataFrame:
    """Serve ONE query from a saved IVF store (the IVF twin of
    lsh.search.lsh_point_search): centroids load driver-side (model
    KBs; pass a preloaded ``model`` = load_ivf_model() to amortize the
    collect across lookups, the forest= pattern of lsh_point_search),
    the nprobe nearest cells are picked in numpy with the SAME
    sequential-IEEE distance and (dist, cid) tie-break as the
    distributed probe, and the cells scan carries ``cell IN (...)`` as
    a partition filter — bucket I/O is proportional to the probed
    cells, not the corpus. Returns (query_id=0, id, dist, rn)."""
    from vector_search_go_spark.operators.argmin import single_query_dist_udf
    from vector_search_go_spark.operators.topk import topk_per_group

    probe_cells = probe_cells_for(
        spark, f"{path}/centroids", qvec, metric, nprobe, model=model
    )

    from vector_search_go_spark.streaming.delete import mask_tombstones

    cells = mask_tombstones(spark, path, spark.read.parquet(f"{path}/cells")).filter(
        F.col("cell").isin(probe_cells)
    )
    dist = single_query_dist_udf(metric, qvec)
    cand = cells.select(
        F.lit(0).cast("bigint").alias("query_id"), "id", dist(F.col("vec")).alias("dist")
    )
    if threshold is not None:
        cand = cand.filter(F.col("dist") <= threshold)
    top = topk_per_group(cand, ["query_id"], "dist", k, tiebreak_cols=["id"])
    return top.select("query_id", "id", "dist", "rn")
