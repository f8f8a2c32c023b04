"""Shuffle-free nearest-centroid assignment (broadcast-array argmin).

The naive Spark shape for "assign every corpus vector to its nearest
centroid" is ``corpus.crossJoin(broadcast(centroids))`` followed by
``groupBy(id).agg(min(struct(dist, cid)))`` — but that groupBy
re-shuffles the WHOLE corpus (id + vec) on every call, and k-means runs
it ``iters+1`` times. At 100 TB that is the dominant cost of the whole
quantizer stack (VERDICT r2 finding #3).

The fix exploits that centroid sets are tiny (k x dim doubles, KBs):
collapse them to ONE row holding ``array<struct<cid, cvec>>``, broadcast
that row, and compute the argmin inside a single projection:

    array_min(transform(cents, c -> struct(dist(vec, c.cvec), c.cid)))

``array_min`` over structs uses lexicographic struct ordering, so this
is exactly the previous ``min(struct(d, cid))`` — same value, same
(d, cid) tie-break, bit-identical distances (same per-pair fold) — with
ZERO joins-with-shuffle and ZERO aggregations over the corpus. The only
exchange left in an assignment plan is the KB-sized centroid collect.
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np
import pandas as pd  # noqa: F401 — module scope so pandas_udf signatures
# survive postponed annotation evaluation
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def pack_centroids(
    cents: DataFrame,
    id_col: str = "cid",
    vec_col: str = "cvec",
    group: list[str] | None = None,
    out_col: str = "_cents",
) -> DataFrame:
    """(group..., cid, cvec) -> one row per group value (or one row
    total) with ``out_col`` = array<struct<cid, cvec>>. The array is the
    broadcastable form every argmin below consumes."""
    packed = F.collect_list(F.struct(F.col(id_col), F.col(vec_col))).alias(out_col)
    if group:
        return cents.groupBy(*group).agg(packed)
    return cents.agg(packed)


def argmin_id(
    cent_arr: Column,
    dist_fn: Callable[[Column], Column],
    id_field: str = "cid",
    vec_field: str = "cvec",
) -> Column:
    """Nearest-centroid id over a packed centroid array.

    ``dist_fn(cvec)`` must yield the distance from the current row's
    vector to one centroid; ties break toward the smallest id, exactly
    like ``min(struct(d, id))``. One distance evaluation per centroid,
    all inside whole-stage codegen."""
    scored = F.transform(
        cent_arr,
        lambda c: F.struct(dist_fn(c[vec_field]).alias("d"), c[id_field].alias("_id")),
    )
    return F.array_min(scored)["_id"]


def collect_centroids(cents: DataFrame, id_col: str = "cid", vec_col: str = "cvec"):
    """Materialize a centroid table to (ids int32[], matrix float64[C, D])
    sorted by id — the closure payload for the Arrow argmin below. The
    collect is model-sized (k x dim doubles, KBs), the same bound as the
    broadcast pack."""
    from vector_search_go_spark.operators.model_store import local_rows

    rows = local_rows(cents, [id_col, vec_col])
    if rows is None:
        rows = cents.select(id_col, vec_col).collect()
    rows = sorted(rows, key=lambda r: r[id_col])
    ids = np.array([r[id_col] for r in rows], dtype=np.int64)
    mat = np.array([list(r[vec_col]) for r in rows], dtype=np.float64)
    return ids, mat


def _seq_sq_l2(V, C):
    """Row-to-centroid squared L2 with SEQUENTIAL per-dimension adds —
    the same IEEE order as the Catalyst fold `aggregate(diffsq, 0.0,
    acc+v)`, so distances (hence argmins) are bit-identical to the
    expression path and the DuckDB oracle."""
    D = np.zeros((V.shape[0], C.shape[0]))
    for d in range(V.shape[1]):
        diff = V[:, d, None] - C[None, :, d]
        D += diff * diff
    return D


def _seq_cosine(V, C, tol: float = 1e-6):
    """Cosine distance mirroring functions.metrics.cosine_dist exactly:
    sequential-add dot/norms, 1.0 when either norm <= tol, clamp < tol
    to 0.0."""
    def _norms(M):
        s = np.zeros(M.shape[0])
        for d in range(M.shape[1]):
            s += M[:, d] * M[:, d]
        return np.sqrt(s)

    nv, nc = _norms(V), _norms(C)
    dot = np.zeros((V.shape[0], C.shape[0]))
    for d in range(V.shape[1]):
        dot += V[:, d, None] * C[None, :, d]
    raw = 1.0 - dot / (nv[:, None] * nc[None, :])
    out = np.where(raw < tol, 0.0, raw)
    out = np.where((nv[:, None] <= tol) | (nc[None, :] <= tol), 1.0, out)
    return out


def argmin_id_arrow(cents: DataFrame, metric: str = "sq_l2",
                    id_col: str = "cid", vec_col: str = "cvec"):
    """Arrow-batched nearest-centroid id: returns a pandas_udf column
    function over the row vector. Spark's higher-order lambdas
    (transform/aggregate) evaluate INTERPRETED per element — at 1M
    vectors x 128 codewords the expression argmin is minutes of lambda
    dispatch, while this numpy version is one BLAS-shaped loop per
    Arrow batch (measured ~30x on the 1M probe). Distances use
    sequential per-dimension adds (_seq_sq_l2/_seq_cosine), so results
    are bit-identical to the expression path — asserted in
    tests/test_argmin_parity.py and by the DuckDB oracle gate."""
    from pyspark.sql.functions import pandas_udf

    ids, mat = collect_centroids(cents, id_col=id_col, vec_col=vec_col)
    if metric == "sq_l2":
        dist = _seq_sq_l2
    elif metric == "l2":
        # the expression path compares sqrt'd distances; sqrt is IEEE
        # correctly-rounded in both numpy and the JVM, but it can map
        # two distinct squared values onto one double — compare in the
        # same domain or tie-breaks could diverge
        dist = lambda V, C: np.sqrt(_seq_sq_l2(V, C))  # noqa: E731
    else:
        dist = _seq_cosine

    @pandas_udf("int")
    def nearest(vecs: pd.Series) -> pd.Series:
        V = np.array(vecs.tolist(), dtype=np.float64)
        D = dist(V, mat)
        # np.argmin returns the FIRST minimum; ids are sorted ascending,
        # so ties break toward the smallest id = min(struct(d, id))
        return pd.Series(ids[D.argmin(axis=1)].astype(np.int32))

    return nearest


def argmin_id_arrow_grouped(
    cents: DataFrame,
    group_col: str,
    metric: str = "sq_l2",
    id_col: str = "cid",
    vec_col: str = "cvec",
):
    """Grouped twin of argmin_id_arrow: one independent centroid set per
    ``group_col`` value (the PQ per-subspace shape). Returns a
    pandas_udf over (group, vec); the per-group centroid matrices ride
    in the closure (M x k x dim doubles — still model-sized)."""
    from pyspark.sql.functions import pandas_udf

    rows = sorted(
        cents.select(group_col, id_col, vec_col).collect(),
        key=lambda r: (r[group_col], r[id_col]),
    )
    ids: dict = {}
    mats: dict = {}
    for g in {r[group_col] for r in rows}:
        g_rows = [r for r in rows if r[group_col] == g]
        ids[g] = np.array([r[id_col] for r in g_rows], dtype=np.int64)
        mats[g] = np.array([list(r[vec_col]) for r in g_rows], dtype=np.float64)
    dist = _seq_sq_l2 if metric == "sq_l2" else (
        (lambda V, C: np.sqrt(_seq_sq_l2(V, C))) if metric == "l2" else _seq_cosine
    )

    @pandas_udf("int")
    def nearest(groups: pd.Series, vecs: pd.Series) -> pd.Series:
        gv = groups.to_numpy()
        out = np.empty(len(gv), dtype=np.int32)
        for g in np.unique(gv):
            m = gv == g
            V = np.array(vecs[m].tolist(), dtype=np.float64)
            out[m] = ids[g][dist(V, mats[g]).argmin(axis=1)]
        return pd.Series(out)

    return nearest


def local_topk_flat(q_arr, ids_arr, d_arr, L: int):
    """Indices of the exact per-query top-L pairs under the (d, id)
    order, over flat parallel arrays (query, id, dist) — the one shared
    implementation of the local-top-k reduction every Arrow kernel
    leans on (exact-KNN, fan-in scorer, ADC, SQ8). One grouped lexsort;
    no per-query boolean scans. Returns an index array into the inputs
    (grouped by query, (d, id)-sorted within each group); empty input
    -> empty index array."""
    n = len(d_arr)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    order = np.lexsort((ids_arr, d_arr, q_arr))
    qs = np.asarray(q_arr)[order]
    starts = np.nonzero(np.r_[True, qs[1:] != qs[:-1]])[0]
    sizes = np.diff(np.r_[starts, n])
    grp = np.repeat(np.arange(len(starts)), sizes)
    rank = np.arange(n) - starts[grp]
    return order[rank < L]


def local_topk_mesh(D, ids_b, L: int):
    """Per-column exact top-L of an (n_rows, n_queries) distance matrix
    under the (dist, id) order, WITHOUT flattening the mesh (a flat
    lexsort over n_rows x n_queries entries is the cost this avoids).
    Yields (col_j, row_indices) per column; row_indices are
    (dist, id)-sorted and at most L long."""
    n_v, n_q = D.shape
    for j in range(n_q):
        col = D[:, j]
        if n_v > L:
            pivot = np.partition(col, L - 1)[L - 1]
            rows = np.nonzero(col <= pivot)[0]
            rows = rows[np.lexsort((ids_b[rows], col[rows]))[:L]]
        else:
            rows = np.lexsort((ids_b, col))
        yield j, rows


def mesh_topk_arrays(D, ids_b, qids, L: int):
    """Consume ``local_topk_mesh`` into the three flat output arrays
    ``(query_id, id, dist)`` the ADC/SQ8 scan kernels emit — the one
    place the (dist, id)-order truncation contract is materialized for
    mesh-shaped scorers."""
    out_q, out_i, out_d = [], [], []
    for j, rows in local_topk_mesh(D, ids_b, L):
        out_q.append(np.full(len(rows), qids[j], dtype=np.int64))
        out_i.append(ids_b[rows])
        out_d.append(D[rows, j])
    return (
        np.concatenate(out_q),
        np.concatenate(out_i),
        np.concatenate(out_d),
    )


def fanin_query_scorer(queries: DataFrame, metric: str,
                       qid_col: str = "query_id", qvec_col: str = "qvec",
                       tol: float = 1e-6, local_topk: int | None = None,
                       qrows: list | None = None):
    """Fan-in candidate scorer for LSH search: consumes rows
    ``(id, qids array, vec)`` — one row per candidate CORPUS vector with
    the list of query ids it must be scored against — and emits
    ``(query_id, id, dist)`` pairs.

    Why this shape: the pairwise scorer joins each candidate pair to
    BOTH vectors, so a corpus vector hit by q queries crosses the
    Arrow boundary q times and every pair row carries a duplicated
    qvec. At high dims that transfer dominates the search (measured at
    the 60k x 784-d baseline shape, 100 queries: 39 s -> 13 s warm,
    84 s -> 16 s cold).
    Here the query matrix rides in the closure (queries are the small,
    broadcastable side by assumption — same bound as broadcast_queries)
    and each candidate corpus vector transfers exactly once.

    Distances use the same sequential per-dimension IEEE adds as the
    fold expression and the pairwise kernel, with identical operand
    order (A = query, B = corpus), so results are bit-identical to
    impl='expr' (pinned in tests/test_argmin_parity.py).

    ``local_topk=L`` pre-reduces each emitted Arrow batch to its EXACT
    local top-L pairs per query under the (dist, id) order. Safe for
    every downstream ``[threshold filter →] topk_per_group`` pipeline
    whose net rank cutoff is ≤ L: top-L is selection-monotone across
    any partition of the pair set (the global winners are winners of
    the per-batch winners) and a dist-threshold only removes a suffix
    of the order — so results are identical while only |queries| x L
    rows per batch reach the shuffle instead of every candidate pair.
    Distances are never approximated here; this is pure row
    reduction."""
    rows = (
        qrows
        if qrows is not None
        else queries.select(qid_col, qvec_col).collect()
    )
    Q = np.array([list(r[qvec_col]) for r in rows], dtype=np.float64)
    qpos = {r[qid_col]: i for i, r in enumerate(rows)}
    is_cos = metric in ("cosine", "angular")

    def score(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.array(pdf["vec"].tolist(), dtype=np.float64)
            qlists = pdf["qids"].tolist()
            lens = np.array([len(l) for l in qlists], dtype=np.int64)
            flat_qids = [q for lst in qlists for q in lst]
            qidx = np.array([qpos[q] for q in flat_qids], dtype=np.int64)
            rep = np.repeat(np.arange(len(pdf)), lens)
            n_pairs = len(rep)
            dist = np.empty(n_pairs)

            def _norm(M):
                t = np.zeros(M.shape[0])
                for d in range(M.shape[1]):
                    t += M[:, d] * M[:, d]
                return np.sqrt(t)

            # Chunk the pair dimension: the gathered (A, B) operand
            # pair is n_pairs x dims doubles EACH — at high fan-in
            # (large query batches) materializing it whole is GBs per
            # Arrow batch and the copy, not the FLOPs, dominates.
            # 8192 x 784-d = ~51 MB per operand per chunk.
            chunk = 8192
            for s0 in range(0, n_pairs, chunk):
                sl = slice(s0, min(s0 + chunk, n_pairs))
                A = Q[qidx[sl]]
                B = V[rep[sl]]
                if not is_cos:
                    s = np.zeros(A.shape[0])
                    for d in range(A.shape[1]):
                        diff = A[:, d] - B[:, d]
                        s += diff * diff
                    dist[sl] = np.sqrt(s)
                else:
                    na, nb = _norm(A), _norm(B)
                    dot = np.zeros(A.shape[0])
                    for d in range(A.shape[1]):
                        dot += A[:, d] * B[:, d]
                    raw = 1.0 - dot / (na * nb)
                    dc = np.where(raw < tol, 0.0, raw)
                    dist[sl] = np.where((na <= tol) | (nb <= tol), 1.0, dc)
            pair_ids = np.asarray(pdf["id"])[rep]
            if (
                local_topk is not None
                and n_pairs > local_topk
                and np.issubdtype(np.asarray(qidx).dtype, np.number)
                and np.issubdtype(pair_ids.dtype, np.number)
            ):
                keep = local_topk_flat(qidx, pair_ids, dist, local_topk)
                yield pd.DataFrame(
                    {
                        "query_id": [flat_qids[i] for i in keep],
                        "id": pair_ids[keep],
                        "dist": dist[keep],
                    }
                )
                continue
            yield pd.DataFrame(
                {
                    "query_id": flat_qids,
                    "id": pair_ids,
                    "dist": dist,
                }
            )

    return score


def single_query_dists(metric: str, q: np.ndarray, V: np.ndarray,
                       tol: float = 1e-6) -> np.ndarray:
    """Distances from ONE query vector to each row of V — the shared
    numpy kernel behind single_query_dist_udf AND the driver-side
    serving readers (serve/local_reader.py). Sequential per-dimension
    IEEE adds, operand order A = query / B = corpus, identical to every
    other kernel, so both consumers are bit-identical to the fold
    expression by construction."""
    q = np.asarray(q, dtype=np.float64)
    V = np.asarray(V, dtype=np.float64)
    if len(V) == 0:
        return np.empty(0)
    if metric not in ("cosine", "angular"):
        s = np.zeros(len(V))
        for d in range(V.shape[1]):
            diff = q[d] - V[:, d]
            s += diff * diff
        return np.sqrt(s)
    nq = 0.0
    for d in range(q.shape[0]):
        nq += q[d] * q[d]
    nq = np.sqrt(nq)
    nv = np.zeros(len(V))
    for d in range(V.shape[1]):
        nv += V[:, d] * V[:, d]
    nv = np.sqrt(nv)
    dot = np.zeros(len(V))
    for d in range(V.shape[1]):
        dot += q[d] * V[:, d]
    raw = 1.0 - dot / (nq * nv)
    out = np.where(raw < tol, 0.0, raw)
    return np.where((nq <= tol) | (nv <= tol), 1.0, out)


def single_query_dist_udf(metric: str, qvec, tol: float = 1e-6):
    """Distance from ONE fixed query vector (closure) to the row's
    vector — the point-lookup scorer (lsh.search.lsh_point_search).
    Thin pandas_udf wrapper over single_query_dists (one kernel, two
    consumers — Spark serving paths and the local reader)."""
    from pyspark.sql.functions import pandas_udf

    q = np.asarray(list(qvec), dtype=np.float64)

    @pandas_udf("double")
    def dist(vecs: pd.Series) -> pd.Series:
        V = np.array(vecs.tolist(), dtype=np.float64)
        return pd.Series(single_query_dists(metric, q, V, tol=tol))

    return dist


def pairwise_dist_udf(metric: str, tol: float = 1e-6):
    """Arrow-batched row-pair distance (both vectors in the row): the
    vectorized twin of functions.metrics.metric_dist, with sequential
    per-dimension adds so each scalar result is bit-identical to the
    fold expression. Used where candidates are already joined to both
    vectors (LSH candidate scoring) and the per-pair fold would be
    interpreted lambda dispatch."""
    from pyspark.sql.functions import pandas_udf

    is_cos = metric in ("cosine", "angular")

    @pandas_udf("double")
    def dist(a: pd.Series, b: pd.Series) -> pd.Series:
        A = np.array(a.tolist(), dtype=np.float64)
        B = np.array(b.tolist(), dtype=np.float64)
        if not is_cos:
            s = np.zeros(len(A))
            for d in range(A.shape[1]):
                diff = A[:, d] - B[:, d]
                s += diff * diff
            return pd.Series(np.sqrt(s))

        def _norm(M):
            s = np.zeros(M.shape[0])
            for d in range(M.shape[1]):
                s += M[:, d] * M[:, d]
            return np.sqrt(s)

        na, nb = _norm(A), _norm(B)
        dot = np.zeros(len(A))
        for d in range(A.shape[1]):
            dot += A[:, d] * B[:, d]
        raw = 1.0 - dot / (na * nb)
        out = np.where(raw < tol, 0.0, raw)
        out = np.where((na <= tol) | (nb <= tol), 1.0, out)
        return pd.Series(out)

    return dist
