"""Product quantization (PQ): compressed-domain ANN search.

The compression companion to the coarse quantizer (ann_ivf.py) and the
tree LSH (lsh/): each vector is split into M contiguous subvectors and
every subvector is replaced by the id of its nearest codeword, so a
64-dim float vector (256 B) becomes M=16 one-byte codes — a 16x
storage cut. Search runs in the compressed domain
via asymmetric distance computation (ADC, Jegou et al., "Product
Quantization for Nearest Neighbor Search", TPAMI 2011): the query
precomputes its distance to every codeword once (M x C table), candidate
distances are then pure table lookups, and only a short ADC shortlist is
reranked against the raw vectors.

Codebooks here are a deterministic subset of the corpus (the first
``n_codes`` vectors' subvectors) rather than k-means — the same
seed-free, oracle-expressible choice as ann_ivf.py centroids; trained
codebooks change nothing structurally.

At 100 TB: encoding is a broadcast-join map stage (codebook is KBs) with
a map-side-combinable argmin; the ADC table (queries x M x C rows) is
always the broadcast side of the search join; the raw-vector rerank
touches only |queries| x shortlist rows. The corpus never shuffles.
"""

from __future__ import annotations

import numpy as np
import pandas as pd  # noqa: F401 — module scope so pandas_udf signatures
# survive postponed annotation evaluation
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from vector_search_go_spark.functions.metrics import as_double, l2_dist
from vector_search_go_spark.operators.topk import topk_per_group

M_SUB = 16  # subspaces
D_SUB = 4  # dims per subspace (M_SUB * D_SUB = embedding dim)
N_CODES = 128  # codewords per subspace
PQ_SHORTLIST = 100  # ADC shortlist reranked exactly (floor; see pq_shortlist)


def default_k_cells(n: int) -> int:
    """Coarse-cell count for an IVFADC store over ``n`` vectors:
    ~sqrt(n) rounded to a power of two, clamped to [256, 65536] — the
    standard sizing rule (cells ~ sqrt(n) balances the query's two
    scan terms: nprobe-proportional centroid scoring vs cell-member
    ADC scans). The r10 10M sweep (SCALE.md "Coarse-cell count
    scaling") measures the rule's terms: at MATCHED probed mass
    (nprobe = k_cells/128), finer cells cost build time roughly
    linearly in k_cells while recall at a fixed shortlist moves little
    on low-contrast data — the cell count is a BUILD-TIME knob the
    serving-time advisor (tune.recall_frontier_advisor) cannot tune,
    so size it by this rule up front.

    Pure arithmetic; callers that need a different trade pass k_cells
    explicitly (tools/probe_100m.py --build takes it positionally)."""
    import math

    target = max(1.0, math.sqrt(max(1, int(n))))
    k = 1 << int(round(math.log2(target)))
    return max(256, min(65536, k))


def pq_shortlist(k: int = 10) -> int:
    """Fixed rerank budget, independent of corpus size: max(100, 4k).

    The old corpus//8 scaling defeated the point of compression — at
    100 TB reranking an eighth of the corpus IS a corpus scan (VERDICT
    r2 finding #5). The fix was making the ADC ranking good enough that
    a constant shortlist holds recall: at M_SUB=16 4-dim subspaces
    (vs the previous 8x8), shortlist=100 measures recall 0.9350 with
    the sampled codebook and 0.9700 k-means-trained on the sf0.1 bench
    corpus (1,960 vectors, 40 queries, k=10) — above the 0.93/0.85
    BASELINE.md bands with a rerank cost that stays flat as the corpus
    grows (SCALE.md probes it at 1M vectors)."""
    return max(PQ_SHORTLIST, 4 * k)


def sq_l2(a: Column, b: Column) -> Column:
    """Squared L2 — l2_dist without the sqrt (ADC sums these across
    subspaces before one final sqrt). Same fold order as metrics.py."""
    diffsq = F.zip_with(as_double(a), as_double(b), lambda x, y: (x - y) * (x - y))
    return F.aggregate(diffsq, F.lit(0.0), lambda acc, v: acc + v)


def _subvec(col: Column, sub: Column) -> Column:
    return F.slice(col, sub * D_SUB + 1, F.lit(D_SUB))


def pq_codebook(emb: DataFrame) -> DataFrame:
    """embeddings(vec_id, embedding) -> (sub, code, cvec): codeword
    ``code`` of subspace ``sub`` is the sub-th subvector of vector
    ``vec_id == code`` (deterministic sampled codebook)."""
    return (
        emb.filter(F.col("vec_id") < N_CODES)
        .select(
            F.col("vec_id").cast("int").alias("code"),
            F.explode(F.sequence(F.lit(0), F.lit(M_SUB - 1))).alias("sub"),
            "embedding",
        )
        .select("sub", "code", _subvec(F.col("embedding"), F.col("sub")).alias("cvec"))
    )


def subvectors(df: DataFrame, id_col: str = "id", vec_col: str = "vec") -> DataFrame:
    """(id, vec) -> (sub, id, vec): one row per subspace with the
    D_SUB-dim slice — the training corpus for per-subspace k-means."""
    return df.select(
        F.explode(F.sequence(F.lit(0), F.lit(M_SUB - 1))).alias("sub"),
        F.col(id_col).alias("id"),
        F.col(vec_col),
    ).select("sub", "id", _subvec(F.col(vec_col), F.col("sub")).alias("vec"))


def pq_codebook_trained(
    corpus: DataFrame, iters: int = 3, exact: bool = False
) -> DataFrame:
    """corpus(id, vec) -> (sub, code, cvec): k-means-trained codebooks,
    one independent Lloyd run per subspace in a single grouped plan
    (operators.kmeans, group=['sub']). Versus the sampled codebook
    (pq_codebook), trained codewords cut ADC rank error: measured
    recall 0.9350 -> 0.9700 at the fixed 100-row shortlist on the
    sf0.1 bench (M=16 4-dim subspaces)."""
    from vector_search_go_spark.operators.kmeans import kmeans_fit

    cents = kmeans_fit(
        subvectors(corpus), k=N_CODES, iters=iters, dim=D_SUB, exact=exact,
        group=["sub"],
    )
    return cents.select("sub", F.col("cid").alias("code"), "cvec")


def pq_codebook_residual(
    corpus: DataFrame,
    coarse_cents: DataFrame,
    iters: int = 3,
    exact: bool = False,
) -> DataFrame:
    """corpus(id, vec) x coarse centroids -> (sub, code, cvec): the PQ
    codebook TRAINED ON RESIDUALS x - centroid(cell) — the model half
    of the residual IVFADC construction (see pq_codes_residual_udf).
    One assignment map stage + one residual map stage feed the same
    grouped Lloyd chain as pq_codebook_trained; the corpus never
    shuffles."""
    from vector_search_go_spark.operators.ann_ivf import assign_cells

    res = assign_cells(corpus, coarse_cents, metric="l2").select(
        "id",
        residual_vec_udf(coarse_cents)(F.col("vec"), F.col("cell")).alias(
            "vec"
        ),
    )
    return pq_codebook_trained(res, iters=iters, exact=exact)


def pq_encode(corpus: DataFrame, codebook: DataFrame, impl: str = "arrow") -> DataFrame:
    """corpus(id, vec) -> (id, sub, code): nearest codeword per
    subspace, (dist, code) tie-break. The corpus is never shuffled or
    aggregated either way (VERDICT r2 finding #3).

    Two bit-identical implementations (asserted in
    tests/test_argmin_parity.py, and both hash-equal to the DuckDB
    oracle):

    - ``impl='expr'``: pure-Catalyst — the codebook packs to M_SUB
      broadcast rows of array<struct<code, cvec>> (operators.argmin)
      and the argmin is one projection. Zero Python, but Spark
      evaluates higher-order lambdas INTERPRETED per element: at 1M
      vectors the 16-subspace x 128-codeword fold is minutes of lambda
      dispatch.
    - ``impl='arrow'`` (default): one Arrow-batched pandas UDF computes
      all M_SUB codes per vector with numpy using SEQUENTIAL
      per-dimension adds — the exact IEEE order of the fold — then
      posexplode fans out (sub, code). The codebook rides in the UDF
      closure (KBs). This is the sanctioned Python hot path: a batched
      matmul-shaped kernel built-ins cannot express efficiently."""
    if impl == "expr":
        from vector_search_go_spark.operators.argmin import argmin_id, pack_centroids

        cb = pack_centroids(codebook, id_col="code", group=["sub"], out_col="_codes")
        code = argmin_id(
            F.col("_codes"),
            lambda cv: sq_l2(_subvec(F.col("vec"), F.col("sub")), cv),
            id_field="code",
        )
        return (
            corpus.crossJoin(F.broadcast(cb)).select("id", "sub", code.alias("code"))
        )

    return corpus.select(
        "id", F.posexplode(pq_codes_udf(codebook)(F.col("vec"))).alias("sub", "code")
    )


def _codebook_mats(codebook: DataFrame):
    """codebook -> ({sub: code ids sorted}, {sub: matrix}) closure payload."""
    from vector_search_go_spark.operators.model_store import local_rows

    rows = local_rows(codebook, ["sub", "code", "cvec"])
    if rows is None:
        rows = codebook.select("sub", "code", "cvec").collect()
    rows = sorted(rows, key=lambda r: (r["sub"], r["code"]))
    mats: dict[int, np.ndarray] = {}
    ids: dict[int, np.ndarray] = {}
    for sub in {r["sub"] for r in rows}:
        sub_rows = [r for r in rows if r["sub"] == sub]
        ids[sub] = np.array([r["code"] for r in sub_rows], dtype=np.int64)
        mats[sub] = np.array([list(r["cvec"]) for r in sub_rows], dtype=np.float64)
    return ids, mats


def pq_codes_udf(codebook: DataFrame):
    """Arrow kernel: full-width vector -> packed array<int> of M_SUB
    codes in one pass (the codebook rides in the closure, KBs).
    Sequential per-dimension adds + first-min argmin over ascending
    code ids == the Catalyst min(struct(d, code)) fold."""
    from pyspark.sql.functions import pandas_udf

    from vector_search_go_spark.operators.argmin import _seq_sq_l2

    ids, mats = _codebook_mats(codebook)
    m_sub, d_sub = M_SUB, D_SUB

    @pandas_udf("array<int>")
    def codes_udf(vecs: pd.Series) -> pd.Series:
        V = np.array(vecs.tolist(), dtype=np.float64)
        out = np.empty((V.shape[0], m_sub), dtype=np.int32)
        for sub in range(m_sub):
            sl = V[:, sub * d_sub : (sub + 1) * d_sub]
            D = _seq_sq_l2(sl, mats[sub])
            # first-min argmin + ascending code ids == min(struct(d, code))
            out[:, sub] = ids[sub][D.argmin(axis=1)]
        return pd.Series(list(out))

    return codes_udf


def pq_encode_arr(corpus: DataFrame, codebook: DataFrame) -> DataFrame:
    """(id, codes array<int>) — array-form encode, the search-path twin
    of ``pq_encode``: one Arrow map stage, codes in subspace order.
    Bit-identical to regrouping pq_encode's exploded (id, sub, code)
    rows with sort_array(collect_list(struct(sub, code))) — which is a
    corpus-wide shuffle the ADC search paid purely to undo the explode
    the encode QUERY's output contract required (guide §2.4: remove
    shuffles outright)."""
    return corpus.select(
        "id", pq_codes_udf(codebook)(F.col("vec")).alias("codes")
    )


def _coarse_pos(coarse_cents) -> tuple:
    """(centroid matrix float64[C, D], {cid: row}) from a centroid
    DataFrame or a preloaded (cids, matrix) model — the closure payload
    of the residual kernels."""
    from vector_search_go_spark.operators.argmin import collect_centroids

    if isinstance(coarse_cents, tuple):
        cids, C = coarse_cents
    else:
        cids, C = collect_centroids(coarse_cents)
    return C, {int(c): i for i, c in enumerate(cids)}


def residual_vec_udf(coarse_cents):
    """Arrow kernel: (vec, cell) -> x - centroid(cell) as
    array<double> — the residual the IVFADC codebook trains on and
    encodes (Jegou et al. 2011 §IV.A: quantizing residuals concentrates
    the PQ codebook on within-cell variance, the standard fix for ADC
    rank error burying near-tie neighbors — the measured failure in
    SCALE.md's 100M sweep). Elementwise float64 subtraction ==
    Catalyst zip_with double subtract == the oracle's list_transform
    CAST(vec AS DOUBLE) - cvec, so the residual corpus is bit-portable
    across all three."""
    from pyspark.sql.functions import pandas_udf

    C, pos = _coarse_pos(coarse_cents)

    @pandas_udf("array<double>")
    def rvec(vecs: pd.Series, cells: pd.Series) -> pd.Series:
        V = np.array(vecs.tolist(), dtype=np.float64)
        idx = np.array([pos[int(c)] for c in cells], dtype=np.int64)
        return pd.Series(list(V - C[idx]))

    return rvec


def pq_codes_residual_udf(codebook: DataFrame, coarse_cents):
    """Arrow kernel: (vec, cell) -> packed codes of the RESIDUAL
    x - centroid(cell) — pq_codes_udf with the subtraction fused into
    the same batch pass (one map stage over the corpus, models ride the
    closure). ``codebook`` must itself be trained on residuals
    (pq_codebook_trained over residual_vec_udf output) for the codes to
    mean anything; search builds its ADC tables over the residual query
    q - centroid(cell) per probed cell."""
    from pyspark.sql.functions import pandas_udf

    ids, mats = _codebook_mats(codebook)
    C, pos = _coarse_pos(coarse_cents)
    m_sub, d_sub = M_SUB, D_SUB

    @pandas_udf("array<int>")
    def codes_udf(vecs: pd.Series, cells: pd.Series) -> pd.Series:
        from vector_search_go_spark.operators.argmin import _seq_sq_l2

        V = np.array(vecs.tolist(), dtype=np.float64)
        idx = np.array([pos[int(c)] for c in cells], dtype=np.int64)
        R = V - C[idx]
        out = np.empty((R.shape[0], m_sub), dtype=np.int32)
        for sub in range(m_sub):
            sl = R[:, sub * d_sub : (sub + 1) * d_sub]
            D = _seq_sq_l2(sl, mats[sub])
            out[:, sub] = ids[sub][D.argmin(axis=1)]
        return pd.Series(list(out))

    return codes_udf


def residual_lut(q: np.ndarray, cent_row: np.ndarray, cb_ids, cb_mats,
                 n_codes: int) -> np.ndarray:
    """The per-(query, cell) ADC lookup table of a residual store:
    LUT[sub][code] = squared L2 from (q - centroid(cell))'s sub-th
    subvector to that codeword — same sequential-IEEE kernel as the raw
    LUT, so the table is bit-identical wherever it is built (Spark
    point paths, local reader, shard readers, shortlist probe)."""
    from vector_search_go_spark.operators.argmin import _seq_sq_l2

    qr = q - cent_row
    lut = np.zeros((M_SUB, n_codes))
    for sub in range(M_SUB):
        sl = qr[sub * D_SUB : (sub + 1) * D_SUB][None, :]
        lut[sub, cb_ids[sub]] = _seq_sq_l2(sl, cb_mats[sub])[0]
    return lut


def pq_adc_candidates(
    queries: DataFrame, codes: DataFrame, codebook: DataFrame,
    impl: str = "arrow", local_topk: int | None = None,
) -> DataFrame:
    """(query_id, id, approx_dist) for every (query, candidate) pair the
    ``codes`` side supplies — the ADC lookup-table core, factored out so
    full-corpus PQ search and cell-restricted IVF+PQ share it. ``codes``
    may carry a ``query_id`` column already (pre-restricted candidates,
    e.g. from an IVF probe join); if absent every code row is scored
    against every query.

    ``impl='arrow'`` (default) builds the queries x M x N ADC table
    driver-side (queries and codebook are the small sides by contract)
    and scores each candidate batch with numpy fancy indexing — the
    lookup-sum folds its M terms in the same subspace order, so
    approx_dist is bit-identical to the ``impl='expr'`` expression fold
    (pinned by the pq/ivf_pq oracle hashes).

    ``local_topk=L`` (arrow impl only) emits each batch's exact local
    top-L rows per query under the (approx_dist, id) order instead of
    every pair — result-identical for the downstream
    ``topk(shortlist) → rerank → topk(k)`` pipeline when L >= the
    shortlist (top-L is selection-monotone across any partition of the
    pair set), while |queries| x L rows per batch reach the shuffle
    instead of |batch| x |queries|. ADC values are never approximated;
    pure row reduction."""
    has_qid = "query_id" in codes.columns
    if "codes" in codes.columns:
        # already array-form (pq_encode_arr): codes in subspace order —
        # exactly what the regroup below reassembles from exploded
        # (id, sub, code) rows, without its corpus-wide shuffle
        codes_arr = codes
    else:
        codes_arr = codes.groupBy(
            *(["query_id", "id"] if has_qid else ["id"])
        ).agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("sub", "code"))),
                lambda x: x["code"],
            ).alias("codes")
        )
    if impl == "arrow":
        from pyspark.sql.functions import pandas_udf  # noqa: F401

        from vector_search_go_spark.operators.argmin import _seq_sq_l2

        qrows = sorted(
            queries.select("query_id", "qvec").collect(),
            key=lambda r: r["query_id"],
        )
        if not qrows:
            # an empty query batch makes Q 1-D and every slice below
            # invalid — short-circuit to a well-formed empty result
            return queries.sparkSession.createDataFrame(
                [], "query_id long, id long, approx_dist double"
            )
        qids = np.array([r["query_id"] for r in qrows], dtype=np.int64)
        qpos = {int(q): i for i, q in enumerate(qids)}
        Q = np.array([list(r["qvec"]) for r in qrows], dtype=np.float64)
        from vector_search_go_spark.operators.model_store import local_rows

        cb_rows = local_rows(codebook, ["sub", "code", "cvec"])
        if cb_rows is None:
            cb_rows = codebook.select("sub", "code", "cvec").collect()
        cb_rows = sorted(cb_rows, key=lambda r: (r["sub"], r["code"]))
        # adc[q, sub, code]: codes must be the contiguous 0..N-1 range
        # the element_at arithmetic of the expr path assumes too
        adc = np.empty((len(qids), M_SUB, N_CODES))
        for sub in range(M_SUB):
            sub_rows = [r for r in cb_rows if r["sub"] == sub]
            assert [r["code"] for r in sub_rows] == list(range(N_CODES)), (
                "non-contiguous codebook codes"
            )
            mat = np.array([list(r["cvec"]) for r in sub_rows], dtype=np.float64)
            sl = Q[:, sub * D_SUB : (sub + 1) * D_SUB]
            adc[:, sub, :] = _seq_sq_l2(sl, mat)

        from vector_search_go_spark.operators.argmin import (
            local_topk_flat,
            mesh_topk_arrays,
        )

        def gen(batches):
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                C = np.array(pdf["codes"].tolist(), dtype=np.int64)
                if has_qid:
                    q_arr = pdf["query_id"].to_numpy()
                    qidx = np.array(
                        [qpos[int(q)] for q in q_arr], dtype=np.int64
                    )
                    s = np.zeros(len(C))
                    for j in range(M_SUB):
                        s += adc[qidx, j, C[:, j]]
                    d = np.sqrt(s)
                    ids_arr = pdf["id"].to_numpy()
                    if local_topk is not None and len(d) > local_topk:
                        keep = local_topk_flat(q_arr, ids_arr, d, local_topk)
                        q_arr, ids_arr, d = q_arr[keep], ids_arr[keep], d[keep]
                    yield pd.DataFrame(
                        {
                            "query_id": q_arr,
                            "id": ids_arr,
                            "approx_dist": d,
                        }
                    )
                else:
                    n_v = len(C)
                    s = np.zeros((n_v, len(qids)))
                    for j in range(M_SUB):
                        s += adc[:, j, C[:, j]].T
                    D = np.sqrt(s)
                    ids_b = pdf["id"].to_numpy()
                    if (
                        local_topk is not None
                        and n_v > local_topk
                        and len(qids) > 0
                    ):
                        q_o, i_o, d_o = mesh_topk_arrays(
                            D, ids_b, qids, local_topk
                        )
                        yield pd.DataFrame(
                            {"query_id": q_o, "id": i_o, "approx_dist": d_o}
                        )
                        continue
                    yield pd.DataFrame(
                        {
                            "query_id": np.repeat(
                                qids[None, :], n_v, axis=0
                            ).ravel(),
                            "id": np.repeat(ids_b, len(qids)),
                            "approx_dist": D.ravel(),
                        }
                    )

        return codes_arr.mapInPandas(
            gen, "query_id long, id long, approx_dist double"
        )

    adc_long = queries.crossJoin(F.broadcast(codebook)).select(
        "query_id",
        "sub",
        "code",
        sq_l2(_subvec(F.col("qvec"), F.col("sub")), F.col("cvec")).alias("d"),
    )
    adc_tab = adc_long.groupBy("query_id").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("sub", "code", "d"))),
            lambda x: x["d"],
        ).alias("adc")
    )
    if has_qid:
        pairs = codes_arr.join(F.broadcast(adc_tab), on="query_id")
    else:
        pairs = codes_arr.crossJoin(F.broadcast(adc_tab))
    return pairs.select(
        "query_id",
        "id",
        F.sqrt(
            F.aggregate(
                F.sequence(F.lit(0), F.lit(M_SUB - 1)),
                F.lit(0.0),
                lambda acc, j: acc
                + F.element_at(
                    F.col("adc"),
                    (j * N_CODES + F.element_at(F.col("codes"), j + 1) + 1).cast(
                        "int"
                    ),
                ),
            )
        ).alias("approx_dist"),
    )


def pq_adc_scores_fused(
    corpus: DataFrame,
    codebook: DataFrame,
    queries: DataFrame | None = None,
    qrows: list | None = None,
    local_topk: int | None = None,
    truth_fn=None,
) -> DataFrame:
    """(query_id, id, approx_dist) with PQ encode and full-mesh ADC
    scoring FUSED into one Arrow stage over the raw corpus — replaces
    the pq_encode_arr (ArrowEvalPython) -> pq_adc_candidates
    (MapInPandas) chain, whose code arrays crossed the Python boundary
    twice per invocation (guide §4.2).

    Bit-identical piece by piece: encode is pq_codes_udf's per-subspace
    sequential argmin over the ascending-code codebook; the ADC table
    and the subspace-ordered lookup-sum are pq_adc_candidates' (the pq
    oracle hashes pin both); ``local_topk`` is the same exact
    (approx_dist, id) per-batch mesh truncation.

    ``truth_fn`` (exact_knn.exact_local_topk_kernel): when given, each
    batch also emits the exact-KNN local top-k rows computed from the
    SAME decoded V matrix and the output gains a ``_truth`` flag — the
    recall-vs-exact entries split the two chains behind one
    localCheckpoint so the corpus is scanned once per invocation
    (guide §8.4)."""
    from vector_search_go_spark.operators.argmin import (
        _seq_sq_l2,
        mesh_topk_arrays,
    )

    if qrows is None:
        qrows = queries.select("query_id", "qvec").collect()
    qrows = sorted(qrows, key=lambda r: r["query_id"])
    out_schema = "query_id long, id long, approx_dist double" + (
        ", _truth boolean" if truth_fn is not None else ""
    )
    spark = corpus.sparkSession
    if not qrows:
        return spark.createDataFrame([], out_schema)
    qids = np.array([r["query_id"] for r in qrows], dtype=np.int64)
    Q = np.array([list(r["qvec"]) for r in qrows], dtype=np.float64)
    cb_ids, cb_mats = _codebook_mats(codebook)
    # adc[q, sub, code]: codes must be the contiguous 0..N-1 range the
    # element_at arithmetic of the expr path assumes too
    adc = np.empty((len(qids), M_SUB, N_CODES))
    for sub in range(M_SUB):
        assert list(cb_ids[sub]) == list(range(N_CODES)), (
            "non-contiguous codebook codes"
        )
        sl = Q[:, sub * D_SUB : (sub + 1) * D_SUB]
        adc[:, sub, :] = _seq_sq_l2(sl, cb_mats[sub])
    m_sub, d_sub = M_SUB, D_SUB

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
                            "approx_dist": td,
                            "_truth": np.ones(len(tq), dtype=bool),
                        }
                    )
            # encode: first-min argmin + ascending code ids ==
            # min(struct(d, code)) == pq_codes_udf
            C = np.empty((len(V), m_sub), dtype=np.int64)
            for sub in range(m_sub):
                sl = V[:, sub * d_sub : (sub + 1) * d_sub]
                Ds = _seq_sq_l2(sl, cb_mats[sub])
                C[:, sub] = cb_ids[sub][Ds.argmin(axis=1)]
            n_v = len(C)
            s = np.zeros((n_v, len(qids)))
            for j in range(m_sub):
                s += adc[:, j, C[:, j]].T
            D = np.sqrt(s)
            if local_topk is not None and n_v > local_topk and len(qids) > 0:
                q_o, i_o, d_o = mesh_topk_arrays(D, ids_b, qids, local_topk)
            else:
                q_o = np.repeat(qids[None, :], n_v, axis=0).ravel()
                i_o = np.repeat(ids_b, len(qids))
                d_o = D.ravel()
            out = {"query_id": q_o, "id": i_o, "approx_dist": d_o}
            if truth_fn is not None:
                out["_truth"] = np.zeros(len(q_o), dtype=bool)
            yield pd.DataFrame(out)

    return corpus.select("id", "vec").mapInPandas(gen, out_schema)


def ivfpq_adc_scores_fused(
    corpus: DataFrame,
    codebook: DataFrame,
    coarse_cents,
    cell_to_queries: dict,
    qrows: list,
    local_topk: int | None = None,
    truth_fn=None,
) -> DataFrame:
    """(query_id, id, approx_dist) over the residual-IVFADC chain with
    coarse assignment, residual encode and ADC scoring FUSED into ONE
    Arrow map stage over the corpus (guide §4.2: one batched kernel in
    place of a chain of map stages). Replaces the three-piece plan
    assign_cells -> pq_codes_residual_udf -> broadcast(probe) join ->
    ivfpq_adc_candidates_res, which paid two Python boundary crossings
    plus a broadcast build per invocation and shipped the code arrays
    through Arrow twice.

    Bit-identical to the unfused chain, piece by piece:

      - assignment: sqrt'd sequential-IEEE L2 + first-min argmin over
        ascending cids == argmin_id_arrow(metric='l2') == the Catalyst
        fold (tests/test_argmin_parity.py);
      - residual codes: same _seq_sq_l2 argmin over the sorted
        codebook == pq_codes_residual_udf;
      - ADC: residual_lut tables gathered per (query, cell), per-pair
        adds in subspace order, sqrt at the end == the unfused kernel
        (the ivfpq_residual_adc_verdict oracle hash pins every float);
      - ``local_topk`` is the same exact per-batch (approx_dist, id)
        truncation — selection-monotone for every downstream
        topk(shortlist) -> rerank -> topk(k) consumer.

    ``cell_to_queries`` maps cell id -> probing query ids (the inverse
    of the driver-side probe selection, ann_ivf.probe_cells_local);
    ``qrows`` is the collected (query_id, qvec) batch.

    ``truth_fn`` (guide §8.4: one corpus scan feeds both chains): a
    per-batch exact-KNN closure (exact_knn.exact_local_topk_kernel) —
    when given, the output gains a ``_truth`` flag column and each
    batch ADDITIONALLY emits the exact local top-k rows computed from
    the SAME decoded V matrix. The ADC rows are byte-identical to the
    truth_fn=None output; callers split the two chains behind one
    localCheckpoint so the corpus is scanned once per invocation
    instead of once per chain."""
    from vector_search_go_spark.operators.argmin import (
        _seq_sq_l2,
        local_topk_flat,
    )

    out_schema = "query_id long, id long, approx_dist double" + (
        ", _truth boolean" if truth_fn is not None else ""
    )
    spark = corpus.sparkSession
    if not qrows:
        return spark.createDataFrame([], out_schema)
    qrows = sorted(qrows, key=lambda r: r["query_id"])
    qpos = {int(r["query_id"]): i for i, r in enumerate(qrows)}
    Q = np.array([list(r["qvec"]) for r in qrows], dtype=np.float64)
    cb_ids, cb_mats = _codebook_mats(codebook)
    n_codes = max(int(cb_ids[s].max()) for s in cb_ids) + 1
    C, cpos = _coarse_pos(coarse_cents)
    cids_sorted = np.array(sorted(cpos, key=lambda c: cpos[c]), dtype=np.int64)
    c2q = {int(c): [int(q) for q in qs] for c, qs in cell_to_queries.items()}
    m_sub, d_sub = M_SUB, D_SUB

    def gen(batches):
        LUT_MEMO_CAP = 1024
        lut_memo: dict = {}

        def lut_for(qp: int, cell: int) -> np.ndarray:
            key = (qp, cell)
            lut = lut_memo.get(key)
            if lut is None:
                lut = residual_lut(Q[qp], C[cpos[cell]], cb_ids, cb_mats, n_codes)
                if len(lut_memo) >= LUT_MEMO_CAP:
                    lut_memo.clear()
                lut_memo[key] = lut
            return lut

        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.array(pdf["vec"].tolist(), dtype=np.float64)
            ids_arr = pdf["id"].to_numpy()
            if truth_fn is not None:
                tq, ti, td = truth_fn(V, ids_arr)
                if len(tq):
                    yield pd.DataFrame(
                        {
                            "query_id": tq,
                            "id": ti,
                            "approx_dist": td,
                            "_truth": np.ones(len(tq), dtype=bool),
                        }
                    )
            # coarse assignment: compare sqrt'd distances (the domain
            # the expression path compares in — see argmin_id_arrow)
            Dc = np.sqrt(_seq_sq_l2(V, C))
            cell_idx = Dc.argmin(axis=1)
            cells = cids_sorted[cell_idx]
            R = V - C[cell_idx]
            codes = np.empty((len(V), m_sub), dtype=np.int64)
            for sub in range(m_sub):
                sl = R[:, sub * d_sub : (sub + 1) * d_sub]
                Ds = _seq_sq_l2(sl, cb_mats[sub])
                codes[:, sub] = cb_ids[sub][Ds.argmin(axis=1)]
            out_q, out_i, out_d = [], [], []
            for c in np.unique(cells):
                qs = c2q.get(int(c))
                if not qs:
                    continue
                m = cells == c
                Cd = codes[m]
                idm = ids_arr[m]
                for q in qs:
                    lut = lut_for(qpos[q], int(c))
                    acc = np.zeros(len(Cd))
                    for sub in range(m_sub):
                        acc = acc + lut[sub, Cd[:, sub]]
                    out_q.append(np.full(len(Cd), q, dtype=np.int64))
                    out_i.append(idm)
                    out_d.append(np.sqrt(acc))
            if not out_q:
                continue
            q_arr = np.concatenate(out_q)
            i_arr = np.concatenate(out_i)
            d_arr = np.concatenate(out_d)
            if local_topk is not None and len(d_arr) > local_topk:
                keep = local_topk_flat(q_arr, i_arr, d_arr, local_topk)
                q_arr, i_arr, d_arr = q_arr[keep], i_arr[keep], d_arr[keep]
            out = {"query_id": q_arr, "id": i_arr, "approx_dist": d_arr}
            if truth_fn is not None:
                out["_truth"] = np.zeros(len(q_arr), dtype=bool)
            yield pd.DataFrame(out)

    return corpus.select("id", "vec").mapInPandas(gen, out_schema)


def ivfpq_adc_candidates_res(
    queries: DataFrame,
    codes: DataFrame,
    codebook: DataFrame,
    coarse_cents: DataFrame,
    local_topk: int | None = None,
    qrows: list | None = None,
) -> DataFrame:
    """(query_id, id, approx_dist) over RESIDUAL-encoded candidates —
    the residual twin of pq_adc_candidates' arrow path. ``codes`` rows
    are (query_id, cell, id, codes array<int>) pairs already restricted
    by the coarse probe join; the ADC value of a candidate depends on
    its CELL (LUT over q - centroid(cell)), so lookup tables are built
    per (query, cell) — lazily inside the Arrow kernel from the
    broadcast-sized models (queries x probed cells of them, each
    M x C doubles), never shipped as a batch x nprobe LUT blob.

    Bit-portability: residual_lut uses the sequential-IEEE kernel, the
    per-row fold adds its M terms in subspace order, and ``local_topk``
    is the same exact per-batch (approx_dist, id) truncation as
    pq_adc_candidates (selection-monotone for the downstream
    topk(shortlist) -> rerank -> topk(k))."""
    from vector_search_go_spark.operators.argmin import local_topk_flat

    if qrows is None:
        # one collect job per invocation unless the caller already
        # materialized the query batch (the ivfpq query entries share
        # one collect across probe selection and this kernel)
        qrows = queries.select("query_id", "qvec").collect()
    qrows = sorted(qrows, key=lambda r: r["query_id"])
    if not qrows:
        return queries.sparkSession.createDataFrame(
            [], "query_id long, id long, approx_dist double"
        )
    qpos = {int(r["query_id"]): i for i, r in enumerate(qrows)}
    Q = np.array([list(r["qvec"]) for r in qrows], dtype=np.float64)
    cb_ids, cb_mats = _codebook_mats(codebook)
    n_codes = max(int(cb_ids[s].max()) for s in cb_ids) + 1
    C, cpos = _coarse_pos(coarse_cents)

    def gen(batches):
        # bounded cross-batch LUT cache (ADVICE r10): each table is
        # M_SUB x n_codes doubles (~32 KB at 16x256); unbounded growth
        # is queries x probed-cells per executor — fine at bench scale,
        # not for large query batches. Within-batch reuse is via the
        # uq/np.stack gather regardless, so a full clear on overflow
        # only costs recomputing tables that span the boundary.
        LUT_MEMO_CAP = 1024
        lut_memo: dict = {}

        def lut_for(qp: int, cell: int) -> np.ndarray:
            key = (qp, cell)
            lut = lut_memo.get(key)
            if lut is None:
                lut = residual_lut(
                    Q[qp], C[cpos[cell]], cb_ids, cb_mats, n_codes
                )
                if len(lut_memo) >= LUT_MEMO_CAP:
                    lut_memo.clear()
                lut_memo[key] = lut
            return lut

        for pdf in batches:
            if len(pdf) == 0:
                continue
            Cd = np.array(pdf["codes"].tolist(), dtype=np.int64)
            q_arr = pdf["query_id"].to_numpy()
            cells = pdf["cell"].to_numpy()
            ids_arr = pdf["id"].to_numpy()
            # one gather per subspace over a stacked LUT tensor instead
            # of a Python loop per (query, cell) group — per-row float
            # op order is the same per-sub sequential add either way
            # (adds are elementwise; grouping cannot change them), and
            # a batch with hundreds of (query, cell) groups was paying
            # ~2x the kernel time in group masking alone
            uq, pair_idx = np.unique(
                np.column_stack([q_arr, cells]), axis=0, return_inverse=True
            )
            lut3 = np.stack(
                [lut_for(qpos[int(q)], int(c)) for q, c in uq]
            )
            acc = np.zeros(len(Cd))
            for sub in range(M_SUB):
                acc = acc + lut3[pair_idx, sub, Cd[:, sub]]
            d = np.sqrt(acc)
            if local_topk is not None and len(d) > local_topk:
                keep = local_topk_flat(q_arr, ids_arr, d, local_topk)
                q_arr, ids_arr, d = q_arr[keep], ids_arr[keep], d[keep]
            yield pd.DataFrame(
                {"query_id": q_arr, "id": ids_arr, "approx_dist": d}
            )

    return codes.select("query_id", "cell", "id", "codes").mapInPandas(
        gen, "query_id long, id long, approx_dist double"
    )


def pq_rerank(
    approx: DataFrame,
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    shortlist: int,
) -> DataFrame:
    """ADC scores -> shortlist -> exact-L2 rerank -> (query_id, id,
    dist, rn)."""
    short = topk_per_group(
        approx, ["query_id"], "approx_dist", shortlist, tiebreak_cols=["id"],
        rank_name="_s",
    ).select("query_id", "id")
    rer = (
        F.broadcast(short)
        .join(corpus, on="id")
        .join(F.broadcast(queries), on="query_id")
        .withColumn("dist", l2_dist(F.col("qvec"), F.col("vec")))
    )
    top = topk_per_group(rer, ["query_id"], "dist", k, tiebreak_cols=["id"])
    return top.select("query_id", "id", "dist", "rn")


def pq_adc_search(
    queries: DataFrame,
    codes: DataFrame,
    codebook: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    shortlist: int = PQ_SHORTLIST,
) -> DataFrame:
    """queries(query_id, qvec) -> (query_id, id, dist, rn): ADC over the
    compressed codes for a shortlist, exact L2 rerank for the final
    top-k. The per-(query, id) ADC sum folds its M terms in subspace
    order so the float result is bit-portable."""
    approx = pq_adc_candidates(queries, codes, codebook, local_topk=shortlist)
    return pq_rerank(approx, queries, corpus, k, shortlist)


def ivfpq_save(
    spark,
    corpus: DataFrame,
    coarse_cents: DataFrame,
    codebook: DataFrame,
    path: str,
    metric: str = "l2",
    shards: int | None = None,
    encoding: str = "residual",
    sq8: bool = False,
    _sq8_stats=None,
) -> None:
    """Persist a composed IVF+PQ index (the FAISS IVFADC layout) as a
    serving store:

      {path}/cells      (id, codes array<int>) partitioned by cell —
                        16x-compressed codes colocated with their
                        coarse cell, scanned only when probed
      {path}/vectors    (id, vec) — full-precision rows for the exact
                        rerank fetch, range-partitioned and sorted by
                        id so the shortlist's pushed ``id IN (...)``
                        skips row groups; at 100 TB this table can
                        live on cold storage, only shortlist row
                        groups are read
      {path}/centroids  coarse model      {path}/codebook  PQ model

    The ADC shortlist stage ranks by squared L2, so the store is
    L2-only; for cosine, L2-normalize vectors upstream (ordering is
    then equivalent) and keep metric='l2'.

    Assignment and encoding are both closure-kernel map stages — the
    corpus is scanned once and never shuffled except the partitioned
    writes themselves.

    ``shards=N``: the sharded serving layout (serve.sharded) — each
    {path}/shard=K is a complete ivfpq_save of the id-subset
    pmod(xxhash64(id), N) == K against the SAME coarse centroids and
    codebook. Identical models mean every shard probes identical cells
    and builds identical ADC lookup tables, so per-shard ADC values are
    comparable floats and the router's global-shortlist merge is exact
    (the selection-monotone argument in serve/sharded.py): the union of
    per-shard ADC top-L supersets the global ADC top-L. At 100 TB the
    COMPRESSED store is the one that must shard — raw vectors do not
    fit one reader's RAM, codes do per shard.

    ``encoding='residual'`` (default; VERDICT r9 item 1): codes are PQ
    over the RESIDUAL x - centroid(cell) and search LUTs are built per
    (query, probed cell) over q - centroid(cell) — the canonical IVFADC
    construction (Jegou et al. 2011 §IV.A). ``codebook`` must then be
    trained on residuals (residual_vec_udf -> pq_codebook_trained).
    ``encoding='raw'`` keeps the pre-r10 raw-vector codes + one global
    LUT per query. The choice rides in store_meta; every reader and
    probe resolves it from there — sharded merges stay exact either way
    (identical models => identical per-(query, cell) LUTs per shard).

    ``sq8=True`` (VERDICT r10 item 4) additionally writes the SQ8
    rerank tier: ``{path}/vectors_sq8`` (id, packed uint8 codes as
    binary — 8x smaller rows than the float vectors) and
    ``{path}/sq8_stats`` (per-dim mins/scales). Stats are exact global
    min/max over the WHOLE corpus — in the sharded layout they are
    computed once and shared, like the centroids and codebook, so
    sq8 distances are comparable across shards and the two-phase
    sharded merge stays exact. Readers opt in per search with
    ``rerank='sq8'``; existing stores gain the tier via
    sq8_augment_store."""
    from vector_search_go_spark.operators.ann_ivf import assign_cells

    if metric != "l2":
        raise ValueError(
            "IVFADC ranks its shortlist by squared L2; for cosine, "
            "L2-normalize the corpus and queries and use metric='l2'"
        )
    if encoding not in ("residual", "raw"):
        raise ValueError(f"unknown ivfpq encoding {encoding!r}")
    if shards is not None:
        from vector_search_go_spark.serve.sharded import (
            check_shard_population,
            shard_expr,
            write_shards_meta,
        )

        # pin all three inputs once: the per-shard saves re-run the
        # corpus lineage N more times, and the model producers (lazy
        # kmeans_fit / pq_codebook_trained plans, themselves
        # corpus-sized) would re-train per shard — the same N-fold
        # build blow-up LshIndex.save's sharded branch caches against
        coarse_cents = spark.createDataFrame(
            coarse_cents.collect(), coarse_cents.schema
        )
        codebook = spark.createDataFrame(codebook.collect(), codebook.schema)
        was_cached = corpus.is_cached
        if not was_cached:
            corpus = corpus.cache()
            corpus.count()
        try:
            check_shard_population(corpus, shards, "ivfpq corpus")
            if sq8 and _sq8_stats is None:
                _sq8_stats = _sq8_global_stats(corpus)
            sh = shard_expr(shards)
            for k in range(shards):
                ivfpq_save(
                    spark, corpus.filter(sh == k), coarse_cents, codebook,
                    f"{path}/shard={k}", metric=metric, encoding=encoding,
                    sq8=sq8, _sq8_stats=_sq8_stats,
                )
            write_shards_meta(spark, path, "ivfpq", shards, metric=metric)
        finally:
            if not was_cached:
                corpus.unpersist()
        return
    assigned = assign_cells(corpus, coarse_cents, metric=metric)
    if encoding == "residual":
        codes_col = pq_codes_residual_udf(codebook, coarse_cents)(
            F.col("vec"), F.col("cell")
        )
    else:
        codes_col = pq_codes_udf(codebook)(F.col("vec"))
    cells = assigned.select("cell", "id", codes_col.alias("codes"))
    (
        cells.repartitionByRange(8, "cell")
        .sortWithinPartitions("cell", "id")
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(f"{path}/cells")
    )
    (
        corpus.select("id", "vec")
        .repartitionByRange(8, "id")
        .sortWithinPartitions("id")
        .write.mode("overwrite")
        # small row groups: the rerank fetch reads ~shortlist-many
        # SCATTERED ids, so decode cost per matched row group must stay
        # near the shortlist row size (the local reader's stats index
        # and Spark's pushed `id IN` both prune at row-group
        # granularity). 64 KiB ≈ 120 x 64-d rows per group: measured
        # 237.6 -> 23.9 ms/q median on the 1M ivfpq-local probe vs
        # 512 KiB, at ~8x more footer stats (tiny) and a mild
        # sequential-scan cost only compaction-style readers ever see.
        .option("parquet.block.size", 64 << 10)
        .parquet(f"{path}/vectors")
    )
    coarse_cents.write.mode("overwrite").parquet(f"{path}/centroids")
    codebook.write.mode("overwrite").parquet(f"{path}/codebook")
    if sq8:
        if _sq8_stats is None:
            _sq8_stats = _sq8_global_stats(corpus)
        write_sq8_tier(spark, corpus.select("id", "vec"), _sq8_stats, path)
    # family/metric metadata + the build-time cell-mass baseline —
    # streaming ingest (ingest_to_ivfpq_store) appends through the
    # frozen models, and drift maintenance (maintain_ivfpq) compares
    # the store's current cell masses against this snapshot, exactly
    # like ivf_save/cell_staleness
    import json as _json

    spark.createDataFrame(
        [(
            _json.dumps(
                {"family": "ivfpq", "metric": metric, "encoding": encoding}
            ),
        )],
        "meta_json string",
    ).coalesce(1).write.mode("overwrite").json(f"{path}/store_meta")
    spark.catalog.refreshByPath(f"{path}/cells")
    (
        spark.read.parquet(f"{path}/cells")
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("sz"))
        .write.mode("overwrite")
        .parquet(f"{path}/build_stats")
    )


# (path) -> (freshness_key, recommended_shortlist | None). Serving loops
# call ivfpq_point_search per lookup with shortlist=None; without a memo
# every lookup would pay a glob+JSON parse (local) or a whole Spark json
# job ('://' paths) — on exactly the path the models= parameter exists
# to keep corpus-size-independent. Local entries key on the meta files'
# (path, mtime_ns) so an external rewrite invalidates them for free;
# remote entries cannot stat cheaply, so maintain_ivfpq drops its entry
# explicitly after rewriting store_meta (invalidate_stored_shortlist).
_SHORTLIST_MEMO: dict[str, tuple[tuple, int | None]] = {}


def invalidate_stored_shortlist(path: str) -> None:
    _SHORTLIST_MEMO.pop(path, None)
    _ENCODING_MEMO.pop(path, None)


# (path) -> (freshness_key, 'residual' | 'raw'). Same serving-path memo
# contract as _SHORTLIST_MEMO: local entries key on the meta files'
# mtimes, remote entries are dropped by invalidate_stored_shortlist
# after a rebuild rewrites store_meta.
_ENCODING_MEMO: dict[str, tuple[tuple, str]] = {}


def store_encoding(spark, path: str) -> str:
    """'residual' | 'raw' for the IVFADC store at ``path``. Sharded
    layouts resolve from shard=0's store_meta (each per-shard save
    carries the tag; the layout root holds only shards_meta until a
    retune merges one in). Stores that predate the tag are 'raw' —
    absence maps to the old semantics, never a guess."""
    import os as _os

    key: tuple = ()
    if "://" not in path:
        from vector_search_go_spark.serve.local_reader import meta_files

        files = meta_files(path) + meta_files(f"{path}/shard=0")
        key = tuple((f, _os.stat(f).st_mtime_ns) for f in files)
    hit = _ENCODING_MEMO.get(path)
    if hit is not None and hit[0] == key:
        return hit[1]
    meta = read_store_meta_any(spark, path)
    enc = meta.get("encoding")
    family = meta.get("family")
    if enc is None:
        shard_meta = read_store_meta_any(spark, f"{path}/shard=0")
        enc = shard_meta.get("encoding")
        family = family or shard_meta.get("family")
    if enc is None and family == "ivfpq":
        # VERDICT r10 item 5: every ivfpq_save since the residual
        # encoding landed writes the tag, so an ivfpq store_meta
        # WITHOUT one is either a pre-residual store (legitimately
        # raw) or — the bug class this guards — a meta rewritten from
        # scratch instead of merged (merge_store_meta), which silently
        # flips readers to raw-LUT scoring of residual codes. Assume
        # raw, but say so.
        import warnings

        warnings.warn(
            f"ivfpq store at {path!r} has no 'encoding' tag in "
            "store_meta — assuming 'raw'. If this store was saved with "
            "residual encoding, its meta was rewritten without merging "
            "(use merge_store_meta); raw-LUT scoring of residual codes "
            "returns wrong distances.",
            stacklevel=2,
        )
    enc = str(enc) if enc is not None else "raw"
    _ENCODING_MEMO[path] = (key, enc)
    return enc


def _sq8_global_stats(corpus: DataFrame):
    """(mins, scales) float64 arrays of exact per-dimension min/max over
    ``corpus`` — one map-side-combinable aggregation (sq8_stats), the
    same stats contract as the standalone sq8 family. Returned as numpy
    so the sharded save can broadcast one copy into every shard's
    writer closure."""
    import numpy as np

    from vector_search_go_spark.operators.sq8 import sq8_stats

    dim = len(corpus.select("vec").first()["vec"])
    row = sq8_stats(corpus.select("id", "vec"), dim).collect()[0]
    return (
        np.array(list(row["mins"]), dtype=np.float64),
        np.array(list(row["scales"]), dtype=np.float64),
    )


def write_sq8_tier(spark, vectors: DataFrame, stats, path: str) -> None:
    """Write the SQ8 rerank tier next to an IVFADC store's tables:
    ``{path}/vectors_sq8`` (id, codes binary — one uint8 per dimension,
    id-sorted small row groups so the shortlist fetch prunes row groups
    exactly like the float rerank fetch) and ``{path}/sq8_stats`` (one
    row: mins, scales). ``stats`` is the (mins, scales) numpy pair from
    _sq8_global_stats — REQUIRED to be corpus-global in sharded
    layouts."""
    from vector_search_go_spark.operators.sq8 import sq8_encode_bytes_udf

    mins, scales = stats
    enc = sq8_encode_bytes_udf(mins, scales)
    (
        vectors.select("id", enc(F.col("vec")).alias("codes"))
        .repartitionByRange(8, "id")
        .sortWithinPartitions("id")
        .write.mode("overwrite")
        # same small-row-group rationale as the vectors table: the
        # fetch reads ~shortlist scattered ids; codes rows are 8x
        # smaller so ~120-row groups stay well under the 64 KiB target
        .option("parquet.block.size", 16 << 10)
        .parquet(f"{path}/vectors_sq8")
    )
    spark.createDataFrame(
        [(mins.tolist(), scales.tolist())],
        "mins array<double>, scales array<double>",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/sq8_stats")


def sq8_augment_store(spark, path: str, shards: int | None = None) -> None:
    """Add the SQ8 rerank tier to an EXISTING IVFADC store (built
    before ``ivfpq_save(sq8=True)`` existed, or deliberately without
    it): reads the store's own vectors tables, computes one exact
    global stats row, and writes vectors_sq8 + sq8_stats per shard.
    ``shards=None`` autodetects the sharded layout from shards_meta.
    Idempotent — rerunning overwrites the tier in place; the float
    vectors and codes tables are never touched."""
    import os as _os

    if shards is None:
        from vector_search_go_spark.serve.sharded import read_shards_meta

        sm = read_shards_meta(path) if "://" in path or _os.path.exists(
            path
        ) else None
        shards = int(sm["n_shards"]) if sm else 0
    bases = (
        [f"{path}/shard={k}" for k in range(shards)] if shards else [path]
    )
    all_vecs = spark.read.parquet(*[f"{b}/vectors" for b in bases])
    stats = _sq8_global_stats(all_vecs)
    for b in bases:
        write_sq8_tier(
            spark, spark.read.parquet(f"{b}/vectors").select("id", "vec"),
            stats, b,
        )


def merge_store_meta(spark, path: str, updates: dict) -> dict:
    """Merge ``updates`` into ``{path}/store_meta`` and rewrite it —
    THE way to persist meta changes (VERDICT r10 item 5). A rewrite
    built from scratch drops whatever keys it didn't know about; the
    round-10 in-round bugs were exactly that: tests rewriting
    family/metric meta lost the 'encoding' tag and readers silently
    fell back to raw-LUT scoring. Reads through read_store_meta_any so
    local and remote ('://') stores both merge. Returns the merged
    payload."""
    import json as _json

    meta = read_store_meta_any(spark, path)
    meta.update(updates)
    spark.createDataFrame(
        [(_json.dumps(meta),)], "meta_json string"
    ).coalesce(1).write.mode("overwrite").json(f"{path}/store_meta")
    spark.catalog.refreshByPath(f"{path}/store_meta")
    invalidate_stored_shortlist(path)
    return meta


def read_store_meta_any(spark, path: str) -> dict:
    """The store_meta payload at ``path`` for ANY path scheme: local
    paths parse the JSON part files directly (serve.local_reader),
    remote ('://') paths read through Spark. {} when the table is
    absent; parse errors raise (absence != unreadable — the
    _stored_shortlist contract). Every advisor/maintenance persist
    that MERGES into store_meta goes through this (ADVICE r9: the
    local-only merge meant a remote store's retune overwrote its
    family/metric keys)."""
    if "://" not in path:
        from vector_search_go_spark.serve.local_reader import _read_store_meta

        return _read_store_meta(path)
    import json as _json

    from pyspark.errors import AnalysisException

    try:
        rows = spark.read.json(f"{path}/store_meta").collect()
    except AnalysisException:  # absent meta table; parse errors raise
        return {}
    for r in rows:
        if r["meta_json"]:
            return _json.loads(r["meta_json"])
    return {}


def _stored_shortlist(spark, path: str) -> int | None:
    """The measured rerank budget persisted in ``{path}/store_meta`` by
    maintain_ivfpq's rebuild-time ADC probe (adc_shortlist_probe); None
    when the store predates the probe (plain ivfpq_save) or carries no
    recommendation. ABSENCE maps to None; a meta directory that exists
    but cannot be parsed raises — silently falling back would disable
    the measured budget without a trace (the engine.py:556 lesson)."""
    import json as _json
    import os as _os

    if "://" in path:
        hit = _SHORTLIST_MEMO.get(path)
        if hit is not None:
            return hit[1]
        from pyspark.errors import AnalysisException

        try:
            rows = spark.read.json(f"{path}/store_meta").collect()
            metas = [_json.loads(r["meta_json"]) for r in rows]
        except AnalysisException:  # absent meta table; parse errors raise
            metas = []
        val = next(
            (
                int(m["recommended_shortlist"])
                for m in metas
                if "recommended_shortlist" in m
            ),
            None,
        )
        _SHORTLIST_MEMO[path] = ((), val)
        return val

    from vector_search_go_spark.serve.local_reader import (
        meta_files,
        parse_meta_files,
    )

    files = meta_files(path)
    if not files:
        return None
    key = tuple((f, _os.stat(f).st_mtime_ns) for f in files)
    hit = _SHORTLIST_MEMO.get(path)
    if hit is not None and hit[0] == key:
        return hit[1]
    meta = parse_meta_files(files) or {}
    val = (
        int(meta["recommended_shortlist"])
        if "recommended_shortlist" in meta
        else None
    )
    _SHORTLIST_MEMO[path] = (key, val)
    return val


def adc_shortlist_probe(
    spark,
    path: str,
    k: int = 10,
    n_queries: int = 20,
    sample_rows: int = 5_000,
    quantile: float = 0.9,
    safety: float = 1.25,
    seed: int = 7,
    sample_mode: str = "cells",
) -> dict:
    """Measure, on a saved IVFADC store's OWN vectors, how deep the ADC
    ranking buries true neighbors — and recommend the rerank budget
    that covers them (VERDICT r5 item 4).

    Rationale: (cells, nprobe) cannot fix IVFADC recall on a
    low-contrast corpus — in the 6-sigma drift fixture nprobe already
    covers every cell, yet recall stops at 0.67 because true top-10
    neighbors rank as deep as ~340/800 in ADC order (quantization
    error rivals the tiny neighbor-distance gaps, the same
    no-structure regime as the SCALE.md angular probes). The knob that
    moves recall is the SHORTLIST, so that is what the rebuild
    re-picks, by measurement — the LSH advisor lesson (tune.py)
    applied to IVFADC.

    Shape: bounded driver-side probe, two small reads — sample <=
    ``sample_rows`` store vectors (a few MB; the advisor_report
    contract: one partition's worth, never the corpus), take
    ``n_queries`` evenly-id-spaced members as queries, fetch those
    rows' codes from the STORE's own cells table (measuring the
    encoding the store actually serves, not a re-derivation that a
    floating-point near-tie could flip), build each query's LUT with
    the sequential-IEEE kernel serving uses (_seq_sq_l2), and take the
    ``quantile`` of "rank of the worst true top-k neighbor" as a
    corpus FRACTION, scaled back to store size with a ``safety``
    margin. The exact-truth ranking uses the BLAS form — ranks only,
    never served values. Well-separated corpora measure a tiny
    fraction and stay at the pq_shortlist floor — the recommendation
    only grows when the store's own geometry demands it, and it is
    capped at the store size. Returns {recommended_shortlist,
    shortlist_frac, rank_needed, n_sample, n_store}.

    Sampling is deterministic id-hash thinning (the kmeans_fit
    sample_rows pattern; ADVICE r6): sample().limit() depends on
    file/partition order, so a re-save or different parallelism would
    shift the measured budget — the id-hash sample is a pure function
    of the ids, layout-independent. A SHARDED layout (shards_meta)
    probes the union of shard tables against the shared shard=0
    codebook — the recommendation must reflect the GLOBAL geometry the
    router's global shortlist serves.

    ``sample_mode='cells'`` (default; VERDICT r10 item 2): CELL-LOCAL
    sampling + a two-rate extrapolation. The r10 receipts showed the
    uniform sample is blind to clustered geometry — at 4,096 clusters
    a 5,000-row sample holds ~1.2 rows/cluster, so every sampled
    "neighbor" is cross-cluster, rank error looks corpus-proportional,
    and the recommendation overshoots the measured knee by orders of
    magnitude (recall 1.0 at 277,500 rows where the floor already
    serves it). Cell-local sampling takes WHOLE coarse cells
    (hash-ordered, until the row budget; id-hash-thinned only past 2x
    budget), so each query's sampled neighborhood has the store's TRUE
    local density. Extrapolation then splits the measured rank mass:
    rows in the query's own cell are counted at their realized
    sampling rate (~1 for a complete cell — local mass does NOT grow
    with the corpus), rows outside extrapolate at the rest-of-store
    rate exactly like the uniform rule. With uniform rates the two-rate
    formula reduces to the old needed/m * n_store, so well-mixed
    corpora keep their r5-r10 behavior while clustered corpora land
    near the knee. ``sample_mode='uniform'`` keeps the pre-r11 path."""
    import numpy as np

    from vector_search_go_spark.operators.argmin import _seq_sq_l2

    smeta = None
    if "://" not in path:
        from vector_search_go_spark.serve.sharded import read_shards_meta

        smeta = read_shards_meta(path)
    if smeta is not None:
        from vector_search_go_spark.serve.sharded import union_shard_component

        n_sh = int(smeta["n_shards"])
        vectors = union_shard_component(spark, path, n_sh, "vectors").select(
            "id", "vec"
        )
        cells_df = union_shard_component(spark, path, n_sh, "cells")
        codebook_df = spark.read.parquet(f"{path}/shard=0/codebook")
        cents_path = f"{path}/shard=0/centroids"
    else:
        from vector_search_go_spark.streaming.delete import mask_tombstones

        vectors = mask_tombstones(
            spark, path, spark.read.parquet(f"{path}/vectors")
        ).select("id", "vec")
        cells_df = mask_tombstones(spark, path, spark.read.parquet(f"{path}/cells"))
        codebook_df = spark.read.parquet(f"{path}/codebook")
        cents_path = f"{path}/centroids"
    enc = store_encoding(spark, path)
    n_store = vectors.count()
    if sample_mode not in ("cells", "uniform"):
        raise ValueError(f"unknown sample_mode {sample_mode!r}")
    cell_masses: dict | None = None
    if sample_mode == "cells":
        from vector_search_go_spark.serve.xxh64 import SEED, hash_long

        # CURRENT per-cell masses from the codes table itself (one
        # bounded aggregation over 16-byte rows — the maintain
        # staleness pass does the same at 100M in ~37 s); they drive
        # both the cell choice and the two-rate extrapolation
        mass_rows = (
            cells_df.groupBy("cell")
            .agg(F.count(F.lit(1)).alias("sz"))
            .collect()
        )
        cell_masses = {int(r["cell"]): int(r["sz"]) for r in mass_rows}
        ordered = sorted(
            cell_masses,
            key=lambda c: (hash_long(int(c), SEED ^ int(seed)), c),
        )
        chosen, tot = [], 0
        for c in ordered:
            chosen.append(int(c))
            tot += cell_masses[c]
            # at least 8 cells (when the store has them) so the probe
            # never judges the whole store from one cell's geometry —
            # on a 100M x 1024-cell store one cell already exceeds the
            # row budget; the id-hash thinning below restores it while
            # keeping per-cell density ~1000x the uniform sample's
            if tot >= min(sample_rows, n_store) and len(chosen) >= min(
                8, len(ordered)
            ):
                break
        sub = cells_df.filter(F.col("cell").isin(chosen))
        if tot > 2 * sample_rows:
            # one id-hash thinning pass keeps the per-cell rate uniform
            # and deterministic; the realized rate feeds r_own below
            mod = int(np.ceil(tot / (2 * sample_rows)))
            sub = sub.filter(
                F.pmod(F.xxhash64("id", F.lit(int(seed))), F.lit(mod)) == 0
            )
        code_rows = sub.select("id", "cell", "codes").dropDuplicates(
            ["id"]
        ).collect()
        code_map = {r["id"]: (r["cell"], r["codes"]) for r in code_rows}
        ids = np.array(sorted(int(i) for i in code_map), dtype=np.int64)
        ids_df = spark.createDataFrame([(int(i),) for i in ids], "id bigint")
        vrows = (
            vectors.join(F.broadcast(ids_df), "id")
            .dropDuplicates(["id"])
            .collect()
        )
        vmap = {r["id"]: r["vec"] for r in vrows}
        missing = [int(i) for i in ids if int(i) not in vmap]
        if missing:
            raise ValueError(
                f"{len(missing)} sampled codes ids have no vectors row "
                f"in {path}/vectors (e.g. {missing[:3]}) — store "
                "components are out of sync; re-save before probing"
            )
        X = np.array([vmap[int(i)] for i in ids], dtype=np.float64)
    else:
        # thin down to AT MOST 4x the target with id-hash passes (each
        # pass divides by >= 2), then collect and trim to sample_rows by
        # keeping the smallest driver-side id hashes — still a pure
        # function of the ids (layout-independent). The result is AT
        # MOST sample_rows: the thinning passes target ~2x the budget
        # but carry hash variance, so a pass can land under it and the
        # trim then keeps what survived (never an issue for the
        # quantile — the rank fraction normalizes by the realized m,
        # and m stays within ~2x of the budget)
        sample, m_est, salt = vectors, n_store, int(seed)
        for _ in range(12):  # each pass halves at least; 12 covers 4000x
            if m_est <= 4 * sample_rows:
                break
            mod = max(2, m_est // (2 * sample_rows))
            sample = sample.filter(
                F.pmod(F.xxhash64("id", F.lit(salt)), F.lit(mod)) == 0
            )
            salt += 1
            m_est = sample.count()
        rows = sample.collect()
        if len(rows) > sample_rows:
            from vector_search_go_spark.serve.xxh64 import SEED, hash_long

            # the trim hash folds the caller's seed (ADVICE r7: with the
            # fixed module SEED alone, seed= had no effect at all whenever
            # n_store <= 4*sample_rows skipped the thinning passes)
            rows.sort(
                key=lambda r: (hash_long(int(r["id"]), SEED ^ int(seed)), r["id"])
            )
            rows = rows[:sample_rows]
        rows.sort(key=lambda r: r["id"])
        ids = np.array([r["id"] for r in rows], dtype=np.int64)
        X = np.array([r["vec"] for r in rows], dtype=np.float64)
        # the STORE's codes for the sampled ids — broadcast-joined, so
        # the cells scan stays one bounded read (dup ids from
        # at-least-once streaming drains collapse; codes are identical
        # replays)
        ids_df = spark.createDataFrame([(int(i),) for i in ids], "id bigint")
        code_rows = (
            cells_df
            .join(F.broadcast(ids_df), "id")
            .select("id", "cell", "codes")
            .dropDuplicates(["id"])
            .collect()
        )
        code_map = {r["id"]: (r["cell"], r["codes"]) for r in code_rows}
        missing = [int(i) for i in ids if int(i) not in code_map]
        if missing:
            raise ValueError(
                f"{len(missing)} sampled vector ids have no codes row in "
                f"{path}/cells (e.g. {missing[:3]}) — store components are "
                "out of sync; re-save before probing"
            )
    m = len(ids)
    qpos = np.unique(np.linspace(0, m - 1, min(n_queries, m)).round().astype(int))

    # exact squared-L2 ranking (ranks only — BLAS form is fine here)
    sq = (X * X).sum(axis=1)
    codes = np.array([code_map[int(i)][1] for i in ids], dtype=np.int64)
    cb_ids, cb_mats = _codebook_mats(codebook_df.select("sub", "code", "cvec"))
    n_codes = max(int(cb_ids[s].max()) for s in cb_ids) + 1
    # per-row cell labels: the residual scorer keys its LUTs on them,
    # and the cells-mode extrapolation splits rank mass by them
    cellarr = np.array(
        [int(code_map[int(i)][0]) for i in ids], dtype=np.int64
    )
    if enc == "residual":
        # residual ADC ranks score each sampled row under ITS OWN
        # cell's LUT — exactly what serving's per-(query, cell) tables
        # compute. One vectorized LUT build over the sample's distinct
        # cells per query (_seq_sq_l2 is row-independent, so each
        # cell's row equals the serving-side residual_lut)
        dcells = np.unique(cellarr)
        cell_idx = np.searchsorted(dcells, cellarr)
        from vector_search_go_spark.operators.ann_ivf import load_ivf_model

        cids_all, C_all = load_ivf_model(spark, cents_path)
        cpos_all = {int(c): i for i, c in enumerate(cids_all)}
        Cd = C_all[[cpos_all[int(c)] for c in dcells]]

    ranks_needed = []
    needed_global = []
    for qi in qpos:
        q = X[qi]
        exact = sq - 2.0 * (X @ q) + (q @ q)
        truth = np.lexsort((ids, exact))[:k]
        adc = np.zeros(m)
        if enc == "residual":
            R = q[None, :] - Cd
            for sub in range(M_SUB):
                lut_sub = np.zeros((len(dcells), n_codes))
                lut_sub[:, cb_ids[sub]] = _seq_sq_l2(
                    R[:, sub * D_SUB : (sub + 1) * D_SUB], cb_mats[sub]
                )
                adc = adc + lut_sub[cell_idx, codes[:, sub]]
        else:
            lut = np.zeros((M_SUB, n_codes))
            for sub in range(M_SUB):
                sl = q[sub * D_SUB : (sub + 1) * D_SUB][None, :]
                lut[sub, cb_ids[sub]] = _seq_sq_l2(sl, cb_mats[sub])[0]
            for sub in range(M_SUB):
                adc = adc + lut[sub][codes[:, sub]]
        order = np.lexsort((ids, adc))
        pos = np.empty(m, dtype=np.int64)
        pos[order] = np.arange(m)
        rank_q = int(pos[truth].max()) + 1
        ranks_needed.append(rank_q)
        if sample_mode == "cells":
            # two-rate extrapolation: the rank mass S (everything at or
            # before the worst true neighbor in ADC order) splits into
            # a = own-cell rows, scaled by the cell's REALIZED sampling
            # rate (local mass — does not grow with the corpus), and
            # b = cross-cell rows, scaled by the rest-of-store rate
            # (the uniform rule, applied only to the mass it is true of)
            S = order[:rank_q]
            cq = int(cellarr[qi])
            a = int((cellarr[S] == cq).sum())
            b = rank_q - a
            n_c = max(1, int(cell_masses.get(cq, 1)))
            m_c = int((cellarr == cq).sum())
            r_own = m_c / n_c
            rest_m = m - m_c
            rest_n = max(1, n_store - n_c)
            g = a / max(r_own, 1e-12)
            if b:
                g += b / max(rest_m / rest_n, 1e-12)
            needed_global.append(g)

    ranks_needed.sort()
    qidx = min(
        len(ranks_needed) - 1, int(np.ceil(quantile * (len(ranks_needed) - 1)))
    )
    needed = ranks_needed[qidx]
    if sample_mode == "cells":
        needed_global.sort()
        g = needed_global[qidx]
        frac = g / n_store
        recommended = int(
            max(pq_shortlist(k), min(n_store, int(np.ceil(safety * g))))
        )
    else:
        frac = needed / m
        recommended = int(
            max(pq_shortlist(k), min(n_store, int(np.ceil(safety * frac * n_store))))
        )
    return {
        "recommended_shortlist": recommended,
        "shortlist_frac": round(float(frac), 6),
        "rank_needed": int(needed),
        "n_sample": int(m),
        "n_store": int(n_store),
        "sample_mode": sample_mode,
    }


def load_ivfpq_models(spark, path: str):
    """Collect both model tables of a saved IVFADC store once:
    (coarse (cids, matrix), codebook ({sub: ids}, {sub: mats})). Pass
    to ivfpq_point_search(models=...) so serving lookups pay no
    model-collect jobs."""
    from vector_search_go_spark.operators.ann_ivf import load_ivf_model

    coarse = load_ivf_model(spark, f"{path}/centroids")
    cb = _codebook_mats(
        spark.read.parquet(f"{path}/codebook").select("sub", "code", "cvec")
    )
    return coarse, cb


def ivfpq_point_search(
    spark,
    path: str,
    qvec,
    metric: str = "l2",
    k: int = 10,
    nprobe: int = 4,
    shortlist: int | None = None,
    models=None,
) -> DataFrame:
    """Serve ONE query from a saved IVF+PQ store: coarse probe and the
    query's ADC lookup table are computed driver-side (both models are
    KBs; pass ``models`` = load_ivfpq_models() to amortize the loads
    across lookups); the codes scan reads ONLY the probed cell
    partitions and scores each candidate with M_SUB table lookups (no
    vector math, no full vectors read); the exact rerank collects the
    shortlist ids (bounded: max(100, 4k) rows) and pushes ``id IN``
    into the sorted vectors table, so only shortlist row groups are
    read. I/O = probed-cell codes + shortlist vector row groups — both
    corpus-size-independent. L2-only, like the store (see ivfpq_save).
    Returns (query_id=0, id, dist, rn)."""
    import numpy as np

    from pyspark.sql.functions import pandas_udf

    from vector_search_go_spark.operators.ann_ivf import probe_cells_for
    from vector_search_go_spark.operators.argmin import (
        _seq_sq_l2,
        single_query_dist_udf,
    )
    from vector_search_go_spark.operators.topk import topk_per_group

    if metric != "l2":
        raise ValueError(
            "IVFADC ranks its shortlist by squared L2; for cosine, "
            "L2-normalize the corpus and queries and use metric='l2'"
        )
    if shortlist is None:
        # honor the rebuild-time measured budget when the store carries
        # one (maintain_ivfpq + adc_shortlist_probe); the pq_shortlist
        # floor still applies so a larger k keeps its 4k margin
        shortlist = max(_stored_shortlist(spark, path) or 0, pq_shortlist(k))
    enc = store_encoding(spark, path)
    coarse_model, cb_model = models if models is not None else (None, None)
    if enc == "residual" and coarse_model is None:
        # residual LUTs need the probed cells' centroid rows — load the
        # (model-sized) coarse table once instead of letting the probe
        # collect and discard it
        from vector_search_go_spark.operators.ann_ivf import load_ivf_model

        coarse_model = load_ivf_model(spark, f"{path}/centroids")
    probe_cells = probe_cells_for(
        spark, f"{path}/centroids", qvec, metric, nprobe, model=coarse_model
    )

    # ADC lookup table(s): raw stores build ONE global LUT[sub][code] =
    # squared L2 from the query's sub-th subvector to that codeword;
    # residual stores build one per probed cell over q - centroid(cell)
    # (same sequential adds as sq_l2 either way)
    ids, mats = cb_model if cb_model is not None else _codebook_mats(
        spark.read.parquet(f"{path}/codebook").select("sub", "code", "cvec")
    )
    q = np.asarray(list(qvec), dtype=np.float64)
    n_codes = max(int(ids[s].max()) for s in ids) + 1
    if enc == "residual":
        C, cpos = _coarse_pos(coarse_model)
        luts = {
            int(c): residual_lut(q, C[cpos[int(c)]], ids, mats, n_codes)
            for c in probe_cells
        }

        @pandas_udf("double")
        def adc_res(cells: pd.Series, codes: pd.Series) -> pd.Series:
            Cd = np.array(codes.tolist(), dtype=np.int64)
            cellv = cells.to_numpy()
            acc = np.empty(len(Cd))
            for cell in np.unique(cellv):
                m = cellv == cell
                lut = luts[int(cell)]
                a = np.zeros(int(m.sum()))
                Cm = Cd[m]
                for sub in range(M_SUB):
                    a = a + lut[sub][Cm[:, sub]]
                acc[m] = a
            return pd.Series(np.sqrt(acc))

        adc_col = adc_res(F.col("cell"), F.col("codes"))
    else:
        lut = np.zeros((M_SUB, n_codes))
        for sub in range(M_SUB):
            sl = q[sub * D_SUB : (sub + 1) * D_SUB][None, :]
            lut[sub, ids[sub]] = _seq_sq_l2(sl, mats[sub])[0]

        @pandas_udf("double")
        def adc(codes: pd.Series) -> pd.Series:
            C = np.array(codes.tolist(), dtype=np.int64)
            acc = np.zeros(len(C))
            for sub in range(M_SUB):
                acc = acc + lut[sub][C[:, sub]]
            return pd.Series(np.sqrt(acc))

        adc_col = adc(F.col("codes"))

    from vector_search_go_spark.streaming.delete import mask_tombstones

    cand = (
        mask_tombstones(spark, path, spark.read.parquet(f"{path}/cells"))
        .filter(F.col("cell").isin(probe_cells))
        .select(
            F.lit(0).cast("bigint").alias("query_id"),
            "id",
            adc_col.alias("adc_dist"),
        )
    )
    short = topk_per_group(
        cand, ["query_id"], "adc_dist", shortlist, tiebreak_cols=["id"],
        rank_name="_s",
    ).select("id")

    # the shortlist is bounded (max(100, 4k) rows), so collecting it
    # and pushing `id IN (...)` into the sorted vectors scan keeps the
    # rerank I/O at shortlist row groups instead of a full-table join
    # (the lsh_point_search candidate-fetch pattern)
    short_ids = [r["id"] for r in short.collect()]
    vectors = spark.read.parquet(f"{path}/vectors").filter(
        F.col("id").isin(short_ids)
    )
    dist = single_query_dist_udf(metric, qvec)
    rer = vectors.select(
        F.lit(0).cast("bigint").alias("query_id"),
        "id",
        dist(F.col("vec")).alias("dist"),
    )
    top = topk_per_group(rer, ["query_id"], "dist", k, tiebreak_cols=["id"])
    return top.select("query_id", "id", "dist", "rn")


def ivfpq_point_search_batch(
    spark,
    path: str,
    queries,
    metric: str = "l2",
    k: int = 10,
    nprobe: int = 4,
    shortlist: int | None = None,
    models=None,
) -> DataFrame:
    """Serve a SMALL batch of queries from a saved IVFADC store in TWO
    jobs total (shortlist + rerank) regardless of batch size — the
    micro-batch twin of ivfpq_point_search (see SCALE.md serving
    table for the per-query latency this buys).

    ``queries`` = [(query_id, qvec), ...]. Coarse probes and all ADC
    lookup tables compute driver-side for the whole batch (LUTs are
    batch x M_SUB x n_codes doubles — KBs/query, closure-shippable);
    the codes scan reads the UNION of probed cells once and scores
    each row against exactly the queries that probed its cell (same
    sequential LUT-add order as the single path); per-query ADC
    shortlists collect together (bounded: batch x shortlist rows) and
    one ``id IN`` vectors fetch reranks them all, fanned in. L2-only
    like the store. Bit-identical per query to ivfpq_point_search
    (tests/test_serving_batch.py)."""
    import numpy as np

    from pyspark.sql import Row

    from vector_search_go_spark.operators.ann_ivf import probe_cells_batch
    from vector_search_go_spark.operators.argmin import (
        _seq_sq_l2,
        fanin_query_scorer,
    )

    if metric != "l2":
        raise ValueError(
            "IVFADC ranks its shortlist by squared L2; for cosine, "
            "L2-normalize the corpus and queries and use metric='l2'"
        )
    if not queries:
        raise ValueError("ivfpq_point_search_batch needs at least one query")
    if shortlist is None:
        # same resolution as ivfpq_point_search — the two paths must
        # stay bit-identical (tests/test_serving_batch.py)
        shortlist = max(_stored_shortlist(spark, path) or 0, pq_shortlist(k))
    qids = [int(q) for q, _ in queries]
    if len(set(qids)) != len(qids):
        raise ValueError("duplicate query_id in batch")
    Q = np.asarray([list(v) for _, v in queries], dtype=np.float64)
    enc = store_encoding(spark, path)
    coarse_model, cb_model = models if models is not None else (None, None)
    if enc == "residual" and coarse_model is None:
        from vector_search_go_spark.operators.ann_ivf import load_ivf_model

        coarse_model = load_ivf_model(spark, f"{path}/centroids")
    probed = probe_cells_batch(
        spark, f"{path}/centroids", Q, metric, nprobe, model=coarse_model
    )

    ids, mats = cb_model if cb_model is not None else _codebook_mats(
        spark.read.parquet(f"{path}/codebook").select("sub", "code", "cvec")
    )
    n_codes = max(int(ids[s].max()) for s in ids) + 1

    cell_qpos: dict[int, list[int]] = {}
    for pos, cells_q in enumerate(probed):
        for c in cells_q:
            cell_qpos.setdefault(int(c), []).append(pos)
    qid_arr = np.asarray(qids, dtype=np.int64)

    if enc == "residual":
        # ship the (model-sized) probed-cell centroid rows + codebook
        # and build each (query, cell) LUT lazily in the kernel — a
        # batch x nprobe LUT blob would be MBs of closure for nothing
        C_mat, cpos = _coarse_pos(coarse_model)
        cent_rows = {c: C_mat[cpos[c]] for c in cell_qpos}

        def make_lut_for():
            memo: dict = {}

            def lut_for(pos: int, cell: int) -> np.ndarray:
                lut = memo.get((pos, cell))
                if lut is None:
                    lut = residual_lut(
                        Q[pos], cent_rows[cell], ids, mats, n_codes
                    )
                    memo[(pos, cell)] = lut
                return lut

            return lut_for
    else:
        lut_all = np.zeros((len(qids), M_SUB, n_codes))
        for sub in range(M_SUB):
            sl = Q[:, sub * D_SUB : (sub + 1) * D_SUB]
            lut_all[:, sub, :][:, ids[sub]] = _seq_sq_l2(sl, mats[sub])

        def make_lut_for():
            def lut_for(pos: int, cell: int) -> np.ndarray:
                return lut_all[pos]

            return lut_for

    from vector_search_go_spark.streaming.delete import mask_tombstones

    scan = mask_tombstones(
        spark, path, spark.read.parquet(f"{path}/cells")
    ).filter(F.col("cell").isin(sorted(cell_qpos)))
    id_t = scan.schema["id"].dataType.simpleString()

    def adc_score(batches):
        # one LUT-add pass per (cell group, probing query): identical
        # per-row op order to the single-query adc udf (raw: global
        # LUT per query; residual: per-(query, cell) LUT)
        lut_for = make_lut_for()
        for pdf in batches:
            if len(pdf) == 0:
                continue
            C = np.array(pdf["codes"].tolist(), dtype=np.int64)
            ids_col = np.asarray(pdf["id"])
            cells_col = pdf["cell"].to_numpy()
            outs = []
            for cell in np.unique(cells_col):
                m = cells_col == cell
                Cm, idm = C[m], ids_col[m]
                for pos in cell_qpos[int(cell)]:
                    lut = lut_for(pos, int(cell))
                    acc = np.zeros(len(Cm))
                    for sub in range(M_SUB):
                        acc = acc + lut[sub][Cm[:, sub]]
                    d = np.sqrt(acc)
                    out_ids = idm
                    # exact local top-shortlist per (cell, query) chunk:
                    # downstream is topk(shortlist) -> rerank ->
                    # topk(k), so pre-truncating each chunk under the
                    # same (adc_dist, id) order is result-identical
                    if len(d) > shortlist and np.issubdtype(
                        out_ids.dtype, np.number
                    ):
                        keep = np.lexsort((out_ids, d))[:shortlist]
                        d, out_ids = d[keep], out_ids[keep]
                    outs.append(
                        pd.DataFrame(
                            {
                                "query_id": qid_arr[pos],
                                "id": out_ids,
                                "adc_dist": d,
                            }
                        )
                    )
            if outs:
                yield pd.concat(outs, ignore_index=True)

    cand = scan.select("cell", "id", "codes").mapInPandas(
        adc_score, schema=f"query_id bigint, id {id_t}, adc_dist double"
    )
    short = topk_per_group(
        cand, ["query_id"], "adc_dist", shortlist, tiebreak_cols=["id"],
        rank_name="_s",
    ).select("query_id", "id")

    # bounded collect: batch x shortlist rows; the union id list pushes
    # one `id IN (...)` into the sorted vectors table and the per-id
    # query lists ride a broadcast for the fan-in rerank
    pairs = short.collect()
    id_qids: dict = {}
    for r in pairs:
        id_qids.setdefault(r["id"], []).append(r["query_id"])
    fan_df = spark.createDataFrame(
        [Row(id=i, qids=sorted(qs)) for i, qs in sorted(id_qids.items())],
        f"id {id_t}, qids array<bigint>",
    )
    queries_df = spark.createDataFrame(
        [(qid, [float(x) for x in Q[i]]) for i, qid in enumerate(qids)],
        "query_id bigint, qvec array<double>",
    )
    vectors = spark.read.parquet(f"{path}/vectors").filter(
        F.col("id").isin(sorted(id_qids))
    )
    rer = vectors.join(F.broadcast(fan_df), on="id").mapInPandas(
        fanin_query_scorer(queries_df, metric, local_topk=k),
        schema=f"query_id bigint, id {id_t}, dist double",
    )
    top = topk_per_group(rer, ["query_id"], "dist", k, tiebreak_cols=["id"])
    return top.select("query_id", "id", "dist", "rn")
