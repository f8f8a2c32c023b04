"""Product-quantization operator tests (operators/pq.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from vector_search_go_spark.operators.pq import (
    D_SUB,
    M_SUB,
    N_CODES,
    pq_codebook,
    pq_encode,
)


def _emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def test_codebook_shape(spark, sf_dir):
    cb = pq_codebook(_emb(spark, sf_dir)).collect()
    assert len(cb) == M_SUB * N_CODES
    assert {r["sub"] for r in cb} == set(range(M_SUB))
    assert {r["code"] for r in cb} == set(range(N_CODES))
    for r in cb:
        assert len(r["cvec"]) == D_SUB


def test_encode_is_identity_on_codebook_vectors(spark, sf_dir):
    """A vector whose subvectors ARE codewords must encode to itself
    (distance 0 to its own codeword in every subspace)."""
    emb = _emb(spark, sf_dir)
    corpus = emb.filter(F.col("vec_id") < N_CODES).select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vec")
    )
    codes = pq_encode(corpus, pq_codebook(emb)).collect()
    assert len(codes) == N_CODES * M_SUB
    for r in codes:
        assert r["code"] == r["id"], (r["id"], r["sub"], r["code"])


def test_adc_search_shape_and_order(spark, sf_dir):
    from vector_search_go_spark.queries_pipeline import pq_search_adc

    rows = pq_search_adc(spark, sf_dir).collect()
    per_q = {}
    for r in rows:
        per_q.setdefault(r["query_id"], []).append((r["rn"], r["dist"]))
    assert per_q
    for q, hits in per_q.items():
        hits.sort()
        assert [rn for rn, _ in hits] == list(range(1, len(hits) + 1))
        dists = [d for _, d in hits]
        assert dists == sorted(dists)


def test_pq_recall_beats_floor(spark, sf_dir):
    """Compressed-domain shortlist + exact rerank must keep most of the
    true top-10 (the PQ paper's regime: ADC prunes, rerank fixes)."""
    from vector_search_go_spark.queries_pipeline import pq_recall_vs_exact

    rows = pq_recall_vs_exact(spark, sf_dir).collect()
    assert rows
    avg = sum(r["recall"] for r in rows) / len(rows)
    assert avg >= 0.7, avg


def test_trained_codebook_shape_and_recall(spark, sf_dir):
    """k-means-trained codebooks keep the (sub, code, cvec) contract and
    must not lose recall versus the sampled codebook at the same
    shortlist (measured gain at sf0.1: 0.8875 -> 0.9525)."""
    from vector_search_go_spark.operators.pq import pq_codebook_trained
    from vector_search_go_spark.queries_pipeline import (
        pq_recall_vs_exact,
        pq_trained_recall_vs_exact,
    )

    emb = _emb(spark, sf_dir)
    allv = emb.select(F.col("vec_id").alias("id"), F.col("embedding").alias("vec"))
    cb = pq_codebook_trained(allv, iters=1).collect()
    assert {r["sub"] for r in cb} == set(range(M_SUB))
    per_sub = {}
    for r in cb:
        per_sub.setdefault(r["sub"], set()).add(r["code"])
        assert len(r["cvec"]) == D_SUB
    n = allv.count()
    for sub, codes in per_sub.items():
        assert codes == set(range(min(N_CODES, n))), sub

    sampled = pq_recall_vs_exact(spark, sf_dir).collect()
    trained = pq_trained_recall_vs_exact(spark, sf_dir).collect()
    avg_s = sum(r["recall"] for r in sampled) / len(sampled)
    avg_t = sum(r["recall"] for r in trained) / len(trained)
    assert avg_t >= avg_s - 0.05, (avg_s, avg_t)
    assert avg_t >= 0.7, avg_t


def test_ivf_pq_composition(spark, sf_dir):
    """Composed index: valid ranked output, and every hit must come
    from a probed cell (the coarse layer really prunes)."""
    from vector_search_go_spark.queries_pipeline import (
        ivf_pq_recall_vs_exact,
        ivf_pq_search,
    )

    rows = ivf_pq_search(spark, sf_dir).collect()
    assert rows
    per_q = {}
    for r in rows:
        per_q.setdefault(r["query_id"], []).append((r["rn"], r["dist"]))
    for q, hits in per_q.items():
        hits.sort()
        assert [rn for rn, _ in hits] == list(range(1, len(hits) + 1))
        dists = [d for _, d in hits]
        assert dists == sorted(dists)
    rec = ivf_pq_recall_vs_exact(spark, sf_dir).collect()
    avg = sum(r["recall"] for r in rec) / len(rec)
    # trained k=32 cells, nprobe=16: ~0.87 measured; floor with margin
    assert avg >= 0.7, avg


def test_ivfpq_point_search_store(spark, tmp_path):
    """Saved IVFADC store: with every cell probed and a corpus-sized
    shortlist the exact rerank makes the point lookup bit-identical to
    exact KNN; at partial nprobe it returns k well-formed rows whose
    ids come from the probed cells' members only."""
    from pyspark.sql import functions as F

    from vector_search_go_spark.operators.ann_ivf import probe_cells_for
    from vector_search_go_spark.operators.exact_knn import exact_knn_join
    from vector_search_go_spark.operators.pq import (
        ivfpq_point_search,
        ivfpq_save,
        pq_codebook,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    corpus = emb.filter("vec_id % 50 != 0").selectExpr(
        "vec_id as id", "cast(embedding as array<double>) as vec"
    )
    cents = emb.filter("vec_id % 125 = 0").selectExpr(
        "cast(vec_id / 125 as int) as cid", "cast(embedding as array<double>) as cvec"
    )
    n_cells = cents.count()
    n_corpus = corpus.count()
    path = str(tmp_path / "ivfpq")
    ivfpq_save(spark, corpus, cents, pq_codebook(emb), path, metric="l2")

    qvec = [float(x) for x in emb.filter("vec_id % 50 = 0").limit(1).collect()[0]["embedding"]]
    queries = spark.createDataFrame([(0, qvec)], "query_id bigint, qvec array<double>")

    full = ivfpq_point_search(
        spark, path, qvec, "l2", k=5, nprobe=n_cells, shortlist=n_corpus
    )
    exact = exact_knn_join(queries, corpus, metric="l2", k=5)
    assert sorted(map(tuple, full.collect())) == sorted(map(tuple, exact.collect()))

    part = ivfpq_point_search(spark, path, qvec, "l2", k=5, nprobe=2).collect()
    assert len(part) == 5 and [r["rn"] for r in sorted(part, key=lambda r: r["rn"])] == [1, 2, 3, 4, 5]
    probed = probe_cells_for(spark, f"{path}/centroids", qvec, "l2", 2)
    members = {
        r["id"]
        for r in spark.read.parquet(f"{path}/cells")
        .filter(F.col("cell").isin(probed))
        .collect()
    }
    assert {r["id"] for r in part} <= members


def test_ivfpq_preloaded_models_and_pushed_rerank(spark, tmp_path):
    """models= must skip the per-call model collects without changing
    results, and the rerank must push `id IN` into the vectors scan."""
    import contextlib
    import io as _io

    from vector_search_go_spark.operators.pq import (
        ivfpq_point_search,
        ivfpq_save,
        load_ivfpq_models,
        pq_codebook,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    corpus = emb.selectExpr("vec_id as id", "cast(embedding as array<double>) as vec")
    cents = emb.filter("vec_id % 125 = 0").selectExpr(
        "cast(vec_id / 125 as int) as cid", "cast(embedding as array<double>) as cvec"
    )
    path = str(tmp_path / "ivfpq2")
    ivfpq_save(spark, corpus, cents, pq_codebook(emb), path, metric="l2")
    qvec = [float(x) for x in emb.limit(1).collect()[0]["embedding"]]

    cold = ivfpq_point_search(spark, path, qvec, "l2", k=5, nprobe=2).collect()
    models = load_ivfpq_models(spark, path)
    warm = ivfpq_point_search(
        spark, path, qvec, "l2", k=5, nprobe=2, models=models
    ).collect()
    assert sorted(map(tuple, cold)) == sorted(map(tuple, warm))

    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        ivfpq_point_search(
            spark, path, qvec, "l2", k=5, nprobe=2, models=models
        ).explain("formatted")
    plan = buf.getvalue()
    assert any("In(id" in seg for seg in plan.split("PushedFilters: [")[1:])

    import pytest as _pytest

    with _pytest.raises(ValueError, match="squared L2"):
        ivfpq_point_search(spark, path, qvec, "cosine", k=5)


def test_adc_shortlist_probe_floor_and_retune(spark, tmp_path):
    """adc_shortlist_probe (VERDICT r5 item 4): on a corpus whose ADC
    ranking is good — tight, well-separated clusters — the measured
    budget stays AT the pq_shortlist floor (no cost added at scale for
    well-structured stores); a store that never ran the probe resolves
    shortlist=None to the plain floor (_stored_shortlist None); and the
    probe is deterministic (same store -> same recommendation)."""
    import numpy as np

    from vector_search_go_spark.operators.kmeans import kmeans_fit
    from vector_search_go_spark.operators.pq import (
        _stored_shortlist,
        adc_shortlist_probe,
        ivfpq_save,
        pq_codebook_trained,
        pq_shortlist,
    )

    rng = np.random.default_rng(11)
    centers = rng.standard_normal((8, M_SUB * D_SUB)) * 50.0
    X = np.vstack([c + 0.1 * rng.standard_normal((60, M_SUB * D_SUB)) for c in centers])
    corpus = spark.createDataFrame(
        [(int(i), X[i].tolist()) for i in range(len(X))],
        "id bigint, vec array<double>",
    )
    cents = kmeans_fit(corpus, 8, iters=2, dim=M_SUB * D_SUB)
    cb = pq_codebook_trained(corpus, iters=2)
    path = str(tmp_path / "clustered")
    ivfpq_save(spark, corpus, cents, cb, path, metric="l2")

    assert _stored_shortlist(spark, path) is None  # plain save: no probe ran
    rep1 = adc_shortlist_probe(spark, path)
    rep2 = adc_shortlist_probe(spark, path)
    assert rep1 == rep2  # seeded sample + deterministic ranking
    assert rep1["recommended_shortlist"] == pq_shortlist(10)
    assert rep1["n_store"] == len(X)
    assert 0.0 < rep1["shortlist_frac"] <= 1.0


def test_residual_encoding_beats_raw_on_clustered_corpus(spark, tmp_path):
    """The r10 residual claim, measured: on a clustered corpus (the
    geometry real embeddings have), IVFADC with residual-encoded codes
    reaches strictly higher recall@10 than raw-vector codes at the SAME
    (nprobe, shortlist) budget — the codebook spends its 128 codewords
    on within-cell variance instead of the inter-center spread. Both
    stores share the coarse model, so the delta is the encoding alone."""
    import numpy as np
    from pyspark.sql import functions as F

    from vector_search_go_spark.operators.pq import (
        ivfpq_save,
        pq_codebook_residual,
        pq_codebook_trained,
    )
    from vector_search_go_spark.serve.local_reader import LocalIvfPqReader

    rng = np.random.default_rng(5)
    n_centers, per, dims = 16, 120, 64
    centers = rng.normal(size=(n_centers, dims)) * 6.0
    X = np.repeat(centers, per, axis=0) + 0.25 * rng.standard_normal(
        (n_centers * per, dims)
    )
    n = len(X)
    corpus = spark.createDataFrame(
        [(int(i), X[i].tolist()) for i in range(n)],
        "id bigint, vec array<double>",
    )
    cents = spark.createDataFrame(
        [(int(c), centers[c].tolist()) for c in range(n_centers)],
        "cid int, cvec array<double>",
    )
    cb_raw = pq_codebook_trained(corpus, iters=2)
    cb_raw = spark.createDataFrame(cb_raw.collect(), cb_raw.schema)
    cb_res = pq_codebook_residual(corpus, cents, iters=2)
    cb_res = spark.createDataFrame(cb_res.collect(), cb_res.schema)
    p_raw = str(tmp_path / "raw")
    p_res = str(tmp_path / "res")
    ivfpq_save(spark, corpus, cents, cb_raw, p_raw, encoding="raw")
    ivfpq_save(spark, corpus, cents, cb_res, p_res, encoding="residual")

    r_raw = LocalIvfPqReader(p_raw, preload_codes=True, preload_vectors=True)
    r_res = LocalIvfPqReader(p_res, preload_codes=True, preload_vectors=True)
    assert r_raw.encoding == "raw" and r_res.encoding == "residual"
    qidx = list(range(0, n, n // 24))[:24]
    k, shortlist = 10, 20  # tight budget: ADC rank quality is the test
    hits_raw = hits_res = 0
    for qi in qidx:
        q = X[qi]
        exact = ((X - q) ** 2).sum(axis=1)
        truth = set(np.lexsort((np.arange(n), exact))[:k].tolist())
        got_raw = set(
            int(i) for i in r_raw.search(q, k=k, nprobe=2, shortlist=shortlist)["id"]
        )
        got_res = set(
            int(i) for i in r_res.search(q, k=k, nprobe=2, shortlist=shortlist)["id"]
        )
        hits_raw += len(got_raw & truth)
        hits_res += len(got_res & truth)
    rec_raw = hits_raw / (k * len(qidx))
    rec_res = hits_res / (k * len(qidx))
    # the margin is the point of the whole change — not a tie-break
    assert rec_res > rec_raw + 0.1, (rec_res, rec_raw)
    # residue of the loss is coarse-probe misses at nprobe=2 (cluster
    # boundary queries), not ADC rank error — 0.85 with a >0.1 margin
    # over raw is the encoding claim
    assert rec_res >= 0.85, rec_res


def test_store_meta_encoding_guard_and_merge(spark, tmp_path):
    """VERDICT r10 item 5: a store_meta rewritten from scratch (the two
    in-round r10 test bugs) drops the 'encoding' tag and silently flips
    readers to raw-LUT scoring of residual codes — store_encoding must
    WARN when an ivfpq store lacks the tag, and merge_store_meta is the
    rewrite path that can't lose it."""
    import json
    import warnings

    from vector_search_go_spark.operators.pq import (
        ivfpq_save,
        merge_store_meta,
        pq_codebook_residual,
        read_store_meta_any,
        store_encoding,
    )
    from vector_search_go_spark.operators.kmeans import kmeans_fit

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    corpus = emb.limit(200).selectExpr(
        "vec_id as id", "cast(embedding as array<double>) as vec"
    )
    cents = kmeans_fit(corpus, k=4, iters=1)
    cb = pq_codebook_residual(corpus, cents, iters=1)
    path = str(tmp_path / "store")
    ivfpq_save(spark, corpus, cents, cb, path, metric="l2")

    # fresh save carries the tag: no warning, residual
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        assert store_encoding(spark, path) == "residual"

    # merge preserves unknown keys (the tag survives a shortlist persist)
    merged = merge_store_meta(spark, path, {"recommended_shortlist": 64})
    assert merged["encoding"] == "residual" and merged["family"] == "ivfpq"
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        assert store_encoding(spark, path) == "residual"
    assert read_store_meta_any(spark, path)["recommended_shortlist"] == 64

    # the bug: a from-scratch rewrite losing the tag -> warn, assume raw
    spark.createDataFrame(
        [(json.dumps({"family": "ivfpq", "metric": "l2"}),)],
        "meta_json string",
    ).coalesce(1).write.mode("overwrite").json(f"{path}/store_meta")
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        assert store_encoding(spark, path) == "raw"
    assert any("no 'encoding' tag" in str(x.message) for x in w)


def test_auto_n_probes_warns_beyond_guarantee():
    """ADVICE r10: tau beyond 2*n_bands-1 has no radius-1 guarantee —
    'auto' must warn instead of silently going probabilistic."""
    import warnings

    from vector_search_go_spark.operators.multimodal import auto_n_probes

    with warnings.catch_warnings():
        warnings.simplefilter("error")
        assert auto_n_probes(4, 15, 7) == 15  # tau <= 2*4-1: silent
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        assert auto_n_probes(4, 15, 8) == 15  # beyond: warn, keep widest
    assert any("probabilistic" in str(x.message) for x in w)


def test_adc_probe_cell_sampling_on_clustered_corpus(spark, tmp_path):
    """VERDICT r10 item 2: on a clustered corpus a sparse UNIFORM
    sample holds ~2 rows/cluster, so sampled 'neighbors' are
    cross-cluster and the measured budget overshoots the knee; the
    default cell-local sample takes whole coarse cells (true local
    density) and its two-rate extrapolation lands on the exact-measure
    fraction."""
    import numpy as np

    from vector_search_go_spark.operators.pq import (
        adc_shortlist_probe,
        ivfpq_save,
        pq_codebook_residual,
    )

    rng = np.random.default_rng(11)
    n_cl, per, dims = 200, 50, 64
    centers = rng.normal(size=(n_cl, dims)) * 2.0
    X = np.repeat(centers, per, axis=0) + 0.02 * rng.normal(
        size=(n_cl * per, dims)
    )
    n = len(X)
    corpus = spark.createDataFrame(
        [(int(i), X[i].tolist()) for i in range(n)],
        "id bigint, vec array<double>",
    )
    cents = spark.createDataFrame(
        [(int(c), centers[c].tolist()) for c in range(n_cl)],
        "cid int, cvec array<double>",
    )
    cb = pq_codebook_residual(corpus, cents, iters=2)
    cb = spark.createDataFrame(cb.collect(), cb.schema)
    path = str(tmp_path / "store")
    ivfpq_save(spark, corpus, cents, cb, path, metric="l2")

    # exact measure: the whole store as the sample (either mode is
    # exact there) — the knee the probe should land near
    full = adc_shortlist_probe(spark, path, sample_rows=n, sample_mode="uniform")
    uni = adc_shortlist_probe(spark, path, sample_rows=400, sample_mode="uniform")
    cel = adc_shortlist_probe(spark, path, sample_rows=400)  # default: cells
    assert cel["sample_mode"] == "cells" and cel["n_sample"] <= 2 * 400
    # the r10 pathology: sparse uniform overshoots the exact fraction
    assert uni["shortlist_frac"] > 4 * full["shortlist_frac"]
    # the fix: cell-local lands within 2x of the exact measure
    assert cel["shortlist_frac"] <= 2 * full["shortlist_frac"]
    assert cel["shortlist_frac"] >= full["shortlist_frac"] / 2
    # and never under-recommends vs the measured knee's budget
    assert cel["recommended_shortlist"] >= full["recommended_shortlist"]
    # determinism: a pure function of the store (re-run identical)
    assert adc_shortlist_probe(spark, path, sample_rows=400) == cel
