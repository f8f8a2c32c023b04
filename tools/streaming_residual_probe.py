"""1M-scale residual streaming receipt (VERDICT r10 item 6).

The arrival-to-servable cycle — (id, vec) stream -> sharded RESIDUAL
IVFADC store — is integration-tested at toy scale; this probe measures
it at 1M rows with a drifted tail and answers the open question: does
frozen-model residual ingest decay recall as the corpus drifts from the
training sample?

Protocol (all deterministic, seeded):
  1. BASE corpus: 800k rows, 512 Gaussian clusters (sigma 0.25 — the
     contrastive geometry real embedding corpora have). Models trained
     on a ~200k sample; ivfpq_save(shards=4, encoding residual).
  2. DRIFTED tail: 200k rows — 80% from the same mixture, 20% from 64
     NEW clusters the coarse model never saw. Landed as parquet and
     drained through ingest_to_sharded_store (frozen centroids + frozen
     residual codebook; streamed codes are bit-identical to a batch
     re-save through the same kernels). Throughput reported.
  3. GATE: maintain_ivfpq's TV-distance staleness verdict on the
     ingested store — the same trigger the scheduled ingest_cycle uses.
  4. RECALL: exact ground truth over the full 1M (driver-side GEMM) for
     60 queries drawn from the streamed tail (40 same-mixture, 20
     new-cluster) + 20 base members; recall@10 through the sharded
     router at the floor budget, on (a) the ingested store and (b) a
     full REBUILT store whose models saw all 1M rows — the decay, if
     any, is (b) minus (a).

Run: python tools/streaming_residual_probe.py [n_base n_stream dims]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SEED = 23
BASE_DIR = "/tmp/stream_res"


def make_corpora(n_base: int, n_stream: int, dims: int):
    rng = np.random.default_rng(SEED)
    centers = rng.normal(size=(512, dims)) * 2.0
    new_centers = rng.normal(size=(64, dims)) * 2.0
    a_base = rng.integers(0, len(centers), size=n_base)
    Xb = centers[a_base] + 0.25 * rng.normal(size=(n_base, dims))
    n_same = int(0.8 * n_stream)
    a_same = rng.integers(0, len(centers), size=n_same)
    a_new = rng.integers(0, len(new_centers), size=n_stream - n_same)
    Xs = np.concatenate(
        [
            centers[a_same] + 0.25 * rng.normal(size=(n_same, dims)),
            new_centers[a_new]
            + 0.25 * rng.normal(size=(n_stream - n_same, dims)),
        ]
    )
    return Xb, Xs, n_same


def main(n_base: int = 800_000, n_stream: int = 200_000, dims: int = 64):
    from pyspark.sql import functions as F

    from tools.scale_probe import land_corpus
    from vector_search_go_spark.operators.kmeans import kmeans_fit
    from vector_search_go_spark.operators.pq import (
        default_k_cells,
        ivfpq_save,
        pq_codebook_residual,
    )
    from vector_search_go_spark.serve.sharded import ShardedReader
    from vector_search_go_spark.session import get_spark
    from vector_search_go_spark.streaming.ingest import ingest_to_sharded_store
    from vector_search_go_spark.streaming.maintain import maintain_ivfpq

    spark = get_spark(
        "stream-res-probe", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    )
    spark.sparkContext.setLogLevel("ERROR")
    if os.path.exists(BASE_DIR):
        shutil.rmtree(BASE_DIR)
    os.makedirs(BASE_DIR)

    Xb, Xs, n_same = make_corpora(n_base, n_stream, dims)
    n = n_base + n_stream
    k_cells = default_k_cells(n_base)

    # -- 1. base store (models see ONLY the base corpus) --------------
    base = land_corpus(spark, Xb)
    t0 = time.time()
    sample = base.filter(F.col("id") % 4 == 0).cache()
    sample.count()
    cents = kmeans_fit(sample, k_cells, iters=3, dim=dims)
    cents = spark.createDataFrame(cents.collect(), cents.schema)
    cb = pq_codebook_residual(sample, cents)
    cb = spark.createDataFrame(cb.collect(), cb.schema)
    sample.unpersist()
    t_models = time.time() - t0
    path = f"{BASE_DIR}/store"
    t0 = time.time()
    ivfpq_save(spark, base, cents, cb, path, metric="l2", shards=4)
    t_save = time.time() - t0
    print(f"# base store: models {t_models:.0f} s + save {t_save:.0f} s "
          f"({n_base:,} rows, {k_cells} cells, residual)", flush=True)

    # -- 2. drain the drifted tail through the frozen models ----------
    land = f"{BASE_DIR}/landing"
    os.makedirs(land)
    import pyarrow as pa
    import pyarrow.parquet as papq

    files = 8
    per = (n_stream + files - 1) // files
    for fi in range(files):
        lo, hi = fi * per, min(n_stream, (fi + 1) * per)
        tbl = pa.table(
            {
                "id": pa.array(
                    np.arange(n_base + lo, n_base + hi), type=pa.int64()
                ),
                "vec": pa.FixedSizeListArray.from_arrays(
                    pa.array(Xs[lo:hi].reshape(-1)), dims
                ).cast(pa.list_(pa.float64())),
            }
        )
        papq.write_table(tbl, f"{land}/part{fi}.parquet")
    stream = spark.readStream.schema("id bigint, vec array<double>").parquet(
        land
    )
    t0 = time.time()
    ingest_to_sharded_store(
        spark, stream, path, f"{BASE_DIR}/ckpt", timeout=600
    )
    t_drain = time.time() - t0
    print(
        f"| residual stream drain | {n_stream:,} rows x {dims} -> 4-shard "
        f"residual store | {t_drain:.0f} s | "
        f"{n_stream / t_drain:,.0f} rows/s |",
        flush=True,
    )

    # -- 3. the staleness gate on the ingested store ------------------
    t0 = time.time()
    rep = maintain_ivfpq(spark, path)
    print(
        f"| post-ingest staleness gate | action={rep.get('action')} "
        f"tv_drift={rep.get('tv_drift')} growth={rep.get('growth')} | "
        f"{time.time() - t0:.0f} s |",
        flush=True,
    )

    # -- 4. recall: ingested (frozen models) vs rebuilt (full retrain) -
    X_all = np.concatenate([Xb, Xs])
    rng = np.random.default_rng(SEED + 1)
    q_same = n_base + rng.choice(n_same, size=40, replace=False)
    q_new = n_base + n_same + rng.choice(
        n_stream - n_same, size=20, replace=False
    )
    q_base = rng.choice(n_base, size=20, replace=False)
    qids = np.concatenate([q_base, q_same, q_new]).astype(np.int64)
    Q = X_all[qids]
    # exact ground truth, one GEMM block pass
    truth = {}
    k = 10
    sq_all = (X_all * X_all).sum(axis=1)
    for bi in range(0, len(qids), 20):
        qb = Q[bi : bi + 20]
        D = sq_all[None, :] - 2.0 * (qb @ X_all.T) + (qb * qb).sum(axis=1)[:, None]
        for j in range(len(qb)):
            truth[int(qids[bi + j])] = set(
                np.lexsort((np.arange(n), D[j]))[:k].tolist()
            )

    rebuilt = f"{BASE_DIR}/rebuilt"
    full = land_corpus(spark, X_all)
    t0 = time.time()
    sample = full.filter(F.col("id") % 5 == 0).cache()
    sample.count()
    cents2 = kmeans_fit(sample, default_k_cells(n), iters=3, dim=dims)
    cents2 = spark.createDataFrame(cents2.collect(), cents2.schema)
    cb2 = pq_codebook_residual(sample, cents2)
    cb2 = spark.createDataFrame(cb2.collect(), cb2.schema)
    sample.unpersist()
    ivfpq_save(spark, full, cents2, cb2, rebuilt, metric="l2", shards=4)
    print(f"# rebuilt store (full retrain): {time.time() - t0:.0f} s",
          flush=True)
    spark.stop()

    for tag, p in (("ingested (frozen models)", path), ("rebuilt", rebuilt)):
        reader = ShardedReader(p, processes=True, preload_codes=True)
        try:
            groups = {
                "base": q_base.tolist(),
                "streamed-same": (q_same).tolist(),
                "streamed-new": (q_new).tolist(),
            }
            for gname, gids in groups.items():
                recs, lats = [], []
                for qid in gids:
                    qv = X_all[int(qid)]
                    t0 = time.time()
                    top = reader.search(qv, k=k, nprobe=8)
                    lats.append((time.time() - t0) * 1000)
                    got = set(int(i) for i in top["id"][:k])
                    recs.append(len(got & truth[int(qid)]) / k)
                lats.sort()
                print(
                    f"| residual stream recall | {tag} | {gname} | "
                    f"recall@10 {float(np.mean(recs)):.4f} | "
                    f"{lats[len(lats) // 2]:.1f} ms/q median "
                    f"({len(gids)} q) |",
                    flush=True,
                )
        finally:
            reader.close()


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:]]
    main(*args)
