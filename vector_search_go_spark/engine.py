"""User-facing engine facade.

API parity with the reference's public surface so a user of
``gasparian/lsh-search-go`` can switch 1:1 (SURVEY.md section 2 O1,
O16, O20, O26):

  reference                               here
  ---------                               ----
  NewLsh(config, store, metric)       ->  VectorSearchEngine(spark, config, metric)
  lsh.Train(vecs, ids)                ->  engine.train(df)        [lsh/lsh.go:106-134]
  lsh.Search(query, maxNN, thresh)    ->  engine.search(queries_df, k, threshold)
                                          [lsh/lsh.go:137-197]
  NNMock (exact Indexer)              ->  backend="exact"         [annbench.go:56-125]
  DumpHasher()/LoadHasher()           ->  engine.save(path) / VectorSearchEngine.load(...)
                                          [lsh/lsh.go:200-207]
  store.Store (pluggable KV)          ->  parquet path convention; any Spark
                                          datasource works        [store/store.go:12-18]

Single-vector convenience search mirrors the reference's one-query
call; the batch DataFrame form is the native shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_search_go_spark.config import LshConfig
from vector_search_go_spark.functions.metrics import is_angular
from vector_search_go_spark.lsh.index import LshIndex
from vector_search_go_spark.lsh.search import lsh_search
from vector_search_go_spark.operators.exact_knn import exact_knn_join


def _store_has(spark: SparkSession, path: str, sub: str) -> bool:
    """Whether a saved store carries component ``sub`` — the layout
    probe load() and maintain() route by. Remote-aware: os.path can't
    see s3://-style paths, so there a schema-only spark read probes."""
    import os as _os

    p = _os.path.join(path, sub)
    if _os.path.exists(p):
        return True
    if "://" in path:
        try:
            spark.read.parquet(p).schema
            return True
        except Exception:
            return False
    return False


class VectorSearchEngine:
    """metric: 'l2' or 'cosine' (reference Metric interface, lsh/lsh.go:48-51).
    backend: 'lsh' (the index), 'ivf' (coarse-quantizer index), or
    'exact' (NNMock-equivalent oracle). ``train(df, auto=True)`` picks
    the backend by MEASUREMENT (operators.tune.advisor_report)."""

    def __init__(
        self,
        spark: SparkSession,
        config: LshConfig | None = None,
        metric: str = "l2",
        backend: str = "lsh",
        ivf_cells: int = 16,
        ivf_nprobe: int = 4,
    ):
        if backend not in ("lsh", "exact", "ivf"):
            raise ValueError(f"unknown backend {backend!r}")
        self.spark = spark
        self.metric = metric
        self.backend = backend
        if config is not None and config.is_angular != is_angular(metric):
            # NewLsh copies metric.IsAngular() into the hasher config
            # (lsh/lsh.go:96-100); keep that coupling authoritative.
            config = LshConfig(
                dims=config.dims,
                n_trees=config.n_trees,
                k_min_vecs=config.k_min_vecs,
                is_angular=is_angular(metric),
                max_candidates=config.max_candidates,
                seed=config.seed,
                sample_size=config.sample_size,
                max_bucket_size=config.max_bucket_size,
            )
        self.config = config
        self.ivf_cells = ivf_cells
        self.ivf_nprobe = ivf_nprobe
        self._index: LshIndex | None = None
        self._vectors: DataFrame | None = None
        self._cents: DataFrame | None = None
        self._cells: DataFrame | None = None
        self.advisor_decision: dict | None = None

    # -- Train (lsh/lsh.go:106-134; Train clears prior state) ---------

    def train(
        self,
        df: DataFrame,
        id_col: str = "id",
        vec_col: str = "vec",
        auto: bool = False,
        probe_rows: int = 5_000,
        probe_queries: int = 20,
        recall_band: float = 0.85,
        probe_threshold: float | None = None,
        max_useful_frac: float | None = 0.33,
    ) -> None:
        """``auto=True`` picks the backend by measurement before
        training (VERDICT r4 item 4): advisor_report runs on a bounded
        seeded sample (``probe_rows`` corpus rows x ``probe_queries``
        member queries — at 100 TB this is one partition's worth, never
        the corpus), and the cheapest config inside ``recall_band``
        wins — exact scan / LSH / IVF. The decision, with its measured
        (eps_recall, cand_frac), lands in ``self.advisor_decision`` and
        is persisted by save(). The reference hardcodes this judgment
        per dataset (annbench_test.go:215-260); the SCALE.md angular
        probes showed near-uniform corpora admit NO pruning index, so
        the choice must be measured, not assumed.

        ``probe_threshold``: the MaxDist the workload will search with
        (reference Search's distanceThrsh, lsh/lsh.go:137). Pass it when
        known — on high-dimensional near-uniform corpora distances
        concentrate, so WITHOUT a threshold the eps-relaxed recall is
        trivially in-band for any candidate set and the probe cannot
        distinguish a pruning index from a useless one (the SCALE.md
        angular probes all measure at the reference's MaxDist for the
        same reason).

        ``max_useful_frac``: break-even gate — an in-band index config
        whose candidate fraction exceeds it loses to the scan anyway
        (full hashing + bucket join + trees-factor store for <3x
        pruning; the SCALE.md GloVe row measured scan 13x FASTER at
        frac 0.447 despite in-band recall, while frac 0.028 configs
        win 23x). Default 0.33 sits between those measurements; None
        restores fraction-only ranking."""
        vectors = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
        self._vectors = vectors
        if auto:
            self._auto_pick(
                vectors, probe_rows, probe_queries, recall_band,
                probe_threshold, max_useful_frac,
            )
        if self.backend == "lsh":
            if self.config is None:
                raise ValueError("backend='lsh' requires an LshConfig")
            self._index = LshIndex.train(self.spark, vectors, self.config)
        elif self.backend == "ivf":
            self._train_ivf(vectors)

    def _train_ivf(self, vectors: DataFrame) -> None:
        from vector_search_go_spark.operators.ann_ivf import assign_cells
        from vector_search_go_spark.operators.kmeans import kmeans_fit

        dims = len(vectors.select("vec").head()["vec"])
        cents = kmeans_fit(vectors, self.ivf_cells, iters=3, dim=dims)
        self._cents = self.spark.createDataFrame(cents.collect(), cents.schema)
        self._cells = assign_cells(vectors, self._cents, metric=self.metric)

    def _auto_pick(
        self, vectors: DataFrame, probe_rows: int, probe_queries: int,
        recall_band: float, probe_threshold: float | None = None,
        max_useful_frac: float | None = 0.33,
    ) -> None:
        from vector_search_go_spark.operators.tune import advisor_report

        # size the sample from a BOUNDED count (limit early-terminates
        # the scan), never a full vectors.count() — the probe contract
        # is one partition's worth of work, and at corpus scale an
        # exact count is itself a full pass. Past the cap the fraction
        # is computed against the lower bound (over-sampling slightly)
        # and the trailing limit() short-circuits the sampled scan at
        # probe_rows rows.
        n = vectors.limit(50 * probe_rows).count()
        probe = vectors
        if n > probe_rows:
            probe = vectors.sample(
                fraction=min(1.0, 1.2 * probe_rows / n), seed=7
            ).limit(probe_rows)
        probe = probe.cache()
        queries = (
            probe.orderBy("id")
            .limit(probe_queries)
            .select(F.col("id").alias("query_id"), F.col("vec").alias("qvec"))
        )
        report = advisor_report(
            self.spark, probe, queries, metric=self.metric,
            threshold=probe_threshold,
            recall_band=recall_band,
            lsh_configs=((8, 50), (16, 50)),
            ivf_configs=((self.ivf_cells, self.ivf_nprobe),),
            max_useful_frac=max_useful_frac,
        )
        best = report.filter(F.col("recommended")).collect()[0]
        probe.unpersist()
        self.advisor_decision = {
            "family": best["family"],
            "config": best["config"],
            "eps_recall": float(best["eps_recall"]),
            "cand_frac": float(best["cand_frac"]),
        }
        kv = dict(
            p.split("=") for p in best["config"].split(",") if "=" in p
        )
        if best["family"] == "exact":
            self.backend = "exact"
        elif best["family"] == "lsh":
            self.backend = "lsh"
            dims = len(vectors.select("vec").head()["vec"])
            old = self.config
            # only the measured knobs (trees, k_min) come from the
            # advisor; every user-set field of an existing config —
            # candidate cap, seed, sample size, hot-bucket bound —
            # carries over (the constructor's is_angular rebuild
            # preserves the same set)
            self.config = LshConfig(
                dims=dims,
                n_trees=int(kv["trees"]),
                k_min_vecs=int(kv["k_min"]),
                is_angular=is_angular(self.metric),
                max_candidates=old.max_candidates if old else None,
                seed=old.seed if old else 42,
                sample_size=old.sample_size if old else 100_000,
                max_bucket_size=old.max_bucket_size if old else None,
            )
        else:
            self.backend = "ivf"
            self.ivf_cells = int(kv["cells"])
            self.ivf_nprobe = int(kv["nprobe"])

    # -- Search (lsh/lsh.go:137-197 / annbench.go:86-125) -------------

    def search(
        self,
        queries: DataFrame,
        k: int = 10,
        threshold: float | None = None,
        query_id_col: str = "query_id",
        qvec_col: str = "qvec",
    ) -> DataFrame:
        if self._vectors is None:
            raise RuntimeError("train() first")
        q = queries.select(
            F.col(query_id_col).alias("query_id"), F.col(qvec_col).alias("qvec")
        )
        if self.backend == "exact":
            return exact_knn_join(q, self._vectors, self.metric, k, threshold)
        if self.backend == "ivf":
            from vector_search_go_spark.operators.ann_ivf import ivf_search

            assert self._cells is not None and self._cents is not None
            out = ivf_search(
                q, self._cells, self._cents, metric=self.metric, k=k,
                nprobe=self.ivf_nprobe,
            )
            if threshold is not None:
                out = out.filter(F.col("dist") <= F.lit(float(threshold)))
            return out
        assert self._index is not None
        return lsh_search(self._index, q, self.metric, k, threshold)

    def search_vector(
        self, vec: list[float], k: int = 10, threshold: float | None = None
    ) -> list:
        """Single-query convenience (the reference's Search signature)."""
        q = self.spark.createDataFrame(
            [(0, [float(x) for x in vec])], "query_id bigint, qvec array<double>"
        )
        return self.search(q, k, threshold).orderBy("rn").collect()

    def point_search(
        self,
        path: str,
        vec: list[float],
        k: int = 10,
        threshold: float | None = None,
    ) -> list:
        """Serve ONE query from a saved index directory (the
        reference's single-query Search against its store): pruned
        bucket reads instead of streaming the store — see
        lsh.search.lsh_point_search. Results are bit-identical to
        search_vector on the live index."""
        from vector_search_go_spark.lsh.search import lsh_point_search

        forest = self._index.forest if self._index is not None else None
        return (
            lsh_point_search(
                self.spark,
                path,
                vec,
                metric=self.metric,
                k=k,
                threshold=threshold,
                forest=forest,
            )
            .orderBy("rn")
            .collect()
        )

    def local_reader(
        self,
        path: str,
        preload_buckets: bool = False,
        preload_cells: bool = False,
    ):
        """Driver-side serving reader over a SAVED index dir — point
        lookups with no Spark job (serve.local_reader; bit-identical
        to point_search on the same store). The reference's serving
        regime (in-process Search over an in-memory store,
        lsh/lsh.go:137-197) rebuilt from the engine's own artifacts.
        ``preload_buckets=True`` (LSH) / ``preload_cells=True`` (IVF)
        additionally pin the bucket/cell arrays in reader RAM — the
        fully in-memory regime, ~11-27 ms/query at 1M (SCALE.md
        serving table). A path carrying ``shards_meta`` (saved with
        shards=N) routes to the ShardedReader router over the same
        family's per-shard readers (serve/sharded.py)."""
        from vector_search_go_spark.serve.sharded import (
            ShardedReader,
            read_shards_meta,
        )

        smeta = read_shards_meta(path) if "://" not in path else None
        if smeta is not None:
            # same guards as the single-store branches below: wrong
            # preload flag for the backend, and a backend/store family
            # mismatch, must fail as loudly sharded as unsharded
            want_family = {"exact": "scan", "ivf": "ivf", "lsh": "lsh"}[
                self.backend
            ]
            if smeta.get("family") != want_family:
                raise ValueError(
                    f"sharded store at {path!r} holds family "
                    f"{smeta.get('family')!r}, not the {want_family!r} "
                    f"layout backend={self.backend!r} serves"
                )
            if self.backend == "lsh":
                if preload_cells:
                    raise ValueError(
                        "preload_cells is the IVF reader's flag; an lsh "
                        "backend pins its store with preload_buckets=True"
                    )
                kw = dict(metric=self.metric, preload_buckets=preload_buckets)
            elif self.backend == "ivf":
                if preload_buckets:
                    raise ValueError(
                        "preload_buckets is the LSH reader's flag; an ivf "
                        "backend pins its store with preload_cells=True"
                    )
                kw = dict(metric=self.metric, preload_cells=preload_cells)
            else:
                if preload_buckets or preload_cells:
                    raise ValueError(
                        "preload flags are index-reader knobs; a scan "
                        "reader is always fully in-memory (a scan touches "
                        "every row by definition)"
                    )
                kw = dict(metric=self.metric)
            return ShardedReader(path, **kw)
        if self.backend == "exact":
            if preload_buckets or preload_cells:
                raise ValueError(
                    "preload flags are index-reader knobs; a scan "
                    "reader is always fully in-memory (a scan touches "
                    "every row by definition)"
                )
            from vector_search_go_spark.serve.local_reader import LocalScanReader

            return LocalScanReader(path, metric=self.metric)
        if self.backend == "ivf":
            if preload_buckets:
                raise ValueError(
                    "preload_buckets is the LSH reader's flag; an ivf "
                    "backend pins its store with preload_cells=True"
                )
            from vector_search_go_spark.serve.local_reader import LocalIvfReader

            return LocalIvfReader(
                path, metric=self.metric, preload_cells=preload_cells
            )
        if preload_cells:
            raise ValueError(
                "preload_cells is the IVF reader's flag; an lsh backend "
                "pins its store with preload_buckets=True"
            )
        from vector_search_go_spark.serve.local_reader import LocalLshReader

        return LocalLshReader(
            path, metric=self.metric, preload_buckets=preload_buckets
        )

    # -- Maintenance ---------------------------------------------------

    @staticmethod
    def compact(
        spark: SparkSession,
        path: str,
        dedup: bool = False,
        keep_backup: bool = True,
    ) -> dict:
        """Compact a saved index's bucket store after streaming ingest
        (streaming.ingest.compact_bucket_store): restores the
        one-hash-sorted-file-per-tree layout that point_search's
        row-group skipping relies on. The reference has no incremental
        path at all (Train rebuilds the store, lsh/lsh.go:107-110);
        ingest+compact replaces that full rebuild.

        The swap replaces the files on disk: any LIVE DataFrame over the
        old store (an engine returned by ``load`` before the compact)
        holds a stale file index and its next action fails with
        FileNotFoundException — re-``load`` after compacting.
        ``point_search`` re-reads the path per call and is safe.

        ``keep_backup=False`` deletes the pre-compaction ``.compact-old``
        copy right after the swap instead of holding it for
        ``gc_compacted_store`` — no extra disk, no rollback. A sharded
        LSH layout compacts each shard's bucket store and, when
        ``dedup`` collapsed replayed rows (global bucket sizes moved),
        refreshes the whole-store ``hot_buckets`` table that
        survivor-rule parity hangs on."""
        from vector_search_go_spark.streaming.ingest import compact_bucket_store

        if "://" not in path:
            from vector_search_go_spark.serve.sharded import (
                read_shards_meta,
                refresh_hot_buckets,
            )

            smeta = read_shards_meta(path)
            if smeta is not None:
                if smeta["family"] != "lsh":
                    raise ValueError(
                        f"sharded layout at {path!r} holds family "
                        f"{smeta['family']!r}; engine.compact targets LSH "
                        "bucket stores — use ingest_cycle's per-component "
                        "compaction for the other families"
                    )
                stats = {
                    k: compact_bucket_store(
                        spark, f"{path}/shard={k}/buckets",
                        dedup=dedup, keep_backup=keep_backup,
                    )
                    for k in range(int(smeta["n_shards"]))
                }
                if dedup:
                    refresh_hot_buckets(spark, path)
                return {"shards": stats}
        return compact_bucket_store(
            spark, f"{path}/buckets", dedup=dedup, keep_backup=keep_backup
        )

    @staticmethod
    def maintain(spark: SparkSession, path: str, **kwargs) -> dict:
        """Drift-aware rebuild decision for a saved + streamed-into
        index (streaming.maintain): measures bucket/cell-mass drift
        against the build-time baseline and runs the reference's
        clear-and-rebuild Train (lsh/lsh.go:107-110) when tripped.
        Routes by store layout — an IVF+PQ store carries ``codebook``
        (rebuilt from its own full-precision rerank table,
        maintain_ivfpq), an LSH store ``buckets``, an IVF store
        ``cells``, a scan store only ``vectors`` (no model, so always a
        no-op); thresholds via kwargs. An IVF rebuild reuses the
        assignment metric persisted in the store (``store_meta``); pass
        ``metric=`` only for legacy IVF stores without it. Returns the
        staleness report with the action taken. Sharded layouts
        (shards_meta) route by the manifest's family — the maintainers
        measure the whole store and rebuild ONE model into
        save(shards=N) (streaming.maintain)."""
        if "://" not in path:
            from vector_search_go_spark.serve.sharded import read_shards_meta

            smeta = read_shards_meta(path)
            if smeta is not None:
                family = smeta["family"]
                if family == "scan":
                    return {
                        "action": "none",
                        "family": "scan",
                        "reason": "scan stores have no index model to drift",
                    }
                if family == "ivfpq" and "metric" in kwargs:
                    raise ValueError(
                        "ivfpq stores are l2-only (ADC ranks by squared "
                        "L2); metric= does not apply"
                    )
                if family == "lsh" and "metric" in kwargs:
                    raise ValueError(
                        "metric applies to IVF stores (cell reassignment); "
                        "this layout is LSH, whose rebuild reuses the "
                        "persisted forest config"
                    )
                from vector_search_go_spark.streaming import maintain as _mm

                return {
                    "lsh": _mm.maintain,
                    "ivf": _mm.maintain_ivf,
                    "ivfpq": _mm.maintain_ivfpq,
                }[family](spark, path, **kwargs)
        if _store_has(spark, path, "codebook"):
            if "metric" in kwargs:
                raise ValueError(
                    "ivfpq stores are l2-only (ADC ranks by squared L2); "
                    "metric= does not apply"
                )
            from vector_search_go_spark.streaming.maintain import maintain_ivfpq

            return maintain_ivfpq(spark, path, **kwargs)
        if _store_has(spark, path, "cells"):
            from vector_search_go_spark.streaming.maintain import maintain_ivf

            return maintain_ivf(spark, path, **kwargs)
        if not _store_has(spark, path, "buckets") and _store_has(
            spark, path, "vectors"
        ):
            # scan store (exact_knn.scan_save): no model component, so
            # exact search cannot go stale — a uniform maintenance
            # sweep over mixed store fleets gets a clean no-op instead
            # of a confusing missing-build-stats failure
            return {
                "action": "none",
                "family": "scan",
                "reason": "scan stores have no index model to drift",
            }
        if "metric" in kwargs:
            raise ValueError(
                "metric applies to IVF stores (cell reassignment); this "
                "store has the LSH layout, whose rebuild reuses the "
                "persisted forest config"
            )
        from vector_search_go_spark.streaming.maintain import maintain as _m

        return _m(spark, path, **kwargs)

    @staticmethod
    def ingest_cycle(
        spark: SparkSession,
        vec_stream,
        path: str,
        checkpoint_path: str,
        **kwargs,
    ) -> dict:
        """One cycle of the streaming maintenance loop: drain the
        (id, vec) stream into the saved store through its frozen model,
        rebuild if the drift measurement trips, compact if fragmented
        (streaming.maintain.ingest_cycle). The one call a scheduled job
        repeats — any live engine/reader over the store must re-load
        after a 'rebuilt' or 'compacted' cycle."""
        from vector_search_go_spark.streaming.maintain import ingest_cycle

        return ingest_cycle(spark, vec_stream, path, checkpoint_path, **kwargs)

    # -- Persistence (lsh/lsh.go:200-207) -----------------------------

    def save(self, path: str, shards: int | None = None) -> None:
        """``shards=N`` writes the sharded serving layout of whatever
        backend is trained — including one the advisor CHOSE
        (train(auto=True) then save(path, shards=N)), so a
        measured-decision store can be born sharded and local_reader
        routes it to the ShardedReader automatically."""
        if self.backend == "lsh" and self._index is not None:
            self._index.save(path, shards=shards)
        elif self.backend == "ivf" and self._cells is not None:
            from vector_search_go_spark.operators.ann_ivf import ivf_save

            ivf_save(
                self.spark, self._vectors, self._cents, path,
                metric=self.metric, shards=shards,
            )
        elif self.backend == "exact" and self._vectors is not None:
            # scan store: the advisor's "don't index" verdict made
            # persistent+servable (serve.local_reader.LocalScanReader)
            from vector_search_go_spark.operators.exact_knn import scan_save

            scan_save(
                self.spark, self._vectors, path,
                metric=self.metric, shards=shards,
            )
        else:
            raise RuntimeError("train() a backend before save()")
        if self.advisor_decision is not None:
            # measured decision rides with the model (VERDICT r4 item 4)
            import json as _json

            self.spark.createDataFrame(
                [(_json.dumps(self.advisor_decision),)], "advisor_json string"
            ).coalesce(1).write.mode("overwrite").json(f"{path}/advisor")

    @classmethod
    def load(cls, spark: SparkSession, path: str, metric: str = "l2") -> "VectorSearchEngine":
        import json as _json
        import os as _os

        def _exists(sub: str) -> bool:
            return _store_has(spark, path, sub)

        if "://" not in path:
            from vector_search_go_spark.serve.sharded import read_shards_meta

            smeta = read_shards_meta(path)
            if smeta is not None:
                return cls._load_sharded(spark, path, smeta, metric)
        if _exists("codebook"):
            # ivfpq_save layout (centroids + codebook + coded cells) —
            # its cells hold PQ codes, not vectors, so neither engine
            # backend can serve it; refuse clearly instead of crashing
            # later on a missing `vec` column.
            raise ValueError(
                f"store at {path!r} is an IVF+PQ store: the engine facade "
                "has no ivfpq backend — use operators.pq.ivfpq_point_search "
                "or serve.local_reader.LocalIvfPqReader on it directly"
            )
        if _exists("centroids") and not _exists("model_nodes"):
            # IVF store (ivf_save layout: centroids + cells holding the
            # vectors) — the save/load counterpart of backend='ivf'
            from vector_search_go_spark.streaming.maintain import store_metric

            saved_metric = store_metric(spark, path)
            if saved_metric is not None and saved_metric != metric:
                # cell membership was computed under the saved metric;
                # probing/scoring it under another returns meaningless
                # rankings — fail loudly, like the LSH is_angular check.
                raise ValueError(
                    f"store at {path!r} was saved with "
                    f"metric={saved_metric!r}, incompatible with "
                    f"metric={metric!r}"
                )
            from vector_search_go_spark.streaming.delete import mask_tombstones

            cents = spark.read.parquet(f"{path}/centroids")
            cells = mask_tombstones(
                spark, path, spark.read.parquet(f"{path}/cells")
            )
            eng = cls(spark, metric=metric, backend="ivf", ivf_cells=cents.count())
            eng._cents = cents
            eng._cells = cells.select("cell", "id", "vec")
            eng._vectors = cells.select("id", "vec")
        elif _exists("vectors") and not _exists("buckets"):
            # scan store (exact_knn.scan_save layout: vectors +
            # store_meta family='scan') — the save/load counterpart of
            # backend='exact'; search() is the full-scan oracle path.
            # Discriminator is the ABSENCE of buckets, not of
            # model_nodes: legacy LSH stores carry a 'model' dir
            # instead of model_nodes and must still route to
            # LshIndex.load below (same rule maintain() uses).
            from vector_search_go_spark.streaming.maintain import store_metric

            saved_metric = store_metric(spark, path)
            if saved_metric is not None and saved_metric != metric:
                raise ValueError(
                    f"store at {path!r} was saved with "
                    f"metric={saved_metric!r}, incompatible with "
                    f"metric={metric!r}"
                )
            from vector_search_go_spark.streaming.delete import mask_tombstones

            eng = cls(spark, metric=metric, backend="exact")
            eng._vectors = mask_tombstones(
                spark, path, spark.read.parquet(f"{path}/vectors")
            ).select("id", "vec")
        else:
            idx = LshIndex.load(spark, path)
            if idx.config.is_angular != is_angular(metric):
                # the persisted buckets were hashed under the model's
                # metric family; scoring them under the other one
                # returns meaningless rankings — fail loudly instead.
                raise ValueError(
                    f"index at {path!r} was trained with "
                    f"is_angular={idx.config.is_angular}, incompatible with "
                    f"metric={metric!r}"
                )
            eng = cls(spark, idx.config, metric=metric, backend="lsh")
            eng._index = idx
            eng._vectors = idx.vectors
        cls._restore_advisor(spark, path, eng)
        return eng

    @staticmethod
    def _restore_advisor(spark, path: str, eng: "VectorSearchEngine") -> None:
        """Tolerant ``{path}/advisor`` restore shared by the sharded and
        unsharded load paths (ADVICE r7: _load_sharded returned before
        this tail, so an advisor-chosen engine saved with shards=N lost
        its measured decision on reload). A store without a saved
        decision (or a remote path where existence can't be pre-checked)
        just leaves advisor_decision = None."""
        import json as _json
        import os as _os

        adv = _os.path.join(path, "advisor")
        if _os.path.exists(adv) or "://" in path:
            try:
                eng.advisor_decision = _json.loads(
                    spark.read.json(adv).collect()[0]["advisor_json"]
                )
            except Exception:
                pass

    @classmethod
    def _load_sharded(
        cls, spark: SparkSession, path: str, smeta: dict, metric: str
    ) -> "VectorSearchEngine":
        """Load a SHARDED layout for batch search: sharding is a SERVING
        layout (per-reader RAM bounds), while the engine's batch search
        is a distributed Spark job — the right view there is the UNION
        of shard components against the shared shard=0 model, which is
        exactly the store one big save would have written (the shards
        partition the corpus; the models are identical by construction).
        Serving still goes through local_reader -> ShardedReader."""
        from vector_search_go_spark.serve.sharded import union_shard_component

        family = smeta["family"]
        n = int(smeta["n_shards"])
        if family == "ivfpq":
            raise ValueError(
                f"store at {path!r} is a sharded IVF+PQ layout: the "
                "engine facade has no ivfpq backend — serve it with "
                "serve.sharded.ShardedReader, or batch-search with "
                "operators.pq.ivfpq_point_search per shard"
            )
        saved_metric = smeta.get("metric")
        if family == "lsh":
            forest = LshIndex.load_forest(spark, f"{path}/shard=0")
            if forest.config.is_angular != is_angular(metric):
                raise ValueError(
                    f"index at {path!r} was trained with "
                    f"is_angular={forest.config.is_angular}, incompatible "
                    f"with metric={metric!r}"
                )
            from pyspark.sql import functions as F

            eng = cls(spark, forest.config, metric=metric, backend="lsh")
            eng._index = LshIndex(
                forest.config,
                forest,
                union_shard_component(spark, path, n, "vectors"),
                # same normalization as LshIndex.load: the tree column
                # is a hive partition whose inferred type can differ
                # when partition-type inference is configured off
                # (ADVICE r7) — pin it to int like the unsharded path
                union_shard_component(spark, path, n, "buckets").select(
                    F.col("tree").cast("int").alias("tree"), "hash", "id"
                ),
            )
            eng._vectors = eng._index.vectors
            cls._restore_advisor(spark, path, eng)
            return eng
        if saved_metric is not None and saved_metric != metric:
            raise ValueError(
                f"store at {path!r} was saved with "
                f"metric={saved_metric!r}, incompatible with "
                f"metric={metric!r}"
            )
        if family == "ivf":
            cents = spark.read.parquet(f"{path}/shard=0/centroids")
            cells = union_shard_component(spark, path, n, "cells")
            eng = cls(
                spark, metric=metric, backend="ivf", ivf_cells=cents.count()
            )
            eng._cents = cents
            eng._cells = cells.select("cell", "id", "vec")
            eng._vectors = cells.select("id", "vec")
            cls._restore_advisor(spark, path, eng)
            return eng
        # scan
        eng = cls(spark, metric=metric, backend="exact")
        eng._vectors = union_shard_component(spark, path, n, "vectors").select(
            "id", "vec"
        )
        cls._restore_advisor(spark, path, eng)
        return eng
