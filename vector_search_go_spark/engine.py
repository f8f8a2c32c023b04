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


class VectorSearchEngine:
    """metric: 'l2' or 'cosine' (reference Metric interface, lsh/lsh.go:48-51).
    backend: 'lsh' (the index) or 'exact' (NNMock-equivalent oracle)."""

    def __init__(
        self,
        spark: SparkSession,
        config: LshConfig | None = None,
        metric: str = "l2",
        backend: str = "lsh",
    ):
        if backend not in ("lsh", "exact"):
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
            )
        self.config = config
        self._index: LshIndex | None = None
        self._vectors: DataFrame | None = None

    # -- Train (lsh/lsh.go:106-134; Train clears prior state) ---------

    def train(self, df: DataFrame, id_col: str = "id", vec_col: str = "vec") -> None:
        vectors = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
        self._vectors = vectors
        if self.backend == "lsh":
            if self.config is None:
                raise ValueError("backend='lsh' requires an LshConfig")
            self._index = LshIndex.train(self.spark, vectors, self.config)

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
        ``gc_compacted_store`` — no extra disk, no rollback."""
        from vector_search_go_spark.streaming.ingest import compact_bucket_store

        return compact_bucket_store(
            spark, f"{path}/buckets", dedup=dedup, keep_backup=keep_backup
        )

    # -- Persistence (lsh/lsh.go:200-207) -----------------------------

    def save(self, path: str) -> None:
        if self.backend != "lsh" or self._index is None:
            raise RuntimeError("only a trained lsh backend can be saved")
        self._index.save(path)

    @classmethod
    def load(cls, spark: SparkSession, path: str, metric: str = "l2") -> "VectorSearchEngine":
        idx = LshIndex.load(spark, path)
        if idx.config.is_angular != is_angular(metric):
            # the persisted buckets were hashed under the model's metric
            # family; scoring them under the other one returns
            # meaningless rankings — fail loudly instead.
            raise ValueError(
                f"index at {path!r} was trained with "
                f"is_angular={idx.config.is_angular}, incompatible with "
                f"metric={metric!r}"
            )
        eng = cls(spark, idx.config, metric=metric, backend="lsh")
        eng._index = idx
        eng._vectors = idx.vectors
        return eng
