"""Sharded serving composition (VERDICT r5 missing item 1).

A single LocalReader is bounded by one process's RAM/disk (the 100 TB
shape in serve.local_reader's module docstring: "one reader process per
store shard behind a router"). This module is that router, plus the
shard layout the builders write:

  {path}/shards_meta     one JSON line {family, n_shards, metric?}
  {path}/shard=K/        a COMPLETE single-store layout (LshIndex.save /
                         ivf_save / scan_save) holding the id-subset
                         pmod(xxhash64(id), n_shards) == K
  {path}/hot_buckets     (LSH only) (tree, hash, sz) rows for buckets
                         whose WHOLE-store size exceeds
                         config.max_bucket_size — the pathological tail
                         only, the same broadcast-sized set
                         lsh.search.bound_hot_buckets joins.

``ShardedReader`` holds one LocalReader per shard and merges per-shard
top-k. Correctness of the merge is the selection-monotone argument the
Arrow kernels' per-batch local top-k already rely on
(operators/argmin.py): every row of the global top-k by (dist, id) is,
within its own shard, among that shard's top-k — so the global top-k is
a subset of the union of per-shard top-ks, and re-ranking the union by
(dist, id) reproduces it exactly. Thresholds commute with the partition
(each shard applies the same filter), and LSH hot-bucket thinning stays
bit-identical because every shard evaluates the survivor predicate with
the WHOLE-store keep_mod from ``hot_buckets`` (see
LocalLshReader.global_hot_buckets) — the per-id rule is deterministic
given (tree, hash, keep_mod), so the union of shard survivors IS the
unsharded survivor set. Parity is pinned in tests/test_sharded.py.

Reference anchor: the Store interface exists to make storage pluggable
(store/store.go:12-18); this is the pluggable composition over it.

Scale shape: shards fan out on a thread pool (the numpy/pyarrow work
releases the GIL), so wall-clock per query tracks ONE shard's latency
plus a k*n_shards-row merge — the SCALE.md sharded row measures this
flat against the single-shard row. In a real fleet each shard reader
is its own process/host and this class becomes the stateless router in
front of them; nothing in the merge depends on shard-local state.
"""

from __future__ import annotations

import glob
import json
import os
from concurrent.futures import ProcessPoolExecutor, ThreadPoolExecutor

import numpy as np
import pandas as pd

from vector_search_go_spark.serve.local_reader import (
    LocalIvfPqReader,
    LocalIvfReader,
    LocalLshReader,
    LocalScanReader,
    _batch_queries,
    _read_store_meta,
    _result_frame,
)

_READER_CLS = {
    "lsh": LocalLshReader,
    "ivf": LocalIvfReader,
    "scan": LocalScanReader,
    "ivfpq": LocalIvfPqReader,
}

# families whose shard readers take a metric= ctor kwarg (ivfpq stores
# are l2-only by construction — LocalIvfPqReader has no metric knob)
_METRIC_FAMILIES = ("lsh", "ivf", "scan")

# ---- process-per-shard worker plumbing (ShardedReader processes=True).
# One single-worker spawn process per shard, each holding ITS reader as
# a module global — the miniature of the documented fleet shape (one
# reader process per store shard behind a router). Module-level so the
# spawn pickler can import them.
_WORKER_READER = None


def _shard_worker_init(family: str, shard_path: str, reader_kwargs: dict):
    global _WORKER_READER
    _WORKER_READER = _READER_CLS[family](shard_path, **reader_kwargs)


def _shard_worker_search(args):
    qvec, k, kwargs = args
    return _WORKER_READER.search(qvec, k=k, **kwargs)


def _shard_worker_search_many(args):
    Q, k, query_ids, kwargs = args
    return _WORKER_READER.search_many(Q, k=k, query_ids=query_ids, **kwargs)


def _shard_worker_ivfpq_cand(args):
    qvec, shortlist, nprobe, query_id = args
    return _WORKER_READER.shard_candidates(
        qvec, shortlist=shortlist, nprobe=nprobe, query_id=query_id
    )


def _shard_worker_ivfpq_cand_many(args):
    Q, shortlist, nprobe, query_ids = args
    return _WORKER_READER.shard_candidates_many(
        Q, shortlist=shortlist, nprobe=nprobe, query_ids=query_ids
    )


def _shard_worker_ivfpq_sq8_cand(args):
    qvec, shortlist, nprobe, query_id = args
    return _WORKER_READER.shard_candidates_sq8(
        qvec, shortlist=shortlist, nprobe=nprobe, query_id=query_id
    )


def _shard_worker_ivfpq_sq8_cand_many(args):
    Q, shortlist, nprobe, query_ids = args
    return _WORKER_READER.shard_candidates_sq8_many(
        Q, shortlist=shortlist, nprobe=nprobe, query_ids=query_ids
    )


def _shard_worker_fetch_dists_many(args):
    Q, ids_per_query, query_ids = args
    return _WORKER_READER.fetch_dists_many(
        Q, ids_per_query, query_ids=query_ids
    )


def shard_expr(n_shards: int):
    """The builders' shard assignment column: pmod(xxhash64(id), n) —
    deterministic, balanced, and re-derivable from the id alone (the
    same reasoning as the hot-bucket survivor rule's hash)."""
    from pyspark.sql import functions as F

    return F.pmod(F.xxhash64("id"), F.lit(int(n_shards)))


def check_shard_population(df, n_shards: int, what: str) -> None:
    """Refuse a sharded save that would write an EMPTY shard — an empty
    single-store layout is not openable (scan readers reject empty
    vector tables, hive cell/bucket dirs never materialize), so the
    failure must happen BEFORE any shard directory is written, not
    midway through shard k. One aggregation pass over the input."""
    counts = {
        int(r["s"]): r["count"]
        for r in df.groupBy(shard_expr(n_shards).alias("s")).count().collect()
    }
    empty = [k for k in range(n_shards) if counts.get(k, 0) == 0]
    if empty:
        raise ValueError(
            f"shards={n_shards} would leave shard(s) {empty} empty for "
            f"this {what} ({sum(counts.values())} rows total) — use "
            "fewer shards"
        )


def write_shards_meta(
    spark, path: str, family: str, n_shards: int, metric: str | None = None
) -> None:
    meta = {"family": family, "n_shards": int(n_shards)}
    if metric is not None:
        meta["metric"] = metric
    spark.createDataFrame(
        [(json.dumps(meta),)], "meta_json string"
    ).coalesce(1).write.mode("overwrite").json(f"{path}/shards_meta")


def read_shards_meta(path: str) -> dict | None:
    """None when ``path`` is not a sharded layout; parse errors raise
    (absence != unreadable — the store_metric contract)."""
    from vector_search_go_spark.serve.local_reader import (
        meta_files,
        parse_meta_files,
    )

    return parse_meta_files(meta_files(path, "shards_meta"))


def union_shard_component(spark, path: str, n_shards: int, sub: str):
    """Union of one store component across every shard of a sharded
    layout — the whole-store view sharded staleness and rebuilds read
    (each shard holds a disjoint id-subset, so the union IS the store).
    Id-carrying components mask each shard's tombstones (streaming.
    delete): every union consumer — staleness masses, rebuild corpora,
    hot_buckets refresh, the batch engine's loaded view — must see the
    LIVE store, exactly what a re-save without the ids would hold."""
    from functools import reduce

    from pyspark.sql import DataFrame

    from vector_search_go_spark.streaming.delete import mask_tombstones

    parts = []
    for k in range(int(n_shards)):
        df = spark.read.parquet(f"{path}/shard={k}/{sub}")
        if "id" in df.columns:
            df = mask_tombstones(spark, f"{path}/shard={k}", df)
        parts.append(df)
    return reduce(DataFrame.unionByName, parts)


def refresh_hot_buckets(spark, path: str) -> int:
    """Recompute ``{path}/hot_buckets`` from the UNION of the shard
    bucket tables. Required after ANY operation that changes global
    physical bucket sizes on a sharded LSH layout — streaming appends,
    dedup compaction — because survivor-rule parity hangs on WHOLE-store
    keep_mods (see LocalLshReader.global_hot_buckets); a rebuild
    (LshIndex.save(shards=N)) rewrites the table itself. Returns the
    number of over-cap buckets recorded (0 also when the store's config
    sets no cap — then no thinning exists to keep in parity)."""
    import pyarrow.parquet as papq

    from pyspark.sql import functions as F

    meta = read_shards_meta(path)
    if meta is None or meta.get("family") != "lsh":
        raise ValueError(
            f"{path!r} is not a sharded LSH layout — hot_buckets only "
            "exist for the LSH family's survivor rule"
        )
    # the cap comes from the (shared) model config; shard=0 is
    # authoritative because every shard was saved from the same index
    import json as _json

    from vector_search_go_spark.serve.local_reader import meta_files

    cfg = None
    for f in meta_files(os.path.join(path, "shard=0"), "model_config"):
        with open(f) as fh:
            for line in fh:
                line = line.strip()
                if line:
                    cfg = _json.loads(_json.loads(line)["config_json"])
                    break
        if cfg is not None:
            break
    if cfg is None:
        raise FileNotFoundError(f"no model_config JSON under {path}/shard=0")
    cap = cfg.get("max_bucket_size")
    if cap is None:
        return 0
    hot = (
        union_shard_component(spark, path, meta["n_shards"], "buckets")
        .groupBy("tree", "hash")
        .agg(F.count(F.lit(1)).alias("sz"))
        .filter(F.col("sz") > int(cap))
    )
    # two-rename swap, same pattern as compact_bucket_store (ADVICE r7:
    # a mode('overwrite') delete-then-write let a reader constructed
    # mid-refresh observe an empty/partial hot_buckets dir and silently
    # lose survivor-rule parity for its lifetime — _load_hot_buckets
    # has no _swap_retry to heal a wrong-but-readable listing)
    import shutil

    target = os.path.join(path, "hot_buckets")
    tmp = target + ".refresh-tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    hot.coalesce(1).write.mode("overwrite").parquet(tmp)
    old = target + ".refresh-old"
    shutil.rmtree(old, ignore_errors=True)
    if os.path.exists(target):
        os.replace(target, old)
    os.replace(tmp, target)
    shutil.rmtree(old, ignore_errors=True)
    spark.catalog.refreshByPath(target)
    files = glob.glob(os.path.join(target, "*.parquet"))
    return sum(papq.read_metadata(f).num_rows for f in files)


def _load_hot_buckets(path: str) -> dict:
    """{(tree, hash): whole-store sz} from ``{path}/hot_buckets``; {}
    when the layout has none (no cap configured, or no bucket over
    it)."""
    import pyarrow.parquet as pq

    root = os.path.join(path, "hot_buckets")
    files = glob.glob(os.path.join(root, "*.parquet"))
    if not files:
        return {}
    tbl = pq.read_table(files)
    return {
        (int(t), int(h)): int(s)
        for t, h, s in zip(
            tbl.column("tree").to_pylist(),
            tbl.column("hash").to_pylist(),
            tbl.column("sz").to_pylist(),
        )
    }


class ShardedReader:
    """N LocalReaders over ``{path}/shard=K`` plus the top-k merge.

    Constructor kwargs are forwarded to every shard reader (metric,
    preload flags — same names as the single-store reader of the
    store's family). ivf/scan layouts fill metric from shards_meta;
    LSH requires metric= explicitly (search-time choice); ivfpq is
    l2-only like the store itself.

    IVFADC (family 'ivfpq', r6 VERDICT item 1) composes differently
    from the top-k families: each shard returns its LOCAL ADC
    top-shortlist WITH both the ADC score and the exact rerank
    distance (LocalIvfPqReader.shard_candidates), the router merges by
    (adc, id), keeps the GLOBAL top-shortlist, drops missing-vector
    rows, and ranks by (dist, id). Bit-identical to the unsharded
    reader because per-shard ADC top-L is selection-monotone (every
    global top-L member is in its own shard's top-L), ADC floats are
    comparable across shards (identical codebook => identical LUT =>
    identical subspace-ordered fold), and exact distances are per-row
    independent. This is the 100 TB store: raw vectors don't fit one
    reader, the 16x-compressed codes do per shard."""

    def __init__(
        self,
        path: str,
        max_workers: int = 8,
        processes: bool = False,
        stagger_init: bool = False,
        **reader_kwargs,
    ):
        """``stagger_init=True`` (processes mode) builds the shard
        readers one at a time instead of in parallel: preload-heavy
        readers peak at ~2-3x their steady RAM during construction
        (arrow table + sorted copy live together), and N shards paying
        that transient simultaneously can OOM a box whose steady
        footprint fits fine — at 100M x 64 x 10 shards the
        preload_vectors regime is ~65 GB steady but >130 GB under
        parallel init. Costs init wall time (serial), changes nothing
        else."""
        meta = read_shards_meta(path)
        if meta is None:
            raise FileNotFoundError(
                f"{path!r} has no shards_meta — not a sharded layout "
                "(single stores open with their family's LocalReader)"
            )
        self.path = path
        self.family = meta["family"]
        self.n_shards = int(meta["n_shards"])
        self._closed = False
        if (
            self.family in _METRIC_FAMILIES
            and "metric" not in reader_kwargs
            and meta.get("metric")
        ):
            reader_kwargs["metric"] = meta["metric"]
        cls = _READER_CLS.get(self.family)
        if cls is None:
            raise ValueError(
                f"family {self.family!r} has no sharded reader"
            )
        # sharded IVFADC: shortlist=None resolves from the LAYOUT-level
        # store_meta (written by the sharded maintenance probe), exactly
        # like the unsharded reader resolves from its own store_meta —
        # per-shard metas are bypassed because the router always passes
        # the resolved budget down explicitly.
        self._root_rec = (
            int(_read_store_meta(path).get("recommended_shortlist", 0))
            if self.family == "ivfpq"
            else 0
        )
        if self.family == "lsh":
            if "metric" not in reader_kwargs:
                raise ValueError(
                    "LSH sharded stores need metric= — the metric is a "
                    "SEARCH-time choice for LSH (reference Search takes "
                    "it per call, lsh/lsh.go:137), so the layout does "
                    "not persist one"
                )
            reader_kwargs.setdefault(
                "global_hot_buckets", _load_hot_buckets(path)
            )
        self._procs: list | None = None
        self._pool = None
        if processes:
            # one single-worker SPAWN process per shard, reader built in
            # the worker (never pickled; spawn avoids forking a
            # JVM-attached parent). This is the configuration the flat
            # ms/q claim holds in: thread fan-out serializes the
            # readers' Python-level probe work on the GIL (SCALE.md
            # sharded rows measure both), processes do not — in a real
            # fleet each worker is a host and this class is the router.
            import multiprocessing as mp

            ctx = mp.get_context("spawn")
            self._procs = []
            try:
                for k in range(self.n_shards):
                    pool = ProcessPoolExecutor(
                        max_workers=1,
                        mp_context=ctx,
                        initializer=_shard_worker_init,
                        initargs=(
                            self.family,
                            os.path.join(path, f"shard={k}"),
                            reader_kwargs,
                        ),
                    )
                    self._procs.append(pool)
                # force worker startup (initializer runs on first task)
                # so init cost lands here, not in the first query
                if stagger_init:
                    for p in self._procs:
                        p.submit(os.getpid).result()
                else:
                    for f in [p.submit(os.getpid) for p in self._procs]:
                        f.result()
            except BaseException:
                self.close()  # don't leak already-spawned shard workers
                raise
            self.readers = []
            return
        self.readers = [
            cls(os.path.join(path, f"shard={k}"), **reader_kwargs)
            for k in range(self.n_shards)
        ]
        self._pool = ThreadPoolExecutor(
            max_workers=min(max_workers, self.n_shards)
        )

    @staticmethod
    def _merge(frames: list[pd.DataFrame], k: int, order) -> pd.DataFrame:
        """Union of per-shard (query_id, id, dist, rn) results -> global
        top-k per query by (dist, id), rn reassigned, queries emitted in
        the CALLER's order (``order``) — row-for-row what the unsharded
        reader's frame looks like (a query with zero candidates in every
        shard contributes zero rows there too). Uses the same
        _result_frame tie-break as every reader."""
        allf = pd.concat(frames, ignore_index=True)
        # one groupby pass, not a full-frame boolean scan per query —
        # the merge must stay linear in batch x shards x k
        groups = {int(q): sub for q, sub in allf.groupby("query_id", sort=False)}
        out = []
        for qid in order:
            sub = groups.get(int(qid))
            if sub is None or len(sub) == 0:
                continue
            out.append(
                _result_frame(
                    sub["id"].to_numpy(), sub["dist"].to_numpy(), k, int(qid)
                )
            )
        if not out:
            return _result_frame([], [], k, int(order[0]) if len(order) else 0)
        return pd.concat(out, ignore_index=True)

    def _check_open(self) -> None:
        if self._closed:
            raise RuntimeError(
                "ShardedReader is closed — construct a new reader "
                "(close() shut down the shard fan-out executors)"
            )

    def _resolve_shortlist(self, k: int, shortlist) -> int:
        """The unsharded reader's shortlist=None resolution, applied at
        the ROUTER (layout-level recommended_shortlist), so the global
        selection depth matches what one big store would use."""
        from vector_search_go_spark.operators.pq import pq_shortlist

        if shortlist is None:
            return max(self._root_rec, pq_shortlist(k))
        return int(shortlist)

    @staticmethod
    def _merge_ivfpq(
        frames: list[pd.DataFrame], k: int, shortlist: int, order
    ) -> pd.DataFrame:
        """Union of per-shard (query_id, id, adc, dist, vmult) SLOT rows
        -> per query: global ADC top-``shortlist`` slots by (adc, id),
        then emit each selected UNIQUE id with its vectors-table
        multiplicity, then top-k by (dist, id).

        This reproduces the unsharded reader's exact row set under
        every duplicate configuration: slots (codes rows) consume
        shortlist depth there too, but its OUTPUT rows are the isin
        mask over the vectors table — one row per vectors row whose id
        is shortlisted. vmult == 0 (no vectors row) drops the id in the
        same place the unsharded mask drops it. An id lives in exactly
        one shard (disjoint pmod split), so its slot rows and vmult are
        mutually consistent. Queries emit in the caller's order; a
        query with no candidates anywhere contributes zero rows."""
        allf = pd.concat(frames, ignore_index=True)
        groups = {int(q): sub for q, sub in allf.groupby("query_id", sort=False)}
        out = []
        for qid in order:
            sub = groups.get(int(qid))
            if sub is None or len(sub) == 0:
                out.append(_result_frame([], [], k, int(qid)))
                continue
            ids = sub["id"].to_numpy()
            adc = sub["adc"].to_numpy()
            dist = sub["dist"].to_numpy()
            vmult = sub["vmult"].to_numpy()
            sel = LocalIvfPqReader._adc_topl(ids, adc, shortlist)
            out_ids: list = []
            out_dist: list = []
            seen: set = set()
            for j in sel:
                i = ids[j]
                if i in seen:
                    continue  # a second SLOT of an already-emitted id
                seen.add(i)
                m = int(vmult[j])
                if m <= 0:
                    continue  # no vectors row — the unsharded isin drop
                out_ids.extend([i] * m)
                out_dist.extend([float(dist[j])] * m)
            out.append(_result_frame(out_ids, out_dist, k, int(qid)))
        if not out:
            # empty batch: same empty frame the unsharded reader (and
            # _merge) return instead of a pd.concat([]) crash
            return _result_frame([], [], k, int(order[0]) if len(order) else 0)
        return pd.concat(out, ignore_index=True)

    @staticmethod
    def _sq8_keep_ids(
        frames: list[pd.DataFrame], shortlist: int, keep: int, order
    ) -> dict[int, list[int]]:
        """Router half of the SQ8 protocol's phase 1: union of per-shard
        (query_id, id, adc, sq8) slot rows -> per query the global ADC
        top-``shortlist`` slots by (adc, id), deduped to unique ids,
        NaN-sq8 ids dropped (no SQ8 row — the same place the unsharded
        _sq8_select drops them), then the top-``keep`` ids by
        (sq8, id). Bit-identical to the unsharded selection because
        every global ADC top-L slot is in its own shard's top-L
        (selection monotone) and sq8 floats are comparable across
        shards (one global stats row by the save contract)."""
        allf = pd.concat(frames, ignore_index=True)
        groups = {int(q): sub for q, sub in allf.groupby("query_id", sort=False)}
        kept: dict[int, list[int]] = {}
        for qid in order:
            sub = groups.get(int(qid))
            if sub is None or len(sub) == 0:
                kept[int(qid)] = []
                continue
            ids = sub["id"].to_numpy()
            adc = sub["adc"].to_numpy()
            s8 = sub["sq8"].to_numpy()
            sel = LocalIvfPqReader._adc_topl(ids, adc, shortlist)
            seen: set = set()
            u_ids: list = []
            u_s8: list = []
            for j in sel:
                i = int(ids[j])
                if i in seen:
                    continue
                seen.add(i)
                if np.isnan(s8[j]):
                    continue
                u_ids.append(i)
                u_s8.append(float(s8[j]))
            if not u_ids:
                kept[int(qid)] = []
                continue
            ua = np.asarray(u_ids, dtype=np.int64)
            sa = np.asarray(u_s8, dtype=np.float64)
            ksel = np.lexsort((ua, sa))[:keep]
            kept[int(qid)] = sorted(int(x) for x in ua[ksel])
        return kept

    def _finish_sq8(self, kept: dict, Q, qids, k: int) -> pd.DataFrame:
        """Phase 2: exact distances for each query's kept ids from every
        shard (ids are disjoint across shards — each contributes only
        its own rows, with vectors-table multiplicity), then top-k by
        (dist, id) per query in caller order."""
        ids_per_query = [kept[int(q)] for q in qids]
        if self._procs is not None:
            qmat = [[float(x) for x in q] for q in np.asarray(Q, dtype=np.float64)]
            futs = [
                p.submit(
                    _shard_worker_fetch_dists_many,
                    (qmat, ids_per_query, [int(q) for q in qids]),
                )
                for p in self._procs
            ]
            frames = [f.result() for f in futs]
        else:
            frames = list(
                self._pool.map(
                    lambda r: r.fetch_dists_many(
                        Q, ids_per_query, query_ids=[int(q) for q in qids]
                    ),
                    self.readers,
                )
            )
        allf = pd.concat(frames, ignore_index=True)
        out = []
        for qid in qids:
            sub = allf[allf["query_id"] == int(qid)]
            out.append(
                _result_frame(
                    sub["id"].tolist(), sub["dist"].tolist(), k, int(qid)
                )
            )
        return pd.concat(out, ignore_index=True)

    def _resolve_sq8_keep(self, k: int, sq8_keep) -> int:
        from vector_search_go_spark.operators.pq import pq_shortlist

        return pq_shortlist(k) if sq8_keep is None else int(sq8_keep)

    def search(self, qvec, k: int = 10, query_id: int = 0, **kwargs) -> pd.DataFrame:
        self._check_open()
        if self.family == "ivfpq":
            nprobe = int(kwargs.pop("nprobe", 4))
            shortlist = self._resolve_shortlist(k, kwargs.pop("shortlist", None))
            rerank = str(kwargs.pop("rerank", "exact"))
            sq8_keep = kwargs.pop("sq8_keep", None)
            if kwargs:
                raise TypeError(
                    f"unexpected ivfpq search kwargs {sorted(kwargs)}"
                )
            if rerank == "sq8":
                keep = self._resolve_sq8_keep(k, sq8_keep)
                if self._procs is not None:
                    qlist = [float(x) for x in qvec]
                    futs = [
                        p.submit(
                            _shard_worker_ivfpq_sq8_cand,
                            (qlist, shortlist, nprobe, query_id),
                        )
                        for p in self._procs
                    ]
                    frames = [f.result() for f in futs]
                else:
                    frames = list(
                        self._pool.map(
                            lambda r: r.shard_candidates_sq8(
                                qvec, shortlist=shortlist, nprobe=nprobe,
                                query_id=query_id,
                            ),
                            self.readers,
                        )
                    )
                kept = self._sq8_keep_ids(frames, shortlist, keep, [query_id])
                return self._finish_sq8(kept, [list(qvec)], [query_id], k)
            if rerank != "exact":
                raise ValueError(f"unknown rerank mode {rerank!r}")
            if self._procs is not None:
                qlist = [float(x) for x in qvec]
                futs = [
                    p.submit(
                        _shard_worker_ivfpq_cand,
                        (qlist, shortlist, nprobe, query_id),
                    )
                    for p in self._procs
                ]
                frames = [f.result() for f in futs]
            else:
                frames = list(
                    self._pool.map(
                        lambda r: r.shard_candidates(
                            qvec, shortlist=shortlist, nprobe=nprobe,
                            query_id=query_id,
                        ),
                        self.readers,
                    )
                )
            return self._merge_ivfpq(frames, k, shortlist, [query_id])
        if self._procs is not None:
            qlist = [float(x) for x in qvec]
            futs = [
                p.submit(
                    _shard_worker_search,
                    (qlist, k, {**kwargs, "query_id": query_id}),
                )
                for p in self._procs
            ]
            frames = [f.result() for f in futs]
        else:
            frames = list(
                self._pool.map(
                    lambda r: r.search(qvec, k=k, query_id=query_id, **kwargs),
                    self.readers,
                )
            )
        return self._merge(frames, k, [query_id])

    def search_many(
        self, Q, k: int = 10, query_ids=None, **kwargs
    ) -> pd.DataFrame:
        self._check_open()
        # normalize exactly like the shard readers do, so the merge can
        # emit queries in the caller's order even when a query has no
        # rows in shard 0 (first-appearance order would reorder it)
        _, qids = _batch_queries(Q, query_ids)
        if len(set(int(q) for q in qids)) != len(qids):
            # the merge pools shard rows BY LABEL; two different
            # queries under one id would merge into one wrong top-k
            # (the same contract ivfpq_point_search_batch enforces)
            raise ValueError("duplicate query_id in batch")
        if self.family == "ivfpq":
            nprobe = int(kwargs.pop("nprobe", 4))
            shortlist = self._resolve_shortlist(k, kwargs.pop("shortlist", None))
            rerank = str(kwargs.pop("rerank", "exact"))
            sq8_keep = kwargs.pop("sq8_keep", None)
            if kwargs:
                raise TypeError(
                    f"unexpected ivfpq search kwargs {sorted(kwargs)}"
                )
            sent_ids = [int(q) for q in qids]
            if rerank == "sq8":
                keep = self._resolve_sq8_keep(k, sq8_keep)
                if self._procs is not None:
                    qmat = [
                        [float(x) for x in q]
                        for q in np.asarray(Q, dtype=np.float64)
                    ]
                    futs = [
                        p.submit(
                            _shard_worker_ivfpq_sq8_cand_many,
                            (qmat, shortlist, nprobe, sent_ids),
                        )
                        for p in self._procs
                    ]
                    frames = [f.result() for f in futs]
                else:
                    frames = list(
                        self._pool.map(
                            lambda r: r.shard_candidates_sq8_many(
                                Q, shortlist=shortlist, nprobe=nprobe,
                                query_ids=query_ids,
                            ),
                            self.readers,
                        )
                    )
                kept = self._sq8_keep_ids(frames, shortlist, keep, sent_ids)
                Qn, _ = _batch_queries(Q, query_ids)
                return self._finish_sq8(kept, Qn, sent_ids, k)
            if rerank != "exact":
                raise ValueError(f"unknown rerank mode {rerank!r}")
            if self._procs is not None:
                qmat = [
                    [float(x) for x in q]
                    for q in np.asarray(Q, dtype=np.float64)
                ]
                futs = [
                    p.submit(
                        _shard_worker_ivfpq_cand_many,
                        (qmat, shortlist, nprobe, sent_ids),
                    )
                    for p in self._procs
                ]
                frames = [f.result() for f in futs]
            else:
                frames = list(
                    self._pool.map(
                        lambda r: r.shard_candidates_many(
                            Q, shortlist=shortlist, nprobe=nprobe,
                            query_ids=query_ids,
                        ),
                        self.readers,
                    )
                )
            return self._merge_ivfpq(frames, k, shortlist, sent_ids)
        if self._procs is not None:
            qmat = [[float(x) for x in q] for q in np.asarray(Q, dtype=np.float64)]
            sent_ids = [int(q) for q in qids]
            futs = [
                p.submit(_shard_worker_search_many, (qmat, k, sent_ids, kwargs))
                for p in self._procs
            ]
            frames = [f.result() for f in futs]
        else:
            frames = list(
                self._pool.map(
                    lambda r: r.search_many(Q, k=k, query_ids=query_ids, **kwargs),
                    self.readers,
                )
            )
        return self._merge(frames, k, [int(q) for q in qids])

    def close(self) -> None:
        """Shut down the fan-out executors (worker processes or the
        thread pool); idempotent. A closed reader raises a clear
        RuntimeError on search, not an opaque AttributeError."""
        self._closed = True
        if self._procs is not None:
            for p in self._procs:
                p.shutdown(wait=False, cancel_futures=True)
            self._procs = None
        if self._pool is not None:
            self._pool.shutdown(wait=False, cancel_futures=True)
            self._pool = None

    def __enter__(self) -> "ShardedReader":
        return self

    def __exit__(self, *exc) -> None:
        self.close()

    def __del__(self) -> None:
        # best-effort: a forgotten close() in processes=True mode would
        # otherwise leak one spawn process per shard until GC of the
        # pools themselves; interpreter-shutdown partial state is fine
        try:
            self.close()
        except Exception:
            pass


def open_reader(path: str, **reader_kwargs):
    """Open the right serving reader for WHATEVER store lives at
    ``path``: a ShardedReader for sharded layouts (shards_meta), else
    the family's LocalReader — family from store_meta when persisted,
    else from the layout's discriminating component (the engine.load
    rules: codebook -> ivfpq, cells -> ivf, buckets -> lsh, bare
    vectors -> scan). One entry point so operators that take "a saved
    store" (serving_batch_advisor, serving loops) need no family
    plumbing."""
    if read_shards_meta(path) is not None:
        return ShardedReader(path, **reader_kwargs)
    family = _read_store_meta(path).get("family")
    if family is None:
        if os.path.exists(os.path.join(path, "codebook")):
            family = "ivfpq"
        elif os.path.exists(os.path.join(path, "cells")):
            family = "ivf"
        elif os.path.exists(os.path.join(path, "buckets")):
            family = "lsh"
        elif os.path.exists(os.path.join(path, "vectors")):
            family = "scan"
        else:
            raise FileNotFoundError(
                f"{path!r} holds no recognizable store layout"
            )
    cls = _READER_CLS.get(family)
    if cls is None:
        raise ValueError(f"family {family!r} has no serving reader")
    return cls(path, **reader_kwargs)
