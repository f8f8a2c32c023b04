"""Driver-side serving readers: single-query point lookups over the
engine's PERSISTED stores with NO Spark job.

The reference serves one query in 15-268 ms because Search walks an
in-process map (reference lsh/lsh.go:137-197; store/kv/store.go:16-101
is an in-memory KV). The Spark point paths (lsh.search.lsh_point_search,
operators.ann_ivf.ivf_point_search, operators.pq.ivfpq_point_search)
read only the probed buckets/cells, but each call still pays Spark's
fixed per-job floor (~3 s) — fine for batch, wrong for online serving.

These readers close that gap using ONLY the engine's own artifacts:

  - the model loads once, driver-side (LSH forest node table / IVF
    centroids / PQ codebook — all KB-MB sized);
  - the query hashes / coarse-probes in numpy — the exact same code the
    engine broadcasts to executors (lsh.hasher.Forest,
    operators.ann_ivf.probe_cells_for);
  - the probed (tree, hash) bucket or cell partitions are read with
    pyarrow, exploiting the SAME layout the Spark paths rely on
    (hive-partitioned dirs + hash-sorted small row groups written by
    LshIndex.save / ivf_save / ivfpq_save — row-group min/max stats
    prune everything but the probed buckets);
  - hot buckets are thinned by the same xxhash64 survivor rule
    (serve.xxh64 is a bit-exact port of Spark's hash), and scoring
    uses the same sequential-IEEE numpy kernels
    (operators.argmin.single_query_dists / _seq_sq_l2).

Result: bit-identical rows to the Spark point paths on the same saved
store (pinned in tests/test_serve_local.py) at single-digit-to-tens of
ms per query (SCALE.md serving table).

100 TB shape: one reader process holds one store shard (the bucket
dirs it serves); a fleet of readers behind a router IS the serving
tier — Spark builds and compacts the stores, readers only ever read
probed partitions, so reader I/O is bounded by bucket size, not corpus
size. ``preload_vectors=True`` additionally pins the vector table in
reader RAM (the reference's own regime — its whole store is in-memory);
at shard sizes where that doesn't fit, lazy mode reads only candidate
row groups from the id-sorted vectors table.

Compaction contract (same rule as engine.compact / ingest_cycle): a
FULLY-PRELOADED reader serves its in-RAM snapshot through a store
rewrite (it never touches files after init — pinned in
test_reader_snapshot_across_compaction); any reader that still reads
from disk (lazy vectors, stats-pruned buckets, on-disk cells/codes)
holds file paths a compaction swap deletes and must be reconstructed
after 'rebuilt'/'compacted' cycles.
"""

from __future__ import annotations

import glob
import json
import math
import os

import numpy as np
import pandas as pd

from vector_search_go_spark.operators.argmin import (
    _seq_sq_l2,
    single_query_dists,
)
from vector_search_go_spark.streaming.delete import (
    drop_tombstoned,
    load_tombstone_array,
)

from vector_search_go_spark.serve.pqindex import (
    HivePartIndex,
    RowGroupIndex,
    TreeBucketIndex,
    binary_column_u8_matrix as _binary_column_u8_matrix,
    list_column_int_matrix,
    list_column_matrix,
)
from vector_search_go_spark.serve.xxh64 import (
    SEED,
    hash_int,
    hash_long,
    survivor_pmod_multi,
    survivor_pmod_vec,
)


def _result_frame(ids, dists, k: int, query_id: int) -> pd.DataFrame:
    """threshold-filtered candidates -> top-k by (dist, id) with rn,
    the exact (query_id, id, dist, rn) contract of the Spark paths
    (operators.topk.topk_per_group tie-break). Numeric ids sort via
    np.lexsort (a Python key-tuple sort over tens of thousands of
    candidates is serving-visible time); anything else falls back."""
    ids_arr = np.asarray(ids)
    if len(ids_arr) and np.issubdtype(ids_arr.dtype, np.number):
        d = np.asarray(dists, dtype=np.float64)
        if len(d) > 4 * k:
            # lexsort over 40k candidates is ms-visible; partition to
            # the k smallest dists, keep EVERY row tied with the k-th
            # (<= pivot), and lexsort only that set — identical
            # (dist, id) ranking by construction
            pivot = np.partition(d, k - 1)[k - 1]
            keep = np.nonzero(d <= pivot)[0]
            sub = np.lexsort((ids_arr[keep], d[keep]))[:k]
            order = keep[sub]
        else:
            order = np.lexsort((ids_arr, d))[:k]
        return pd.DataFrame(
            {
                "query_id": np.full(len(order), query_id, dtype=np.int64),
                "id": ids_arr[order],
                "dist": d[order],
                "rn": np.arange(1, len(order) + 1, dtype=np.int64),
            }
        )
    order = sorted(range(len(ids)), key=lambda i: (dists[i], ids[i]))[:k]
    return pd.DataFrame(
        {
            "query_id": np.full(len(order), query_id, dtype=np.int64),
            "id": [ids[i] for i in order],
            "dist": np.asarray([dists[i] for i in order], dtype=np.float64),
            "rn": np.arange(1, len(order) + 1, dtype=np.int64),
        }
    )


def meta_files(path: str, sub: str = "store_meta") -> list[str]:
    """The JSON part files of a one-line meta table under ``{path}/{sub}``,
    deduplicated (``*.json`` and ``part-*`` both match Spark's
    ``part-...json`` output) and sorted. Shared by every meta reader —
    store_meta, shards_meta, and the shortlist memo key."""
    return sorted(
        set(
            glob.glob(os.path.join(path, sub, "*.json"))
            + glob.glob(os.path.join(path, sub, "part-*"))
        )
    )


def parse_meta_files(files: list[str]) -> dict | None:
    """First meta_json payload in ``files``; None when no file holds
    one. Parse errors raise (absence != unreadable)."""
    for f in files:
        with open(f) as fh:
            for line in fh:
                line = line.strip()
                if line:
                    return json.loads(json.loads(line)["meta_json"])
    return None


def _read_store_meta(path: str) -> dict:
    """Read ``{path}/store_meta`` (one JSON line, written by ivf_save /
    scan_save) without Spark; {} when the store has none."""
    return parse_meta_files(meta_files(path)) or {}


def _is_swap_error(exc: BaseException) -> bool:
    """FileNotFound-class read errors — what a lookup sees when it
    races a compaction's two-rename directory swap (engine.compact /
    ingest_cycle): the file index resolved paths that the swap just
    deleted. Everything else (corruption, permissions, schema) must
    surface."""
    if isinstance(exc, FileNotFoundError):
        return True
    msg = str(exc)
    return isinstance(exc, (OSError, IOError)) and (
        "No such file" in msg or "does not exist" in msg
    )


def _swap_retry(fn):
    """One bounded reload-and-retry on swap errors (VERDICT r5 item 5,
    the SCALE.md compaction-probe posture: "a serving tier that
    retries once on read error sees zero failed lookups"). A plain
    retry cannot help — the reader's file indexes hold the PRE-swap
    paths — so the retry re-runs __init__ with the captured ctor args
    (rebuilding file indexes and any preloads against the post-swap
    store) and replays the lookup once. Correctness: lookups are pure
    reads, the store swap is atomic per directory (two renames), and a
    reconstructed reader is pinned bit-identical to the Spark point
    paths — so the retried answer is exactly the post-swap store's
    answer. NOT a concurrency primitive: reload mutates reader state,
    so multi-threaded serving keeps one reader per thread (the fleet
    shape in the module docstring)."""
    import functools

    @functools.wraps(fn)
    def wrapper(self, *args, **kwargs):
        try:
            return fn(self, *args, **kwargs)
        except Exception as exc:
            ctor = getattr(self, "_ctor", None)
            if ctor is None or not _is_swap_error(exc):
                raise
            self.__init__(**ctor)
            return fn(self, *args, **kwargs)

    return wrapper


# margin for the two-stage scorers: the BLAS stage's distance error is
# bounded by sqrt(64 * ulp(scale^2)) ~ 1e-7 * scale (worst case,
# near-duplicate cancellation); selecting everything within
# TWO_STAGE_MARGIN of the k-th approximate distance therefore provably
# contains the exact top-k (and every threshold-passing row), with
# ~400x headroom. Proof sketch: |approx-exact| <= m' and
# cutoff = kth_approx + m with m >= 2m' => any excluded candidate has
# exact > kth_approx + m - m' >= exact_kth + (m - 2m') >= the k-th
# exact distance, strictly — so exclusion never flips the exact
# (dist, id) ranking of the returned rows.
TWO_STAGE_MARGIN = 1e-4


def _two_stage_dists(
    metric: str,
    q: np.ndarray,
    V: np.ndarray,
    n2: np.ndarray,
    k: int,
    threshold: float | None,
    margin: float = TWO_STAGE_MARGIN,
) -> np.ndarray:
    """Distances of q to the rows of V, bit-identical to
    single_query_dists on every row that can be returned: a BLAS
    approximate pass (precomputed squared norms ``n2``) picks the
    margin set, the sequential-IEEE exact kernel rescores only that
    set. Shared by the LSH candidate scorer and the scan reader."""
    n = len(V)
    is_cos = metric in ("cosine", "angular")
    q2 = float(q @ q)
    dot = V @ q
    if is_cos:
        nq = math.sqrt(q2)
        if nq <= 1e-6:
            return single_query_dists(metric, q, V)
        nv = np.sqrt(n2)
        with np.errstate(divide="ignore", invalid="ignore"):
            approx = 1.0 - dot / (nq * nv)
        approx = np.where(nv <= 1e-6, 1.0, approx)
        m = margin
    else:
        approx = np.sqrt(np.maximum(n2 - 2.0 * dot + q2, 0.0))
        scale = math.sqrt(q2 + float(n2.max()))
        m = margin * max(1.0, scale)
    cutoff = np.partition(approx, k - 1)[k - 1] if n > k else np.inf
    cutoff += m
    if threshold is not None:
        cutoff = max(cutoff, float(threshold) + m)
    sel = approx <= cutoff
    dists = approx
    dists[sel] = single_query_dists(metric, q, V[sel])
    return dists


def _batch_queries(Q, query_ids):
    """Normalize a ``search_many`` batch shared by all three readers:
    float64 matrix, sequential default query_ids, length check."""
    Q = np.asarray(Q, dtype=np.float64)
    if query_ids is None:
        query_ids = np.arange(len(Q), dtype=np.int64)
    if len(query_ids) != len(Q):
        raise ValueError(
            f"search_many: {len(Q)} query vectors but "
            f"{len(query_ids)} query_ids"
        )
    return Q, query_ids


def _union_values(probes) -> list:
    """Distinct partition values across a batch's probe lists, first-seen
    order (the batch reads each probed cell once)."""
    needed, seen = [], set()
    for pr in probes:
        for c in pr:
            ci = int(c)
            if ci not in seen:
                seen.add(ci)
                needed.append(ci)
    return needed


def _cell_arrays(index: HivePartIndex, values, data_col: str, to_matrix) -> dict:
    """Decode partition tables to ``{value: (ids, matrix)}`` via the
    index's parallel reader; empty/missing partitions are dropped. The
    one (ids, matrix) builder behind both readers' preload modes and
    their batch paths."""
    tbls = index.read_values_parallel(list(values), ["id", data_col])
    return {
        v: (t.column("id").to_numpy(zero_copy_only=False), to_matrix(t))
        for v, t in tbls.items()
        if t is not None and t.num_rows
    }


class LocalLshReader:
    """Point lookups over a saved LSH index dir (LshIndex.save layout:
    model_config + model_nodes + buckets/tree=N/ + vectors)."""

    def __init__(
        self,
        path: str,
        metric: str,
        preload_vectors: bool = True,
        preload_buckets: bool = False,
        global_hot_buckets: dict | None = None,
    ):
        """``global_hot_buckets``: {(tree, hash): global_sz} for buckets
        whose WHOLE-STORE size exceeds config.max_bucket_size — passed
        by ShardedReader (serve.sharded) when this reader serves one
        id-shard of a larger store. The survivor rule is per-id
        deterministic given (tree, hash, keep_mod), so evaluating it
        with the GLOBAL keep_mod on each shard's local members makes
        the union across shards exactly the unsharded survivor set; a
        bucket absent from the dict is globally under the cap (local
        size <= global size), so it passes whole. None (default) =
        single-store semantics, sizes observed from this store."""
        import pyarrow.parquet as pq

        # captured for _swap_retry's reload-and-retry (reload == re-init)
        self._ctor = dict(
            path=path, metric=metric, preload_vectors=preload_vectors,
            preload_buckets=preload_buckets,
            global_hot_buckets=global_hot_buckets,
        )
        self._hot_global = global_hot_buckets
        self.path = path
        self.metric = metric
        # tombstoned ids (streaming.delete) masked from every candidate
        # BEFORE the survivor rule — live bucket sizes drive thinning,
        # matching a store re-saved without the ids
        self._tomb = load_tombstone_array(path)
        self.forest = self._load_forest(path)
        self.config = self.forest.config
        self._buckets = TreeBucketIndex(
            os.path.join(path, "buckets"), preload=preload_buckets
        )
        self._vec_path = os.path.join(path, "vectors")
        self._vec_index = None
        self._vec_rgindex = None
        self._norms2 = None
        if preload_vectors:
            # the reference's serving regime: the whole store lives
            # in process memory (store/kv/store.go), decoded zero-copy
            # from the Arrow buffers; numeric id lookup is a
            # searchsorted over the sorted id array (a per-candidate
            # Python dict probe is visible time at 10k+ candidates)
            tbl = pq.read_table(self._vec_path, columns=["id", "vec"])
            mat = list_column_matrix(tbl, "vec", self.config.dims)
            ids_arr = tbl.column("id").to_numpy(zero_copy_only=False)
            if np.issubdtype(ids_arr.dtype, np.number):
                # materialize the matrix ID-SORTED: candidate sets are
                # sorted (np.unique), so lookups gather monotonically
                # increasing rows — a near-sequential sweep instead of
                # random access over the whole matrix
                order = np.argsort(ids_arr, kind="stable")
                mat = np.ascontiguousarray(mat[order])
                self._vec_index = (ids_arr[order], None, mat)
                # squared norms for the two-stage scorer's BLAS stage
                self._norms2 = np.einsum("ij,ij->i", mat, mat)
            else:
                self._vec_index = (
                    {v: i for i, v in enumerate(ids_arr.tolist())},
                    None,
                    mat,
                )
        else:
            # lazy: id-sorted vectors + row-group stats = candidate
            # fetches read only matching row groups
            self._vec_rgindex = RowGroupIndex(
                glob.glob(os.path.join(self._vec_path, "*.parquet")), "id"
            )

    @staticmethod
    def _load_forest(path: str):
        import pyarrow.parquet as pq

        from vector_search_go_spark.config import LshConfig
        from vector_search_go_spark.lsh.hasher import Forest

        cfg_files = sorted(
            glob.glob(os.path.join(path, "model_config", "*.json"))
            + glob.glob(os.path.join(path, "model_config", "part-*"))
        )
        cfg_json = None
        for f in cfg_files:
            with open(f) as fh:
                for line in fh:
                    line = line.strip()
                    if line:
                        cfg_json = json.loads(line)["config_json"]
                        break
            if cfg_json:
                break
        if cfg_json is None:
            raise FileNotFoundError(f"no model_config JSON under {path}")
        rows = pq.read_table(os.path.join(path, "model_nodes")).to_pylist()
        return Forest.from_node_rows(LshConfig(**json.loads(cfg_json)), rows)

    # ------------------------------------------------------------------

    def _candidates(self, hashes: np.ndarray, probes: np.ndarray) -> list:
        """Probed-bucket reads + hot-bucket survivor rule + distinct —
        the pyarrow twin of lsh.search.point_bucket_candidates over
        lsh.search._bound_scanned_buckets. Per tree: row groups matched
        by hash min/max stats decode in a thread pool, the exact hash
        filter runs in numpy, then the xxhash64 thinning applies per
        physical bucket (sz counts physical rows, matching the Spark
        count window — see bound_hot_buckets)."""
        probe_map = {
            t: sorted({int(hashes[0, t]), int(probes[0, t])})
            for t in range(hashes.shape[1])
        }
        hit = self._buckets.probe_many(probe_map)
        if self._tomb is not None:
            hit = {
                t: (hv, i)
                for t, (hv0, i0) in hit.items()
                for i, hv in [drop_tombstoned(self._tomb, i0, hv0)]
                if len(i)
            }
        cap = self.config.max_bucket_size
        kept: list = []
        over: list = []  # (prefix, members, keep_mod) of hot buckets
        numeric = True
        for t in sorted(hit):
            hvals, ids = hit[t]
            numeric = numeric and np.issubdtype(ids.dtype, np.number)
            if cap is None:
                kept.append(ids)
                continue
            tree_prefix = hash_int(int(t), SEED)
            for h in np.unique(hvals):
                sel = ids[hvals == h]
                if self._hot_global is not None:
                    # sharded store: hotness and keep_mod come from the
                    # WHOLE-store size so the per-id survivor predicate
                    # matches the unsharded reader's exactly
                    g = self._hot_global.get((int(t), int(h)))
                    if g is None:
                        kept.append(sel)
                        continue
                    mod = int(math.ceil(g / cap))
                else:
                    sz = len(sel)
                    if sz <= cap:
                        kept.append(sel)
                        continue
                    mod = int(math.ceil(sz / cap))
                if not numeric:
                    pm = survivor_pmod_vec(t, int(h), sel, mod)
                    kept.append(sel[pm == 0])
                    continue
                over.append((hash_long(int(h), tree_prefix), sel, mod))
        if over:
            # one batched hash pass over every hot bucket's members
            # (survivor_pmod_multi) instead of a vectorized call per
            # bucket — same bits, ~5x less per-query overhead
            members = np.concatenate([s for _, s, _ in over])
            pm = survivor_pmod_multi(
                [p for p, _, _ in over],
                [len(s) for _, s, _ in over],
                members,
                [m for _, _, m in over],
            )
            kept.append(members[pm == 0])
        if not kept:
            return np.empty(0, dtype=np.int64) if numeric else []
        allk = np.concatenate(kept)
        if numeric:
            return np.unique(allk)
        return list(dict.fromkeys(allk.tolist()))

    def _fetch_vectors(self, cand: list):
        """-> (ids, V, rows) where rows are V's row indices into the
        preloaded matrix (None on the lazy / string-keyed paths, which
        score with the full exact kernel)."""
        if self._vec_index is not None:
            index, _, mat = self._vec_index
            if isinstance(index, dict):  # string-keyed fallback
                found = [c for c in cand if c in index]
                return found, mat[[index[c] for c in found]], None
            c = np.asarray(cand)
            pos = np.searchsorted(index, c)
            ok = pos < len(index)
            ok[ok] = index[pos[ok]] == c[ok]
            rows = pos[ok]  # id-sorted matrix: position IS the row
            return c[ok], mat[rows], rows
        tbl = self._vec_rgindex.read(sorted(cand), ["id", "vec"])
        if tbl is None or tbl.num_rows == 0:
            return [], np.empty((0, self.config.dims)), None
        ids = tbl.column("id").to_numpy(zero_copy_only=False)
        mask = np.isin(ids, np.asarray(sorted(cand)))
        V = list_column_matrix(tbl, "vec", self.config.dims)
        return ids[mask].tolist(), V[mask], None

    # kept as a class attribute for existing callers/tests; the proof
    # lives at the module-level constant
    TWO_STAGE_MARGIN = TWO_STAGE_MARGIN

    def _score(self, q: np.ndarray, V: np.ndarray, rows, k: int,
               threshold: float | None) -> np.ndarray:
        """Distances of q to V, bit-identical to single_query_dists on
        every row that can be returned. Large preloaded candidate sets
        use the shared two-stage scorer (_two_stage_dists) — the
        64-strided-pass exact kernel over 40k+ candidates was ~50 ms
        of the serving path."""
        if rows is None or len(V) <= 2048:
            return single_query_dists(self.metric, q, V)
        return _two_stage_dists(
            self.metric, q, V, self._norms2[rows], k, threshold,
            self.TWO_STAGE_MARGIN,
        )

    @_swap_retry
    def search(
        self,
        qvec,
        k: int = 10,
        threshold: float | None = None,
        query_id: int = 0,
    ) -> pd.DataFrame:
        q = np.asarray(list(qvec), dtype=np.float64)
        hashes = self.forest.hash_batch(q[None, :])
        probes = self.forest.probe_batch(hashes)
        cand = self._candidates(hashes, probes)
        if len(cand) == 0:
            return _result_frame([], [], k, query_id)
        ids, V, rows = self._fetch_vectors(cand)
        dists = self._score(q, V, rows, k, threshold)
        if threshold is not None:
            m = dists <= float(threshold)
            ids = (
                ids[m]
                if isinstance(ids, np.ndarray)
                else [i for i, keep in zip(ids, m) if keep]
            )
            dists = dists[m]
        return _result_frame(ids, dists, k, query_id)

    @_swap_retry
    def search_many(
        self,
        Q,
        k: int = 10,
        threshold: float | None = None,
        query_ids=None,
    ) -> pd.DataFrame:
        """Batch point lookups: row-identical to per-query ``search``
        concatenated (pinned in tests/test_serve_local.py), with the
        forest hashing amortized across the batch — one vectorized
        hash_batch/probe_batch pass instead of per-query tree walks.
        The per-query candidate work (probe, survivor rule, gather,
        two-stage score) is already bounded by bucket mass, so a
        serving tier that batches arrivals pays the reader's floor
        once per batch, not once per query."""
        Q, query_ids = _batch_queries(Q, query_ids)
        if len(Q) == 0:
            return _result_frame([], [], k, 0)
        hashes = self.forest.hash_batch(Q)
        probes = self.forest.probe_batch(hashes)
        frames = []
        for i, qid in enumerate(query_ids):
            cand = self._candidates(hashes[i : i + 1], probes[i : i + 1])
            if len(cand) == 0:
                frames.append(_result_frame([], [], k, int(qid)))
                continue
            ids, V, rows = self._fetch_vectors(cand)
            dists = self._score(Q[i], V, rows, k, threshold)
            if threshold is not None:
                m = dists <= float(threshold)
                ids = (
                    ids[m]
                    if isinstance(ids, np.ndarray)
                    else [x for x, keep in zip(ids, m) if keep]
                )
                dists = dists[m]
            frames.append(_result_frame(ids, dists, k, int(qid)))
        return pd.concat(frames, ignore_index=True)


class LocalIvfReader:
    """Point lookups over a saved IVF store (ivf_save layout:
    centroids + cells/cell=N/ holding full vectors).

    ``preload_cells=True`` pins every cell's (ids, matrix) in reader
    RAM at init — the fully in-memory regime (same trade as the LSH
    reader's ``preload_buckets``): a probe becomes a dict lookup +
    numpy concat instead of per-query parquet decode."""

    def __init__(self, path: str, metric: str = "cosine",
                 preload_cells: bool = False):
        import pyarrow.parquet as pq

        self._ctor = dict(path=path, metric=metric, preload_cells=preload_cells)
        self._tomb = load_tombstone_array(path)
        self.path = path
        self.metric = metric
        tbl = pq.read_table(os.path.join(path, "centroids"))
        rows = sorted(
            zip(tbl.column("cid").to_pylist(), tbl.column("cvec").to_pylist())
        )
        self.model = (
            np.array([r[0] for r in rows], dtype=np.int64),
            np.array([r[1] for r in rows], dtype=np.float64),
        )
        self.dims = self.model[1].shape[1]
        self._cells = HivePartIndex(os.path.join(path, "cells"), "cell")
        self._mem_cells = None
        if preload_cells:
            # parquet reads release the GIL — fan the one-time preload
            # across the index's thread pool instead of one cell at a
            # time
            self._mem_cells = _cell_arrays(
                self._cells, self._cells.values(), "vec",
                lambda t: list_column_matrix(t, "vec", self.dims),
            )

    @_swap_retry
    def search(
        self,
        qvec,
        k: int = 10,
        nprobe: int = 4,
        threshold: float | None = None,
        query_id: int = 0,
    ) -> pd.DataFrame:
        import pyarrow as pa

        from vector_search_go_spark.operators.ann_ivf import probe_cells_for

        q = np.asarray(list(qvec), dtype=np.float64)
        probed = probe_cells_for(None, None, q, self.metric, nprobe, model=self.model)
        if self._mem_cells is not None:
            hits = [
                self._mem_cells[int(c)]
                for c in probed
                if int(c) in self._mem_cells
            ]
            if not hits:
                return _result_frame([], [], k, query_id)
            ids = np.concatenate([h[0] for h in hits])
            V = np.concatenate([h[1] for h in hits])
        else:
            tbls = [
                t for t in
                self._cells.read_values_parallel(probed, ["id", "vec"]).values()
                if t is not None and t.num_rows
            ]
            if not tbls:
                return _result_frame([], [], k, query_id)
            tbl = pa.concat_tables(tbls, promote_options="permissive")
            ids = tbl.column("id").to_numpy(zero_copy_only=False)
            V = list_column_matrix(tbl, "vec", self.dims)
        ids, V = drop_tombstoned(self._tomb, ids, V)
        if len(ids) == 0:
            return _result_frame([], [], k, query_id)
        dists = single_query_dists(self.metric, q, V)
        if threshold is not None:
            m = dists <= float(threshold)
            ids = ids[m]
            dists = dists[m]
        return _result_frame(ids, dists, k, query_id)

    @_swap_retry
    def search_many(
        self,
        Q,
        k: int = 10,
        nprobe: int = 4,
        threshold: float | None = None,
        query_ids=None,
    ) -> pd.DataFrame:
        """Batch point lookups, row-identical to per-query ``search``
        concatenated (pinned in tests/test_serve_local.py). Each
        distinct probed cell is decoded ONCE per batch — queries
        probing overlapping cells share the parquet read, so batch
        cost is bounded by the UNION of probed cells, not
        batch x nprobe. Per-query scoring order is unchanged (cells in
        probe order, rows in store order), so results cannot differ."""
        from vector_search_go_spark.operators.ann_ivf import probe_cells_for

        Q, query_ids = _batch_queries(Q, query_ids)
        if len(Q) == 0:
            return _result_frame([], [], k, 0)
        probes = [
            probe_cells_for(None, None, Q[i], self.metric, nprobe,
                            model=self.model)
            for i in range(len(Q))
        ]
        if self._mem_cells is not None:
            cell_map = self._mem_cells
        else:
            cell_map = _cell_arrays(
                self._cells, _union_values(probes), "vec",
                lambda t: list_column_matrix(t, "vec", self.dims),
            )
        frames = []
        for i, qid in enumerate(query_ids):
            hits = [
                cell_map[int(c)] for c in probes[i] if int(c) in cell_map
            ]
            if not hits:
                frames.append(_result_frame([], [], k, int(qid)))
                continue
            ids = np.concatenate([h[0] for h in hits])
            V = np.concatenate([h[1] for h in hits])
            ids, V = drop_tombstoned(self._tomb, ids, V)
            if len(ids) == 0:
                frames.append(_result_frame([], [], k, int(qid)))
                continue
            dists = single_query_dists(self.metric, Q[i], V)
            if threshold is not None:
                m = dists <= float(threshold)
                ids = ids[m]
                dists = dists[m]
            frames.append(_result_frame(ids, dists, k, int(qid)))
        return pd.concat(frames, ignore_index=True)


class LocalIvfPqReader:
    """Point lookups over a saved IVFADC store (ivfpq_save layout:
    centroids + codebook + cells/cell=N/ codes + id-sorted vectors).
    L2-only, like the store itself.

    ``preload_codes=True`` pins the per-cell (ids, codes) arrays in
    reader RAM — the canonical IVFADC memory contract (codes are
    M_SUB bytes/vector, ~8 MB at 1M; full vectors stay on disk and are
    read only for the shortlist rerank). A probe then skips the
    per-query parquet decode entirely; results are identical because
    shortlist selection keys on (adc_dist, id) and ids are unique
    across cells, so cell concat order cannot matter.

    ``preload_vectors=True`` additionally pins the full-precision
    vectors table (id-sorted numpy arrays, n x dims x 8 B — ~512 MB at
    1M x 64): the shortlist rerank becomes two searchsorted slices
    instead of a scattered row-group read. This is the IVF-Flat-in-RAM
    rerank regime, NOT the default codes-only contract — reach for it
    when batch rerank I/O is the measured bottleneck (the r7 SCALE.md
    sharded-batch inversion) and shard RAM allows; results are
    bit-identical because rerank rows are per-id independent and every
    downstream consumer ranks by (dist, id)."""

    def __init__(
        self,
        path: str,
        preload_codes: bool = False,
        preload_vectors: bool = False,
        preload_sq8: bool = False,
    ):
        import pyarrow.parquet as pq

        self._ctor = dict(
            path=path,
            preload_codes=preload_codes,
            preload_vectors=preload_vectors,
            preload_sq8=preload_sq8,
        )
        self.path = path
        self._tomb = load_tombstone_array(path)
        ctbl = pq.read_table(os.path.join(path, "centroids"))
        crows = sorted(
            zip(ctbl.column("cid").to_pylist(), ctbl.column("cvec").to_pylist())
        )
        self.coarse = (
            np.array([r[0] for r in crows], dtype=np.int64),
            np.array([r[1] for r in crows], dtype=np.float64),
        )
        btbl = pq.read_table(os.path.join(path, "codebook"))
        brows = sorted(
            zip(
                btbl.column("sub").to_pylist(),
                btbl.column("code").to_pylist(),
                btbl.column("cvec").to_pylist(),
            )
        )
        self.cb_ids: dict[int, np.ndarray] = {}
        self.cb_mats: dict[int, np.ndarray] = {}
        for sub in sorted({r[0] for r in brows}):
            sr = [r for r in brows if r[0] == sub]
            self.cb_ids[sub] = np.array([r[1] for r in sr], dtype=np.int64)
            self.cb_mats[sub] = np.array([r[2] for r in sr], dtype=np.float64)
        self.dims = self.coarse[1].shape[1]
        self._cpos = {int(c): i for i, c in enumerate(self.coarse[0])}
        self._cells = HivePartIndex(os.path.join(path, "cells"), "cell")
        self._vectors = RowGroupIndex(
            glob.glob(os.path.join(path, "vectors", "*.parquet")), "id"
        )
        self._mem_codes = None
        meta = _read_store_meta(path)
        # rebuild-time measured rerank budget (maintain_ivfpq +
        # adc_shortlist_probe); 0 = none recorded. Read once here so
        # lookups pay nothing; default-shortlist resolution must match
        # ivfpq_point_search's (parity pins in tests/test_serve_local.py).
        self._rec_shortlist = int(meta.get("recommended_shortlist", 0))
        # 'residual' stores score each candidate under its CELL's LUT
        # (q - centroid(cell)); stores predating the tag are 'raw'
        # (one global LUT per query) — same resolution as
        # pq.store_encoding
        self.encoding = str(meta.get("encoding", "raw"))
        if preload_codes:
            from vector_search_go_spark.operators.pq import M_SUB

            self._mem_codes = _cell_arrays(
                self._cells, self._cells.values(), "codes",
                lambda t: list_column_int_matrix(t, "codes", M_SUB),
            )
        self._mem_vectors = None
        if preload_vectors:
            tbl = pq.read_table(
                sorted(glob.glob(os.path.join(path, "vectors", "*.parquet"))),
                columns=["id", "vec"],
            )
            rid = tbl.column("id").to_numpy(zero_copy_only=False)
            V = list_column_matrix(tbl, "vec", self.dims)
            # appended (uncompacted) stores are not globally id-sorted —
            # sort here; duplicates stay adjacent with their multiplicity
            order = np.argsort(rid, kind="stable")
            self._mem_vectors = (
                np.ascontiguousarray(rid[order]),
                np.ascontiguousarray(V[order]),
            )
        # SQ8 rerank tier (VERDICT r10 item 4): optional vectors_sq8 +
        # sq8_stats tables (write_sq8_tier / sq8_augment_store). When
        # present, search(rerank='sq8') scores the ADC shortlist
        # against the 8x-smaller uint8 codes and exact-reranks only a
        # small top-K' — the IO cut that makes big measured shortlists
        # servable. preload_sq8 pins the codes (n x dims BYTES — ~6 GB
        # at 100M x 64, pinnable where the 51 GB floats are not).
        self._sq8_stats = None
        self._sq8_index = None
        self._mem_sq8 = None
        sq8_files = sorted(
            glob.glob(os.path.join(path, "vectors_sq8", "*.parquet"))
        )
        if sq8_files:
            srow = pq.read_table(os.path.join(path, "sq8_stats"))
            self._sq8_stats = (
                np.array(srow.column("mins").to_pylist()[0], dtype=np.float64),
                np.array(srow.column("scales").to_pylist()[0], dtype=np.float64),
            )
            self._sq8_index = RowGroupIndex(sq8_files, "id")
            if preload_sq8:
                tbl = pq.read_table(sq8_files, columns=["id", "codes"])
                rid = tbl.column("id").to_numpy(zero_copy_only=False)
                C = _binary_column_u8_matrix(tbl, "codes", self.dims)
                order = np.argsort(rid, kind="stable")
                self._mem_sq8 = (
                    np.ascontiguousarray(rid[order]),
                    np.ascontiguousarray(C[order]),
                )

    # -- shared pieces of the ADC pipeline (search / shard_candidates) --

    def _n_codes(self) -> int:
        return max(int(self.cb_ids[s].max()) for s in self.cb_ids) + 1

    def _query_lut(self, q: np.ndarray, n_codes: int) -> np.ndarray:
        """The query's per-subspace ADC lookup table — same construction
        as ivfpq_point_search (sequential-IEEE kernel, so the table is
        bit-identical wherever it is built: unsharded reader, shard
        reader, Spark path)."""
        from vector_search_go_spark.operators.pq import D_SUB, M_SUB

        lut = np.zeros((M_SUB, n_codes))
        for sub in range(M_SUB):
            sl = q[sub * D_SUB : (sub + 1) * D_SUB][None, :]
            lut[sub, self.cb_ids[sub]] = _seq_sq_l2(sl, self.cb_mats[sub])[0]
        return lut

    def _gather_codes(self, probed):
        """(ids, codes matrix, cell per row) of the probed cells —
        preloaded arrays or a parallel parquet decode; (None, None,
        None) when nothing is hit. The per-row cell array is what the
        residual scorer keys its per-cell LUTs on (raw stores ignore
        it)."""
        from vector_search_go_spark.operators.pq import M_SUB

        if self._mem_codes is not None:
            hits = [
                (int(c), *self._mem_codes[int(c)])
                for c in probed
                if int(c) in self._mem_codes
            ]
            if not hits:
                return None, None, None
            ids, C, cells = drop_tombstoned(
                self._tomb,
                np.concatenate([h[1] for h in hits]),
                np.concatenate([h[2] for h in hits]),
                np.concatenate(
                    [np.full(len(h[1]), h[0], dtype=np.int64) for h in hits]
                ),
            )
            return (ids, C, cells) if len(ids) else (None, None, None)
        tbls = [
            (int(v), t)
            for v, t in self._cells.read_values_parallel(
                probed, ["id", "codes"]
            ).items()
            if t is not None and t.num_rows
        ]
        if not tbls:
            return None, None, None
        ids, C, cells = drop_tombstoned(
            self._tomb,
            np.concatenate(
                [t.column("id").to_numpy(zero_copy_only=False) for _, t in tbls]
            ),
            np.concatenate(
                [list_column_int_matrix(t, "codes", M_SUB) for _, t in tbls]
            ),
            np.concatenate(
                [np.full(t.num_rows, v, dtype=np.int64) for v, t in tbls]
            ),
        )
        return (ids, C, cells) if len(ids) else (None, None, None)

    def _rerank_rows(self, short_ids):
        """(ids, V) of every vectors row whose id is in ``short_ids``,
        WITH multiplicity — the rerank fetch all four search paths
        share. Preloaded regime: searchsorted slices over the pinned
        id-sorted arrays; disk regime: stats-pruned row-group read +
        exact isin filter. Row ORDER differs between the regimes
        (id-sorted vs store order) and between serial/parallel disk
        reads is identical; every consumer is order-independent —
        _result_frame ranks by (dist, id) and the dmap/vcount builders
        aggregate per id (replay-duplicate rows carry identical vecs).
        Returns (None, None) when nothing matches."""
        # unique: a replayed id can occupy several shortlist SLOTS; the
        # fetch is keyed per id (the isin mask is set-semantic, and a
        # duplicated searchsorted span would emit its rows twice)
        ks = np.unique(np.fromiter(short_ids, dtype=np.int64))
        if self._mem_vectors is not None:
            rid_s, V_s = self._mem_vectors
            lo = np.searchsorted(rid_s, ks, side="left")
            hi = np.searchsorted(rid_s, ks, side="right")
            spans = [(a, b) for a, b in zip(lo, hi) if b > a]
            if not spans:
                return None, None
            sel = np.concatenate([np.arange(a, b) for a, b in spans])
            return rid_s[sel], V_s[sel]
        vtbl = self._vectors.read(ks.tolist(), ["id", "vec"])
        if vtbl is None or vtbl.num_rows == 0:
            return None, None
        rid = vtbl.column("id").to_numpy(zero_copy_only=False)
        mask = np.isin(rid, ks)
        if not mask.any():
            return None, None
        return rid[mask], list_column_matrix(vtbl, "vec", self.dims)[mask]

    def _sq8_rows(self, short_ids):
        """(unique ids, uint8 codes) of the SQ8-tier rows whose id is in
        ``short_ids`` — the compressed twin of _rerank_rows. Duplicates
        (streaming replays) carry identical codes, so one row per id is
        kept; (None, None) when nothing matches."""
        ks = np.unique(np.fromiter(short_ids, dtype=np.int64))
        if self._mem_sq8 is not None:
            rid_s, C_s = self._mem_sq8
            lo = np.searchsorted(rid_s, ks, side="left")
            hi = np.searchsorted(rid_s, ks, side="right")
            sel = lo[hi > lo]  # first row per present id
            if not len(sel):
                return None, None
            return rid_s[sel], C_s[sel]
        tbl = self._sq8_index.read(ks.tolist(), ["id", "codes"])
        if tbl is None or tbl.num_rows == 0:
            return None, None
        rid = tbl.column("id").to_numpy(zero_copy_only=False)
        mask = np.isin(rid, ks)
        if not mask.any():
            return None, None
        rid = rid[mask]
        C = _binary_column_u8_matrix(tbl, "codes", self.dims)[mask]
        uid, first = np.unique(rid, return_index=True)
        return uid, C[first]

    def _require_sq8(self) -> None:
        if self._sq8_stats is None:
            raise ValueError(
                f"store at {self.path!r} has no SQ8 rerank tier "
                "(vectors_sq8/sq8_stats) — build with ivfpq_save("
                "sq8=True) or run pq.sq8_augment_store"
            )

    def _resolve_sq8_keep(self, k: int, sq8_keep) -> int:
        from vector_search_go_spark.operators.pq import pq_shortlist

        return pq_shortlist(k) if sq8_keep is None else int(sq8_keep)

    def _sq8_select(self, q: np.ndarray, slot_ids, keep: int):
        """ADC-shortlist slot ids -> the top-``keep`` unique ids by
        (sq8_dist, id) — the compressed-domain refinement between ADC
        shortlist and exact rerank. Ids with no SQ8 row drop here, the
        same place the exact path's isin mask would drop ids with no
        vectors row. None when nothing matches."""
        from vector_search_go_spark.operators.sq8 import sq8_dists_np

        uid, C = self._sq8_rows(slot_ids)
        if uid is None:
            return None
        mins, scales = self._sq8_stats
        d8 = sq8_dists_np(q, mins, scales, C)
        sel = np.lexsort((uid, d8))[:keep]
        return uid[sel]

    @_swap_retry
    def fetch_dists(self, qvec, ids, query_id: int = 0) -> pd.DataFrame:
        """(query_id, id, dist) of THIS store's vectors rows whose id is
        in ``ids`` — exact L2, one row per vectors row (multiplicity
        preserved). The phase-2 leg of the sharded SQ8-rerank protocol:
        the router selects the global sq8-top-K' and asks each shard
        for exact distances of just those ids (each id lives in exactly
        one shard, so the union is disjoint)."""
        q = np.asarray(list(qvec), dtype=np.float64)
        ids = np.asarray(list(ids), dtype=np.int64)
        if not len(ids):
            return pd.DataFrame(
                {"query_id": [], "id": [], "dist": []}
            ).astype({"query_id": np.int64, "id": np.int64, "dist": np.float64})
        rids, V = self._rerank_rows(ids)
        if rids is None:
            return pd.DataFrame(
                {"query_id": [], "id": [], "dist": []}
            ).astype({"query_id": np.int64, "id": np.int64, "dist": np.float64})
        dists = single_query_dists("l2", q, V)
        return pd.DataFrame(
            {
                "query_id": np.full(len(rids), query_id, dtype=np.int64),
                "id": rids,
                "dist": np.asarray(dists, dtype=np.float64),
            }
        )

    @staticmethod
    def _adc_of(lut: np.ndarray, C: np.ndarray) -> np.ndarray:
        """sqrt of the subspace-ordered LUT fold — the exact float the
        unsharded search computes per candidate."""
        from vector_search_go_spark.operators.pq import M_SUB

        acc = np.zeros(len(C))
        for sub in range(M_SUB):
            acc = acc + lut[sub][C[:, sub]]
        return np.sqrt(acc)

    def _adc_dists(self, q: np.ndarray, C: np.ndarray,
                   cells: np.ndarray) -> np.ndarray:
        """ADC score of every candidate row under the store's own
        encoding — THE scoring entry point all four search paths call.
        Raw: one global LUT per query (_query_lut + _adc_of). Residual:
        one LUT per (query, candidate cell) over q - centroid(cell)
        (pq.residual_lut — the same sequential-IEEE construction the
        Spark point paths and the shortlist probe use, so sharded /
        unsharded / Spark stay bit-identical)."""
        from vector_search_go_spark.operators.pq import M_SUB, residual_lut

        n_codes = self._n_codes()
        if self.encoding != "residual":
            return self._adc_of(self._query_lut(q, n_codes), C)
        Cmat = self.coarse[1]
        acc = np.empty(len(C))
        for cell in np.unique(cells):
            m = cells == cell
            lut = residual_lut(
                q, Cmat[self._cpos[int(cell)]], self.cb_ids, self.cb_mats,
                n_codes,
            )
            a = np.zeros(int(m.sum()))
            Cm = C[m]
            for sub in range(M_SUB):
                a = a + lut[sub][Cm[:, sub]]
            acc[m] = a
        return np.sqrt(acc)

    @staticmethod
    def _adc_topl(ids, adc: np.ndarray, shortlist: int):
        """Indices of the local ADC top-``shortlist`` by (adc, id) —
        the same tie-break as the unsharded shortlist selection."""
        if np.issubdtype(np.asarray(ids).dtype, np.number):
            return np.lexsort((ids, adc))[:shortlist]
        return np.asarray(
            sorted(range(len(ids)), key=lambda i: (adc[i], ids[i]))[:shortlist],
            dtype=np.int64,
        )

    @staticmethod
    def _cand_frame(query_id: int, ids, adc, dist, vmult) -> pd.DataFrame:
        """One row per local-shortlist SLOT. ``vmult`` = this id's row
        count in the shard's vectors table: the unsharded search's
        output multiplicity is the VECTORS multiplicity (its isin mask
        selects vectors rows), while shortlist slots are CODES-row
        multiplicity — at-least-once streaming replays or a
        one-component dedup compaction can make these differ, so the
        router needs both to reproduce the unsharded rows exactly."""
        return pd.DataFrame(
            {
                "query_id": np.full(len(ids), query_id, dtype=np.int64),
                "id": ids,
                "adc": np.asarray(adc, dtype=np.float64),
                "dist": np.asarray(dist, dtype=np.float64),
                "vmult": np.asarray(vmult, dtype=np.int64),
            }
        )

    @_swap_retry
    def search(
        self,
        qvec,
        k: int = 10,
        nprobe: int = 4,
        shortlist: int | None = None,
        query_id: int = 0,
        rerank: str = "exact",
        sq8_keep: int | None = None,
    ) -> pd.DataFrame:
        """``rerank='sq8'`` (VERDICT r10 item 4): two-stage refinement —
        the ADC top-``shortlist`` is scored against the store's SQ8
        tier first and only the top-``sq8_keep`` (default: the
        pq_shortlist floor) unique ids pay the exact float fetch. With
        sq8_keep >= shortlist the sq8 stage keeps everything, so the
        result is identical to rerank='exact' (the parity pin); with a
        large measured shortlist and a floor-sized keep it trades the
        bulk of the rerank IO for 8x-cheaper compressed reads."""
        from vector_search_go_spark.operators.ann_ivf import probe_cells_for
        from vector_search_go_spark.operators.pq import pq_shortlist

        if rerank not in ("exact", "sq8"):
            raise ValueError(f"unknown rerank mode {rerank!r}")
        if rerank == "sq8":
            self._require_sq8()
        if shortlist is None:
            shortlist = max(self._rec_shortlist, pq_shortlist(k))
        q = np.asarray(list(qvec), dtype=np.float64)
        probed = probe_cells_for(None, None, q, "l2", nprobe, model=self.coarse)
        # the bit-parity-critical ADC pipeline lives ONCE in the shared
        # helpers — search, search_many, and the shard_candidates legs
        # all call the same gather/LUT/fold/tie-break code
        ids, C, cells = self._gather_codes(probed)
        if ids is None:
            return _result_frame([], [], k, query_id)
        adc = self._adc_dists(q, C, cells)
        short = self._adc_topl(ids, adc, shortlist)
        short_ids = (ids[i] for i in short)
        if rerank == "sq8":
            kept = self._sq8_select(
                q, (ids[i] for i in short),
                self._resolve_sq8_keep(k, sq8_keep),
            )
            if kept is None:
                return _result_frame([], [], k, query_id)
            short_ids = kept
        rids, V = self._rerank_rows(short_ids)
        if rids is None:
            return _result_frame([], [], k, query_id)
        dists = single_query_dists("l2", q, V)
        return _result_frame(rids.tolist(), list(dists), k, query_id)

    @_swap_retry
    def search_many(
        self,
        Q,
        k: int = 10,
        nprobe: int = 4,
        shortlist: int | None = None,
        query_ids=None,
        rerank: str = "exact",
        sq8_keep: int | None = None,
    ) -> pd.DataFrame:
        """Batch point lookups, row-identical to per-query ``search``
        concatenated (pinned in tests/test_serve_local.py). Two batch
        amortizations, neither able to change results: (a) each
        distinct probed cell's (ids, codes) decode is shared across
        the batch (per-query ADC order is unchanged: cells in probe
        order, rows in store order); (b) the shortlist vector rerank
        reads the UNION of the batch's shortlist ids in one id-sorted
        pass — per query the isin mask selects exactly the rows its
        own read would have, in the same store order."""
        from vector_search_go_spark.operators.ann_ivf import probe_cells_for
        from vector_search_go_spark.operators.pq import M_SUB, pq_shortlist

        if rerank not in ("exact", "sq8"):
            raise ValueError(f"unknown rerank mode {rerank!r}")
        if rerank == "sq8":
            self._require_sq8()
        if shortlist is None:
            shortlist = max(self._rec_shortlist, pq_shortlist(k))
        Q, query_ids = _batch_queries(Q, query_ids)
        if len(Q) == 0:
            return _result_frame([], [], k, 0)
        probes = [
            probe_cells_for(None, None, Q[i], "l2", nprobe, model=self.coarse)
            for i in range(len(Q))
        ]
        if self._mem_codes is not None:
            cell_map = self._mem_codes
        else:
            cell_map = _cell_arrays(
                self._cells, _union_values(probes), "codes",
                lambda t: list_column_int_matrix(t, "codes", M_SUB),
            )

        per_query = []  # (qid, qvec, short_ids) -- scored after one union read
        union_ids: set = set()
        for i, qid in enumerate(query_ids):
            hits = [
                (int(c), *cell_map[int(c)])
                for c in probes[i]
                if int(c) in cell_map
            ]
            if not hits:
                per_query.append((int(qid), Q[i], None))
                continue
            ids = np.concatenate([h[1] for h in hits])
            C = np.concatenate([h[2] for h in hits])
            cells = np.concatenate(
                [np.full(len(h[1]), h[0], dtype=np.int64) for h in hits]
            )
            ids, C, cells = drop_tombstoned(self._tomb, ids, C, cells)
            if len(ids) == 0:
                per_query.append((int(qid), Q[i], None))
                continue
            adc = self._adc_dists(Q[i], C, cells)
            short = self._adc_topl(ids, adc, shortlist)
            if rerank == "sq8":
                kept = self._sq8_select(
                    Q[i], (ids[j] for j in short),
                    self._resolve_sq8_keep(k, sq8_keep),
                )
                if kept is None:
                    per_query.append((int(qid), Q[i], None))
                    continue
                short_ids = sorted(int(x) for x in kept)
            else:
                short_ids = sorted(ids[j] for j in short)
            union_ids.update(short_ids)
            per_query.append((int(qid), Q[i], short_ids))

        rid_all, V_all = (
            self._rerank_rows(union_ids) if union_ids else (None, None)
        )

        frames = []
        for qid, qv, short_ids in per_query:
            if short_ids is None or rid_all is None:
                frames.append(_result_frame([], [], k, qid))
                continue
            mask = np.isin(rid_all, np.asarray(short_ids))
            rids = rid_all[mask].tolist()
            if not rids:
                frames.append(_result_frame([], [], k, qid))
                continue
            dists = single_query_dists("l2", qv, V_all[mask])
            frames.append(_result_frame(rids, list(dists), k, qid))
        return pd.concat(frames, ignore_index=True)

    @_swap_retry
    def shard_candidates(
        self,
        qvec,
        shortlist: int,
        nprobe: int = 4,
        query_id: int = 0,
    ) -> pd.DataFrame:
        """The per-shard leg of the sharded IVFADC composition
        (serve/sharded.py): this store's LOCAL ADC top-``shortlist`` by
        (adc, id), each row carrying BOTH its ADC score and its exact
        rerank distance -> (query_id, id, adc, dist).

        The router merges these by (adc, id), keeps the GLOBAL
        top-``shortlist``, and ranks those by (dist, id) — bit-identical
        to the unsharded search because (a) every member of the global
        ADC top-L is, within its own shard, in that shard's top-L
        (selection monotone), (b) ADC floats are comparable across
        shards (identical codebook => identical LUT => identical fold),
        and (c) exact distances are per-row independent, so reranking a
        SUPERSET shard-side changes no returned value. ``dist`` is NaN
        for an id whose vectors row is missing — the router drops those
        AFTER the global shortlist selection, exactly where the
        unsharded search's isin mask drops them. ``vmult`` carries the
        id's VECTORS-table row count (see _cand_frame): replay
        duplicates make slot and output multiplicities differ, and the
        unsharded output multiplicity is the vectors one."""
        from vector_search_go_spark.operators.ann_ivf import probe_cells_for

        q = np.asarray(list(qvec), dtype=np.float64)
        probed = probe_cells_for(None, None, q, "l2", nprobe, model=self.coarse)
        ids, C, cells = self._gather_codes(probed)
        if ids is None:
            return self._cand_frame(
                query_id, np.empty(0, dtype=np.int64), [], [], []
            )
        adc = self._adc_dists(q, C, cells)
        short = self._adc_topl(ids, adc, shortlist)
        sids, sadc = ids[short], adc[short]
        dmap, vcount = self._rerank_maps(q, sorted(sids.tolist()))
        dist = [dmap.get(i, np.nan) for i in sids.tolist()]
        vmult = [vcount.get(i, 0) for i in sids.tolist()]
        return self._cand_frame(query_id, sids, sadc, dist, vmult)

    def _rerank_maps(self, q: np.ndarray, short_ids):
        """{id: exact dist} + {id: vectors-row count} for a shortlist's
        vector fetch (_rerank_rows). Replay-duplicate vectors rows carry
        identical vecs, so one dist per id suffices; the COUNT is what
        the router needs to reproduce the unsharded output
        multiplicity."""
        dmap: dict = {}
        vcount: dict = {}
        rid, V = self._rerank_rows(short_ids)
        if rid is not None:
            dd = single_query_dists("l2", q, V)
            for i, d in zip(rid.tolist(), dd.tolist()):
                vcount[i] = vcount.get(i, 0) + 1
                dmap.setdefault(i, d)
        return dmap, vcount

    @_swap_retry
    def shard_candidates_many(
        self,
        Q,
        shortlist: int,
        nprobe: int = 4,
        query_ids=None,
    ) -> pd.DataFrame:
        """Batch twin of ``shard_candidates``, row-identical to the
        per-query calls concatenated — the same two amortizations as
        search_many (shared cell decode across the batch; one id-sorted
        union read for the rerank vectors), neither able to change a
        per-row value."""
        from vector_search_go_spark.operators.ann_ivf import probe_cells_for
        from vector_search_go_spark.operators.pq import M_SUB

        Q, query_ids = _batch_queries(Q, query_ids)
        if len(Q) == 0:
            return self._cand_frame(0, np.empty(0, dtype=np.int64), [], [], [])
        probes = [
            probe_cells_for(None, None, Q[i], "l2", nprobe, model=self.coarse)
            for i in range(len(Q))
        ]
        if self._mem_codes is not None:
            cell_map = self._mem_codes
        else:
            cell_map = _cell_arrays(
                self._cells, _union_values(probes), "codes",
                lambda t: list_column_int_matrix(t, "codes", M_SUB),
            )
        per_query = []  # (qid, qvec, sids, sadc) scored after one union read
        union_ids: set = set()
        for i, qid in enumerate(query_ids):
            hits = [
                (int(c), *cell_map[int(c)])
                for c in probes[i]
                if int(c) in cell_map
            ]
            if not hits:
                per_query.append((int(qid), Q[i], None, None))
                continue
            ids = np.concatenate([h[1] for h in hits])
            C = np.concatenate([h[2] for h in hits])
            cells = np.concatenate(
                [np.full(len(h[1]), h[0], dtype=np.int64) for h in hits]
            )
            ids, C, cells = drop_tombstoned(self._tomb, ids, C, cells)
            if len(ids) == 0:
                per_query.append((int(qid), Q[i], None, None))
                continue
            adc = self._adc_dists(Q[i], C, cells)
            short = self._adc_topl(ids, adc, shortlist)
            sids, sadc = ids[short], adc[short]
            union_ids.update(sids.tolist())
            per_query.append((int(qid), Q[i], sids, sadc))

        rid_all, V_all = (
            self._rerank_rows(union_ids) if union_ids else (None, None)
        )

        frames = []
        for qid, qv, sids, sadc in per_query:
            if sids is None:
                frames.append(
                    self._cand_frame(qid, np.empty(0, dtype=np.int64), [], [], [])
                )
                continue
            dmap: dict = {}
            vcount: dict = {}
            if rid_all is not None:
                mask = np.isin(rid_all, np.asarray(sorted(sids.tolist())))
                if mask.any():
                    dd = single_query_dists("l2", qv, V_all[mask])
                    for i, d in zip(rid_all[mask].tolist(), dd.tolist()):
                        vcount[i] = vcount.get(i, 0) + 1
                        dmap.setdefault(i, d)
            dist = [dmap.get(i, np.nan) for i in sids.tolist()]
            vmult = [vcount.get(i, 0) for i in sids.tolist()]
            frames.append(self._cand_frame(qid, sids, sadc, dist, vmult))
        return pd.concat(frames, ignore_index=True)

    # -- sharded SQ8-rerank legs (VERDICT r10 item 4) -----------------
    #
    # The exact-rerank shard leg (shard_candidates) fetches `shortlist`
    # float rows PER SHARD per query — at the measured exact-set
    # budgets that is the whole serving latency. The SQ8 protocol is
    # two-phase: phase 1 returns ADC + SQ8 scores only (no float IO);
    # the ROUTER selects the global ADC top-L, then the global
    # sq8-top-K' by (sq8, id); phase 2 (fetch_dists) reads floats for
    # just those K' ids across ALL shards combined. Per-shard sq8
    # truncation would NOT be selection-monotone (a shard-local ADC
    # top-L member outside the GLOBAL top-L can displace a global
    # keeper from the shard's sq8 top-K'), hence the second round trip.

    @staticmethod
    def _sq8_cand_frame(query_id: int, ids, adc, sq8) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "query_id": np.full(len(ids), query_id, dtype=np.int64),
                "id": ids,
                "adc": np.asarray(adc, dtype=np.float64),
                "sq8": np.asarray(sq8, dtype=np.float64),
            }
        )

    def _sq8_map(self, q: np.ndarray, sids: np.ndarray) -> dict:
        """{id: sq8 dist} for the slot ids that have an SQ8 row."""
        from vector_search_go_spark.operators.sq8 import sq8_dists_np

        uid, C8 = self._sq8_rows(sids.tolist())
        if uid is None:
            return {}
        mins, scales = self._sq8_stats
        d8 = sq8_dists_np(q, mins, scales, C8)
        return dict(zip(uid.tolist(), d8.tolist()))

    @_swap_retry
    def shard_candidates_sq8(
        self,
        qvec,
        shortlist: int,
        nprobe: int = 4,
        query_id: int = 0,
    ) -> pd.DataFrame:
        """Phase-1 leg: this store's local ADC top-``shortlist`` slots
        as (query_id, id, adc, sq8) — sq8 is NaN for an id with no SQ8
        row (the router drops those exactly where the unsharded
        _sq8_select drops them). No float vector IO."""
        from vector_search_go_spark.operators.ann_ivf import probe_cells_for

        self._require_sq8()
        q = np.asarray(list(qvec), dtype=np.float64)
        probed = probe_cells_for(None, None, q, "l2", nprobe, model=self.coarse)
        ids, C, cells = self._gather_codes(probed)
        if ids is None:
            return self._sq8_cand_frame(
                query_id, np.empty(0, dtype=np.int64), [], []
            )
        adc = self._adc_dists(q, C, cells)
        short = self._adc_topl(ids, adc, shortlist)
        sids, sadc = ids[short], adc[short]
        smap = self._sq8_map(q, sids)
        sq8d = [smap.get(i, np.nan) for i in sids.tolist()]
        return self._sq8_cand_frame(query_id, sids, sadc, sq8d)

    @_swap_retry
    def shard_candidates_sq8_many(
        self,
        Q,
        shortlist: int,
        nprobe: int = 4,
        query_ids=None,
    ) -> pd.DataFrame:
        """Batch twin of ``shard_candidates_sq8``, row-identical to the
        per-query calls concatenated (shared cell decode; the sq8 code
        fetch is per query over pinned arrays or pruned row groups)."""
        from vector_search_go_spark.operators.ann_ivf import probe_cells_for
        from vector_search_go_spark.operators.pq import M_SUB

        self._require_sq8()
        Q, query_ids = _batch_queries(Q, query_ids)
        if len(Q) == 0:
            return self._sq8_cand_frame(0, np.empty(0, dtype=np.int64), [], [])
        probes = [
            probe_cells_for(None, None, Q[i], "l2", nprobe, model=self.coarse)
            for i in range(len(Q))
        ]
        if self._mem_codes is not None:
            cell_map = self._mem_codes
        else:
            cell_map = _cell_arrays(
                self._cells, _union_values(probes), "codes",
                lambda t: list_column_int_matrix(t, "codes", M_SUB),
            )
        frames = []
        for i, qid in enumerate(query_ids):
            hits = [
                (int(c), *cell_map[int(c)])
                for c in probes[i]
                if int(c) in cell_map
            ]
            if not hits:
                frames.append(
                    self._sq8_cand_frame(
                        int(qid), np.empty(0, dtype=np.int64), [], []
                    )
                )
                continue
            ids = np.concatenate([h[1] for h in hits])
            C = np.concatenate([h[2] for h in hits])
            cells = np.concatenate(
                [np.full(len(h[1]), h[0], dtype=np.int64) for h in hits]
            )
            ids, C, cells = drop_tombstoned(self._tomb, ids, C, cells)
            if len(ids) == 0:
                frames.append(
                    self._sq8_cand_frame(
                        int(qid), np.empty(0, dtype=np.int64), [], []
                    )
                )
                continue
            adc = self._adc_dists(Q[i], C, cells)
            short = self._adc_topl(ids, adc, shortlist)
            sids, sadc = ids[short], adc[short]
            smap = self._sq8_map(Q[i], sids)
            sq8d = [smap.get(j, np.nan) for j in sids.tolist()]
            frames.append(self._sq8_cand_frame(int(qid), sids, sadc, sq8d))
        return pd.concat(frames, ignore_index=True)

    @_swap_retry
    def fetch_dists_many(self, Q, ids_per_query, query_ids=None) -> pd.DataFrame:
        """Phase-2 batch: exact (query_id, id, dist) rows for each
        query's selected ids, one union id-sorted float read."""
        Q, query_ids = _batch_queries(Q, query_ids)
        union: set = set()
        for ids in ids_per_query:
            union.update(int(x) for x in ids)
        rid_all, V_all = (
            self._rerank_rows(union) if union else (None, None)
        )
        frames = []
        for i, qid in enumerate(query_ids):
            ids = np.asarray(sorted(int(x) for x in ids_per_query[i]),
                             dtype=np.int64)
            if rid_all is None or not len(ids):
                frames.append(
                    pd.DataFrame(
                        {"query_id": np.empty(0, dtype=np.int64),
                         "id": np.empty(0, dtype=np.int64),
                         "dist": np.empty(0, dtype=np.float64)}
                    )
                )
                continue
            mask = np.isin(rid_all, ids)
            dd = (
                single_query_dists("l2", Q[i], V_all[mask])
                if mask.any()
                else np.empty(0)
            )
            frames.append(
                pd.DataFrame(
                    {
                        "query_id": np.full(
                            int(mask.sum()), int(qid), dtype=np.int64
                        ),
                        "id": rid_all[mask],
                        "dist": np.asarray(dd, dtype=np.float64),
                    }
                )
            )
        return pd.concat(frames, ignore_index=True)


class LocalScanReader:
    """Point lookups over a saved SCAN store (operators.exact_knn.
    scan_save layout: vectors + store_meta) — the serving tier for
    corpora where the measured advisor says DON'T index (the SCALE.md
    angular probes; reference anchor: NNMock's full-scan Search,
    annbench/annbench.go:56-125): an exact full scan per query,
    two-stage scored over the preloaded matrix.

    Always in-memory: a scan touches every row by definition, so a
    lazy mode would re-decode the whole table on every query. The
    memory contract is the corpus shard itself (n x dims float64 —
    512 MB at 1M x 64); past RAM, split the store across readers (the
    same fleet shape as the bucket readers, minus the router's hash
    step — every reader scores its shard, the router merges top-k,
    which is exactly the selection-monotone per-partition top-k
    argument the Spark exact path relies on).

    Bit-identical to exact_knn_join on the same corpus (the engine's
    backend='exact' batch path): same sequential-IEEE kernels via the
    shared two-stage scorer, same (dist, id) tie-break, same threshold
    semantics (pinned in tests/test_serve_scan.py)."""

    TWO_STAGE_MARGIN = TWO_STAGE_MARGIN

    def __init__(self, path: str, metric: str | None = None):
        import pyarrow.parquet as pq

        self._ctor = dict(path=path, metric=metric)
        meta = _read_store_meta(path)
        family = meta.get("family")
        if family not in (None, "scan"):
            raise ValueError(
                f"store at {path!r} is a {family!r} store, not a scan "
                "store — use the matching reader"
            )
        saved = meta.get("metric")
        if metric is None:
            if saved is None:
                raise ValueError(
                    f"store at {path!r} has no persisted metric "
                    "(legacy / hand-built layout): pass metric= explicitly"
                )
            metric = saved
        elif saved is not None and saved != metric:
            raise ValueError(
                f"store at {path!r} was saved with metric={saved!r}, "
                f"incompatible with metric={metric!r}"
            )
        self.path = path
        self.metric = metric
        tbl = pq.read_table(os.path.join(path, "vectors"), columns=["id", "vec"])
        if tbl.num_rows == 0:
            raise ValueError(f"scan store at {path!r} holds no vectors")
        dims = meta.get("dims") or len(tbl.column("vec")[0])
        self.dims = int(dims)
        mat = list_column_matrix(tbl, "vec", self.dims)
        ids = tbl.column("id").to_numpy(zero_copy_only=False)
        ids, mat = drop_tombstoned(load_tombstone_array(path), ids, mat)
        if len(ids) == 0:
            raise ValueError(
                f"scan store at {path!r} has every row tombstoned"
            )
        if np.issubdtype(ids.dtype, np.number):
            # id-sorted matrix: ties in dist resolve by id, and a
            # sorted id axis keeps _result_frame's lexsort stable
            # against the Spark path's (dist, id) ordering for free
            order = np.argsort(ids, kind="stable")
            self.ids = ids[order]
            self.mat = np.ascontiguousarray(mat[order])
        else:
            self.ids = ids
            self.mat = mat
        self._norms2 = np.einsum("ij,ij->i", self.mat, self.mat)

    def __len__(self) -> int:
        return len(self.ids)

    @_swap_retry
    def search(
        self,
        qvec,
        k: int = 10,
        threshold: float | None = None,
        query_id: int = 0,
    ) -> pd.DataFrame:
        q = np.asarray(list(qvec), dtype=np.float64)
        if len(self.mat) <= 2048:
            dists = single_query_dists(self.metric, q, self.mat)
        else:
            dists = _two_stage_dists(
                self.metric, q, self.mat, self._norms2, k, threshold,
                self.TWO_STAGE_MARGIN,
            )
        ids = self.ids
        if threshold is not None:
            m = dists <= float(threshold)
            ids, dists = ids[m], dists[m]
        return _result_frame(ids, dists, k, query_id)

    @_swap_retry
    def search_many(
        self,
        Q,
        k: int = 10,
        threshold: float | None = None,
        query_ids=None,
    ) -> pd.DataFrame:
        """Batch lookups, row-identical to per-query ``search``
        concatenated. The per-query cost is the scan itself (one BLAS
        matvec over the shard), so batching buys allocator locality,
        not amortized model work."""
        Q, query_ids = _batch_queries(Q, query_ids)
        if len(Q) == 0:
            return _result_frame([], [], k, 0)
        frames = [
            self.search(Q[i], k=k, threshold=threshold, query_id=int(qid))
            for i, qid in enumerate(query_ids)
        ]
        return pd.concat(frames, ignore_index=True)


__all__ = [
    "LocalLshReader",
    "LocalIvfReader",
    "LocalIvfPqReader",
    "LocalScanReader",
]
