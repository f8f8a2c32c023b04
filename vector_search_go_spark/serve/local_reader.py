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
from vector_search_go_spark.serve.pqindex import (
    HivePartIndex,
    RowGroupIndex,
    TreeBucketIndex,
    list_column_int_matrix,
    list_column_matrix,
)
from vector_search_go_spark.serve.xxh64 import survivor_pmod_vec


def _result_frame(ids, dists, k: int, query_id: int) -> pd.DataFrame:
    """threshold-filtered candidates -> top-k by (dist, id) with rn,
    the exact (query_id, id, dist, rn) contract of the Spark paths
    (operators.topk.topk_per_group tie-break)."""
    order = sorted(range(len(ids)), key=lambda i: (dists[i], ids[i]))[:k]
    return pd.DataFrame(
        {
            "query_id": np.full(len(order), query_id, dtype=np.int64),
            "id": [ids[i] for i in order],
            "dist": np.asarray([dists[i] for i in order], dtype=np.float64),
            "rn": np.arange(1, len(order) + 1, dtype=np.int64),
        }
    )


class LocalLshReader:
    """Point lookups over a saved LSH index dir (LshIndex.save layout:
    model_config + model_nodes + buckets/tree=N/ + vectors)."""

    def __init__(self, path: str, metric: str, preload_vectors: bool = True):
        import pyarrow.parquet as pq

        self.path = path
        self.metric = metric
        self.forest = self._load_forest(path)
        self.config = self.forest.config
        self._buckets = TreeBucketIndex(os.path.join(path, "buckets"))
        self._vec_path = os.path.join(path, "vectors")
        self._vec_index = None
        self._vec_rgindex = None
        if preload_vectors:
            # the reference's serving regime: the whole store lives
            # in process memory (store/kv/store.go); dict + matrix,
            # decoded zero-copy from the Arrow buffers
            tbl = pq.read_table(self._vec_path, columns=["id", "vec"])
            ids = tbl.column("id").to_pylist()
            mat = list_column_matrix(tbl, "vec", self.config.dims)
            self._vec_index = ({v: i for i, v in enumerate(ids)}, mat)
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
        cap = self.config.max_bucket_size
        out: dict = {}
        for t in sorted(hit):
            hvals, ids = hit[t]
            if cap is None:
                for i in ids.tolist():
                    out[i] = True
                continue
            for h in np.unique(hvals):
                sel = ids[hvals == h]
                sz = len(sel)
                if sz <= cap:
                    for i in sel.tolist():
                        out[i] = True
                    continue
                keep_mod = int(math.ceil(sz / cap))
                pm = survivor_pmod_vec(t, int(h), sel, keep_mod)
                for i in sel[pm == 0].tolist():
                    out[i] = True
        return list(out)

    def _fetch_vectors(self, cand: list):
        if self._vec_index is not None:
            index, mat = self._vec_index
            found = [c for c in cand if c in index]
            return found, mat[[index[c] for c in found]]
        tbl = self._vec_rgindex.read(sorted(cand), ["id", "vec"])
        if tbl is None or tbl.num_rows == 0:
            return [], np.empty((0, self.config.dims))
        ids = tbl.column("id").to_numpy(zero_copy_only=False)
        mask = np.isin(ids, np.asarray(sorted(cand)))
        V = list_column_matrix(tbl, "vec", self.config.dims)
        return ids[mask].tolist(), V[mask]

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
        if not cand:
            return _result_frame([], [], k, query_id)
        ids, V = self._fetch_vectors(cand)
        dists = single_query_dists(self.metric, q, V)
        if threshold is not None:
            m = dists <= float(threshold)
            ids = [i for i, keep in zip(ids, m) if keep]
            dists = dists[m]
        return _result_frame(ids, list(dists), k, query_id)


class LocalIvfReader:
    """Point lookups over a saved IVF store (ivf_save layout:
    centroids + cells/cell=N/ holding full vectors)."""

    def __init__(self, path: str, metric: str = "cosine"):
        import pyarrow.parquet as pq

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
        tbls = [
            t for t in
            self._cells.read_values_parallel(probed, ["id", "vec"]).values()
            if t is not None and t.num_rows
        ]
        if not tbls:
            return _result_frame([], [], k, query_id)
        tbl = pa.concat_tables(tbls)
        ids = tbl.column("id").to_pylist()
        V = list_column_matrix(tbl, "vec", self.dims)
        dists = single_query_dists(self.metric, q, V)
        if threshold is not None:
            m = dists <= float(threshold)
            ids = [i for i, keep in zip(ids, m) if keep]
            dists = dists[m]
        return _result_frame(ids, list(dists), k, query_id)


class LocalIvfPqReader:
    """Point lookups over a saved IVFADC store (ivfpq_save layout:
    centroids + codebook + cells/cell=N/ codes + id-sorted vectors).
    L2-only, like the store itself."""

    def __init__(self, path: str):
        import pyarrow.parquet as pq

        self.path = path
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
        self._cells = HivePartIndex(os.path.join(path, "cells"), "cell")
        self._vectors = RowGroupIndex(
            glob.glob(os.path.join(path, "vectors", "*.parquet")), "id"
        )

    def search(
        self,
        qvec,
        k: int = 10,
        nprobe: int = 4,
        shortlist: int | None = None,
        query_id: int = 0,
    ) -> pd.DataFrame:
        import pyarrow as pa

        from vector_search_go_spark.operators.ann_ivf import probe_cells_for
        from vector_search_go_spark.operators.pq import D_SUB, M_SUB, pq_shortlist

        if shortlist is None:
            shortlist = pq_shortlist(k)
        q = np.asarray(list(qvec), dtype=np.float64)
        probed = probe_cells_for(None, None, q, "l2", nprobe, model=self.coarse)

        # ADC lookup table — same construction as ivfpq_point_search
        n_codes = max(int(self.cb_ids[s].max()) for s in self.cb_ids) + 1
        lut = np.zeros((M_SUB, n_codes))
        for sub in range(M_SUB):
            sl = q[sub * D_SUB : (sub + 1) * D_SUB][None, :]
            lut[sub, self.cb_ids[sub]] = _seq_sq_l2(sl, self.cb_mats[sub])[0]

        tbls = [
            t for t in
            self._cells.read_values_parallel(probed, ["id", "codes"]).values()
            if t is not None and t.num_rows
        ]
        if not tbls:
            return _result_frame([], [], k, query_id)
        tbl = pa.concat_tables(tbls)
        ids = tbl.column("id").to_pylist()
        C = list_column_int_matrix(tbl, "codes", M_SUB)
        acc = np.zeros(len(C))
        for sub in range(M_SUB):
            acc = acc + lut[sub][C[:, sub]]
        adc = np.sqrt(acc)
        short = sorted(range(len(ids)), key=lambda i: (adc[i], ids[i]))[:shortlist]
        short_ids = sorted(ids[i] for i in short)

        vtbl = self._vectors.read(short_ids, ["id", "vec"])
        if vtbl is None or vtbl.num_rows == 0:
            return _result_frame([], [], k, query_id)
        rid_arr = vtbl.column("id").to_numpy(zero_copy_only=False)
        mask = np.isin(rid_arr, np.asarray(short_ids))
        rids = rid_arr[mask].tolist()
        V = list_column_matrix(vtbl, "vec", self.dims)[mask]
        dists = single_query_dists("l2", q, V)
        return _result_frame(rids, list(dists), k, query_id)


__all__ = ["LocalLshReader", "LocalIvfReader", "LocalIvfPqReader"]
