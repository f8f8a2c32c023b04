"""Annoy-style random binary tree hasher (driver-side model).

Behavioral parity with the reference hasher (lsh/hasher.go):
  - plane through the midpoint of two random points, normal pointing at
    the larger-norm point: center = (p0+p1)/2, n = p1 - center,
    d = center . n                          (planeByPoints, hasher.go:87-98)
  - the two sampled points are ordered by ascending norm and, for the
    angular metric, L2-normalized first     (getRandomPlane, hasher.go:100-134)
  - sign test: dot(v, n) - d < 0 => bit set at this depth, descend left;
    else descend right                      (getProductSign hasher.go:25-29,
                                             traverse hasher.go:38-57)
  - growth stops when depth exceeds the hash width or fewer than 2
    vectors remain; a child is grown only when its side holds more than
    KMinVecs vectors                        (growTree, hasher.go:137-161)
  - the query vector is L2-normalized before hashing iff angular
                                            (getHashes, hasher.go:191-219)

Deliberate deviations (SURVEY.md section 7 "hard parts"):
  - deterministic seeding (the reference seeds from the wall clock,
    hasher.go:165) — per-tree rng = default_rng(seed + tree_index);
  - max depth 62, not 63, so hashes stay in non-negative int64
    (Spark LongType has no uint64);
  - point sampling uses choice-without-replacement instead of the
    reference's retry loop (<= 3N tries, hasher.go:106-117) — same
    distributional intent, deterministic;
  - tree build runs on a bounded sample, not the full dataset — at
    100 TB a full driver-side collect is impossible; quality is
    sample-tolerant because only split planes come from the data.

The model is a small driver-side object, broadcast to executors for
hashing; per-batch hashing is fully vectorized numpy (one matvec per
tree level over the rows that reach that node).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

import numpy as np

from vector_search_go_spark.config import MAX_DEPTH, TOL, LshConfig


@dataclass
class Plane:
    n: np.ndarray  # normal vector, float64
    d: float  # offset: dot(center, n)


@dataclass
class TreeNode:
    plane: Plane | None = None
    left: TreeNode | None = None
    right: TreeNode | None = None


@dataclass
class Forest:
    """NTrees independent random binary trees + the config they were
    built with (reference Hasher, hasher.go:59-78)."""

    config: LshConfig
    trees: list[TreeNode] = field(default_factory=list)

    # ------------------------------------------------------------------
    # Build (reference build/buildTree/growTree, hasher.go:137-188)
    # ------------------------------------------------------------------

    @classmethod
    def build(cls, vecs: np.ndarray, config: LshConfig) -> Forest:
        X = np.asarray(vecs, dtype=np.float64)
        if X.ndim != 2 or X.shape[1] != config.dims:
            raise ValueError(f"expected (n, {config.dims}) matrix, got {X.shape}")
        trees = []
        for t in range(config.n_trees):
            rng = np.random.default_rng(config.seed + t)
            trees.append(_grow_tree(X, np.arange(len(X)), 0, config, rng))
        return cls(config=config, trees=trees)

    # ------------------------------------------------------------------
    # Hashing (reference getHash/getHashes, hasher.go:38-57,191-219)
    # ------------------------------------------------------------------

    def hash_batch(self, X: np.ndarray) -> np.ndarray:
        """Hash a (n, dims) batch through every tree -> (n, n_trees) int64.

        Level-synchronous traversal over a flattened node table: each
        level is ONE row-wise einsum over every still-active row instead
        of one numpy call per tree node — O(depth) large vector ops per
        tree, which is what keeps the pandas-UDF hash cheap when batches
        are 10k+ rows (measured 3-4x faster bucketize at 100k vectors).
        """
        X = np.asarray(X, dtype=np.float64)
        if self.config.is_angular:
            norms = np.linalg.norm(X, axis=1, keepdims=True)
            X = np.where(norms > TOL, X / np.where(norms == 0, 1.0, norms), X)
        out = np.zeros((len(X), len(self.trees)), dtype=np.int64)
        for t, tree in enumerate(self.trees):
            flat = self._flat_tree(t)
            if flat is None:
                continue
            out[:, t] = _hash_tree_flat(flat, X)
        return out

    def _flat_tree(self, t: int):
        """BFS-flattened (N, D, left, right) arrays for tree t, cached."""
        cache = getattr(self, "_flat_cache", None)
        if cache is None:
            cache = {}
            object.__setattr__(self, "_flat_cache", cache)
        if t in cache:
            return cache[t]
        root = self.trees[t]
        if root is None or root.plane is None:
            cache[t] = None
            return None
        nodes: list[TreeNode] = [root]
        left: list[int] = []
        right: list[int] = []
        i = 0
        while i < len(nodes):
            node = nodes[i]
            for child, dest in ((node.left, left), (node.right, right)):
                if child is not None and child.plane is not None:
                    dest.append(len(nodes))
                    nodes.append(child)
                else:
                    dest.append(-1)
            i += 1
        flat = (
            np.stack([n.plane.n for n in nodes]),
            np.array([n.plane.d for n in nodes]),
            np.array(left, dtype=np.int64),
            np.array(right, dtype=np.int64),
        )
        cache[t] = flat
        return flat

    def probe_batch(self, hashes: np.ndarray) -> np.ndarray:
        """Multiprobe neighbor hash per (row, tree): flip the most
        significant set bit (reference Search, lsh/lsh.go:146-151 —
        neighborPos = floor(log2(hash)), 0 when hash == 0)."""
        h = np.asarray(hashes, dtype=np.int64)
        # Exact integer msb (floor(log2(h)) for h > 0, else 0) — float
        # log2 would be off-by-one at hashes >= 2^53.
        msb = np.zeros_like(h)
        v = h.copy()
        for shift in (32, 16, 8, 4, 2, 1):
            ge = v >= (np.int64(1) << shift)
            msb[ge] += shift
            v[ge] >>= shift
        return h ^ (np.int64(1) << msb)

    # ------------------------------------------------------------------
    # Serialization (reference dump/load, hasher.go:222-251 — gob is
    # Go-only; our wire format is JSON, SURVEY.md section 2 O26)
    # ------------------------------------------------------------------

    def to_json(self) -> str:
        def enc(node: TreeNode | None):
            if node is None:
                return None
            return {
                "p": None
                if node.plane is None
                else [list(map(float, node.plane.n)), float(node.plane.d)],
                "l": enc(node.left),
                "r": enc(node.right),
            }

        return json.dumps(
            {
                "config": {
                    "dims": self.config.dims,
                    "n_trees": self.config.n_trees,
                    "k_min_vecs": self.config.k_min_vecs,
                    "is_angular": self.config.is_angular,
                    "max_candidates": self.config.max_candidates,
                    "seed": self.config.seed,
                    "sample_size": self.config.sample_size,
                    "max_bucket_size": self.config.max_bucket_size,
                },
                "trees": [enc(t) for t in self.trees],
            }
        )

    def to_node_rows(self) -> list[tuple]:
        """Flattened ``(tree, idx, n, d, left, right)`` node rows — the
        parquet model format. The JSON wire format stays for small
        models/tests, but a trained forest is one json.dumps LINE and
        Spark's JSON reader rejects single records past ~tens of MB
        (observed: 100 MB model at 1M x 64-d, sample 100k) — a node
        table has no per-record ceiling and round-trips float64
        losslessly through parquet."""
        rows: list[tuple] = []
        for t in range(len(self.trees)):
            flat = self._flat_tree(t)
            if flat is None:
                continue
            N, D, left, right = flat
            for i in range(len(D)):
                rows.append(
                    (
                        t,
                        i,
                        [float(x) for x in N[i]],
                        float(D[i]),
                        int(left[i]),
                        int(right[i]),
                    )
                )
        return rows

    @classmethod
    def from_node_rows(cls, config: LshConfig, rows) -> Forest:
        """Rebuild the tree graph from flattened node rows (inverse of
        to_node_rows; indices are the BFS order _flat_tree emits)."""
        by_tree: dict[int, list] = {}
        for r in rows:
            by_tree.setdefault(r["tree"], []).append(r)
        trees: list[TreeNode | None] = [None] * config.n_trees
        for t, rs in by_tree.items():
            rs = sorted(rs, key=lambda r: r["idx"])
            nodes = [
                TreeNode(
                    plane=Plane(n=np.asarray(r["n"], dtype=np.float64), d=float(r["d"]))
                )
                for r in rs
            ]
            for node, r in zip(nodes, rs):
                node.left = nodes[r["left"]] if r["left"] >= 0 else None
                node.right = nodes[r["right"]] if r["right"] >= 0 else None
            trees[t] = nodes[0]
        return cls(config=config, trees=trees)

    def config_dict(self) -> dict:
        return {
            "dims": self.config.dims,
            "n_trees": self.config.n_trees,
            "k_min_vecs": self.config.k_min_vecs,
            "is_angular": self.config.is_angular,
            "max_candidates": self.config.max_candidates,
            "seed": self.config.seed,
            "sample_size": self.config.sample_size,
            "max_bucket_size": self.config.max_bucket_size,
        }

    @classmethod
    def from_json(cls, payload: str) -> Forest:
        obj = json.loads(payload)

        def dec(node) -> TreeNode | None:
            if node is None:
                return None
            plane = None
            if node["p"] is not None:
                plane = Plane(n=np.asarray(node["p"][0], dtype=np.float64), d=node["p"][1])
            return TreeNode(plane=plane, left=dec(node["l"]), right=dec(node["r"]))

        cfg = LshConfig(**obj["config"])
        return cls(config=cfg, trees=[dec(t) for t in obj["trees"]])


# --------------------------------------------------------------------------
# Internals
# --------------------------------------------------------------------------


def plane_by_points(p0: np.ndarray, p1: np.ndarray) -> Plane:
    """Mid-plane between two points (reference planeByPoints,
    hasher.go:87-98): center = (p0+p1)/2, n = p1 - center, d = center.n."""
    center = 0.5 * (p0 + p1)
    n = p1 - center
    return Plane(n=n, d=float(center @ n))


def random_plane(X: np.ndarray, idx: np.ndarray, is_angular: bool, rng) -> Plane:
    """Random mid-plane from two distinct sampled points, ordered by
    ascending norm; angular => points L2-normalized first (reference
    getRandomPlane, hasher.go:100-134)."""
    pick = rng.choice(len(idx), size=2, replace=False)
    p0, p1 = X[idx[pick[0]]].copy(), X[idx[pick[1]]].copy()
    n0, n1 = np.linalg.norm(p0), np.linalg.norm(p1)
    if n0 > n1:
        p0, p1 = p1, p0
        n0, n1 = n1, n0
    if is_angular:
        p0 = p0 / n0 if n0 > TOL else np.zeros_like(p0)
        p1 = p1 / n1 if n1 > TOL else np.zeros_like(p1)
    return plane_by_points(p0, p1)


def _grow_tree(
    X: np.ndarray, idx: np.ndarray, depth: int, config: LshConfig, rng
) -> TreeNode | None:
    # Reference growTree guard (hasher.go:138): stop past the hash width
    # or with fewer than 2 points (plane needs 2 distinct samples).
    if depth > MAX_DEPTH or len(idx) < 2:
        return None
    plane = random_plane(X, idx, config.is_angular, rng)
    node = TreeNode(plane=plane)
    neg = (X[idx] @ plane.n - plane.d) < 0
    left_idx, right_idx = idx[neg], idx[~neg]
    # Children grown only past the KMinVecs threshold (hasher.go:153-160).
    if len(right_idx) > config.k_min_vecs:
        node.right = _grow_tree(X, right_idx, depth + 1, config, rng)
    if len(left_idx) > config.k_min_vecs:
        node.left = _grow_tree(X, left_idx, depth + 1, config, rng)
    return node


def _hash_tree_flat(flat, X: np.ndarray) -> np.ndarray:
    """Level-synchronous traversal (one einsum per level over all
    still-active rows). Negative side sets the depth bit and goes left
    (reference traverse, hasher.go:38-57)."""
    Nmat, D, left, right = flat
    n = len(X)
    if n == 1:
        # serving fast path: one query pays ~0.25 ms of batch masking
        # machinery per tree otherwise. Same einsum expression on the
        # same 1-row operands at each node, so the computed sign —
        # hence the hash — is identical to the batch path's.
        h = np.int64(0)
        cur = 0
        depth = 0
        while cur >= 0 and depth <= MAX_DEPTH:
            neg = (
                np.einsum("ij,ij->i", X, Nmat[cur : cur + 1])[0] - D[cur]
            ) < 0
            if neg:
                h |= np.int64(1) << depth
                cur = left[cur]
            else:
                cur = right[cur]
            depth += 1
        return np.array([h], dtype=np.int64)
    hashes = np.zeros(n, dtype=np.int64)
    cur = np.zeros(n, dtype=np.int64)
    alive = np.ones(n, dtype=bool)
    depth = 0
    while alive.any() and depth <= MAX_DEPTH:
        idx = np.nonzero(alive)[0]
        nd = cur[idx]
        neg = np.einsum("ij,ij->i", X[idx], Nmat[nd]) - D[nd] < 0
        hashes[idx[neg]] |= np.int64(1) << depth
        nxt = np.where(neg, left[nd], right[nd])
        cur[idx] = nxt
        alive[idx] = nxt >= 0
        depth += 1
    return hashes
