"""Hasher micro-fixtures (reference lsh/lsh_test.go:15-44,108-136;
FIXTURES.md A2) — all driver-side numpy, no Spark needed."""

from __future__ import annotations

import numpy as np

from vector_search_go_spark.config import LshConfig
from vector_search_go_spark.lsh.hasher import Forest, Plane, plane_by_points


def test_plane_sign():
    # n=[1.5,-1], d=2: [0,0] -> negative side, [4,0] -> positive
    # (lsh_test.go:15-28)
    p = Plane(n=np.array([1.5, -1.0]), d=2.0)
    assert (np.array([0.0, 0.0]) @ p.n - p.d) < 0
    assert (np.array([4.0, 0.0]) @ p.n - p.d) > 0


def test_plane_by_points():
    # center=(p0+p1)/2, n=p1-center, d=center.n (hasher.go:87-98)
    p = plane_by_points(np.array([-1.0, -1.0]), np.array([2.0, -1.0]))
    assert np.allclose(p.n, [1.5, 0.0])
    assert abs(p.d - 0.75) < 1e-12


def test_two_point_tree_hashes():
    # vecs {[-1,-1],[2,-1]}, KMinVecs=2 -> exactly one split plane;
    # negative side gets bit 0 -> hashes (1, 0) (lsh_test.go:30-44)
    X = np.array([[-1.0, -1.0], [2.0, -1.0]])
    cfg = LshConfig(dims=2, n_trees=1, k_min_vecs=2, seed=7)
    f = Forest.build(X, cfg)
    h = f.hash_batch(X)[:, 0]
    assert list(h) == [1, 0]


def test_probe_flips_msb():
    f = Forest(config=LshConfig(dims=2, n_trees=1), trees=[None])
    h = np.array([[0], [1], [2], [3], [6], [1 << 40]], dtype=np.int64)
    probes = f.probe_batch(h)[:, 0]
    # hash=0 -> flip bit 0 -> 1; hash=1 -> 0; 2 -> 0; 3 -> 1; 6 -> 2
    assert list(probes) == [1, 0, 0, 1, 2, 0]


def test_serialization_roundtrip():
    # plane-coefficient round-trip (lsh_test.go:108-136) + hash equality
    rng = np.random.default_rng(0)
    X = rng.normal(size=(200, 8))
    cfg = LshConfig(dims=8, n_trees=4, k_min_vecs=10, seed=42)
    f = Forest.build(X, cfg)
    f2 = Forest.from_json(f.to_json())
    assert np.array_equal(f.hash_batch(X), f2.hash_batch(X))
    p1, p2 = f.trees[0].plane, f2.trees[0].plane
    assert np.allclose(p1.n, p2.n) and abs(p1.d - p2.d) < 1e-12


def test_serialization_preserves_max_candidates():
    rng = np.random.default_rng(4)
    X = rng.normal(size=(50, 4))
    cfg = LshConfig(dims=4, n_trees=2, k_min_vecs=5, max_candidates=123, seed=1)
    f2 = Forest.from_json(Forest.build(X, cfg).to_json())
    assert f2.config.max_candidates == 123


def test_angular_build_and_hash_deterministic():
    rng = np.random.default_rng(1)
    X = rng.normal(size=(100, 4))
    cfg = LshConfig(dims=4, n_trees=3, k_min_vecs=5, is_angular=True, seed=9)
    f1, f2 = Forest.build(X, cfg), Forest.build(X, cfg)
    assert np.array_equal(f1.hash_batch(X), f2.hash_batch(X))


def test_depth_bound():
    # pathological config: k_min_vecs=1 on clustered data must not
    # exceed the int64-safe depth (config.MAX_DEPTH)
    rng = np.random.default_rng(2)
    X = np.vstack([rng.normal(size=(300, 2)) * 1e-9, rng.normal(size=(300, 2))])
    cfg = LshConfig(dims=2, n_trees=1, k_min_vecs=1, seed=3)
    f = Forest.build(X, cfg)
    h = f.hash_batch(X)
    assert (h >= 0).all()
