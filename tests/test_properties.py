"""Property-based tests (hypothesis) for the driver-side hasher math —
the randomized-component layer of the reference's test strategy
(SURVEY.md section 5)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st
from hypothesis.extra.numpy import arrays

from vector_search_go_spark.config import LshConfig
from vector_search_go_spark.lsh.hasher import Forest, plane_by_points

finite = st.floats(-1e6, 1e6, allow_nan=False, allow_infinity=False, width=64)


@given(
    arrays(np.float64, (8,), elements=finite),
    arrays(np.float64, (8,), elements=finite),
)
def test_plane_separates_its_points(p0, p1):
    """The mid-plane puts its two generating points on opposite
    (non-positive / non-negative) sides: sign(p.n - d) differs unless
    the points coincide."""
    pl = plane_by_points(p0, p1)
    s0 = p0 @ pl.n - pl.d
    s1 = p1 @ pl.n - pl.d
    if not np.allclose(p0, p1):
        assert s0 <= 0 <= s1


@given(st.integers(0, (1 << 62) - 1))
def test_probe_flips_exactly_one_bit(h):
    f = Forest(config=LshConfig(dims=2), trees=[None])
    probe = int(f.probe_batch(np.array([[h]], dtype=np.int64))[0, 0])
    assert bin(h ^ probe).count("1") == 1
    if h > 0:
        # the flipped bit is the most significant set bit
        assert h ^ probe == 1 << (h.bit_length() - 1)
    else:
        assert probe == 1


@settings(max_examples=20, deadline=None)
@given(
    st.integers(0, 2**31 - 1),
    st.integers(10, 60),
    st.integers(2, 6),
)
def test_forest_hashes_deterministic_and_bounded(seed, n, dims):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, dims))
    cfg = LshConfig(dims=dims, n_trees=3, k_min_vecs=3, seed=seed % 1000)
    f1, f2 = Forest.build(X, cfg), Forest.build(X, cfg)
    h1, h2 = f1.hash_batch(X), f2.hash_batch(X)
    assert np.array_equal(h1, h2)
    assert (h1 >= 0).all()
    # serialization is faithful
    f3 = Forest.from_json(f1.to_json())
    assert np.array_equal(h1, f3.hash_batch(X))


@settings(max_examples=20, deadline=None)
@given(st.integers(0, 2**31 - 1))
def test_equal_vectors_always_collide(seed):
    """Identical vectors land in identical buckets in every tree — the
    core LSH invariant."""
    rng = np.random.default_rng(seed)
    base = rng.normal(size=(30, 4))
    X = np.vstack([base, base[:5]])  # duplicate the first 5 rows
    cfg = LshConfig(dims=4, n_trees=5, k_min_vecs=3, seed=1)
    f = Forest.build(X, cfg)
    h = f.hash_batch(X)
    assert np.array_equal(h[:5], h[30:])


@settings(max_examples=30, deadline=None)
@given(
    st.integers(1, 300),
    st.integers(1, 40),
    st.integers(1, 64),
    st.integers(0, 2**31 - 1),
)
def test_vecs_partition_roundtrip(n, dim, rpp, seed):
    """Driver-free property: any (n, dim) float32 matrix written as
    fvecs survives partition planning + the chunked Arrow parse
    bitwise, for any records_per_partition."""
    import os
    import tempfile

    from vector_search_go_spark.sources.vecs import (
        VecsReader,
        _read_partition,
        write_fvecs,
    )

    rng = np.random.default_rng(seed)
    mat = rng.standard_normal((n, dim)).astype("float32")
    with tempfile.TemporaryDirectory(prefix="vecs_prop_") as d:
        p = os.path.join(d, "m.fvecs")
        write_fvecs(p, mat)
        reader = VecsReader({"path": p, "records_per_partition": str(rpp)})
        parts = reader.partitions()
        assert len(parts) == -(-n // rpp)
        got = {}
        for part in parts:
            for batch in _read_partition(part):
                tbl = batch.to_pydict()
                for i, vec in zip(tbl["id"], tbl["vec"]):
                    got[i] = np.asarray(vec, dtype="float32")
    assert sorted(got) == list(range(n))
    assert all(np.array_equal(got[i], mat[i]) for i in range(n))
