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


@given(
    st.lists(
        st.lists(
            st.text("abcdefz-0123456789", min_size=1, max_size=8),
            min_size=0,
            max_size=4,
        ),
        min_size=1,
        max_size=6,
    )
)
def test_derive_bases_arrival_properties(batches):
    """Driver-free property over ARBITRARY arrival schedules: the
    streaming id-base derivation (sources.vecs._derive_bases) assigns
    each file a unique contiguous index, never reassigns an existing
    base, and replaying any batch from its checkpointed offset — whose
    embedded base map lags the file list by ONE batch, exactly as the
    runtime logs it — reproduces the same assignment (the single-
    restart guarantee the docstring claims, for every prefix)."""
    from vector_search_go_spark.sources.vecs import _derive_bases

    # incremental ground truth, as the in-memory reader runs it
    seen: dict = {}
    bases: dict = {}
    trail = []  # (logged offset of batch i, bases after batch i)
    for batch in batches:
        prev_files = dict(seen)
        prev_bases = dict(bases)
        for f in batch:
            seen[f] = seen.get(f, 0) + 1
        bases = _derive_bases(
            {"files": prev_files, "bases": prev_bases}, dict(seen)
        )
        # uniqueness + contiguity + append-only
        assert len(set(bases.values())) == len(bases)
        assert sorted(bases.values()) == list(range(len(bases)))
        for f, b in prev_bases.items():
            assert bases[f] == b
        # the runtime logs batch i's END offset with the PRE-batch base
        # map (latestOffset embeds the in-memory view, one batch behind)
        trail.append(({"files": dict(seen), "bases": prev_bases}, dict(bases)))

    # single-restart replay (the documented guarantee): restarting at
    # any batch boundary re-derives THAT batch's assignment from its
    # lagging logged offset — the batch's new files form one sorted
    # block, so the replay lands the same indices
    for logged, expect in trail:
        replay = _derive_bases(logged, dict(logged["files"]))
        assert replay == expect, (logged, replay, expect)


@settings(max_examples=6, deadline=None)
@given(
    st.lists(st.integers(2, 40), min_size=1, max_size=4),  # cluster sizes
    st.integers(0, 10),  # singleton count
    st.integers(0, 2**31 - 1),
)
def test_hot_chain_cluster_connectivity_property(spark, sizes, n_single, seed):
    """For ANY composition of exact-duplicate clusters + singletons in
    one oversized bucket — arbitrary sizes, arbitrary id interleaving —
    the sorted-neighborhood chain emits at most width*|bucket| pairs
    and keeps every duplicate cluster in ONE connected component after
    the cos<=0.6 verification, and is deterministic across
    evaluations."""
    from vector_search_go_spark.queries_lsh import hot_bucket_chain_pairs

    rng = np.random.default_rng(seed)
    dims = 8
    vecs = []
    cluster_of = {}
    for ci, sz in enumerate(sizes):
        v = rng.standard_normal(dims)
        for _ in range(sz):
            vecs.append((v, ci))
    for _ in range(n_single):
        vecs.append((rng.standard_normal(dims), -1))
    ids = rng.permutation(len(vecs) * 3)[: len(vecs)]  # sparse shuffled ids
    rows = []
    for (v, ci), i in zip(vecs, ids):
        rows.append((0, 0, int(i), [float(x) for x in v]))
        cluster_of[int(i)] = ci
    members = spark.createDataFrame(
        rows, "tree int, hash bigint, id bigint, vec array<double>"
    )
    got = hot_bucket_chain_pairs(members, dims=dims, seed=7).collect()
    assert len(got) <= 2 * len(rows)
    again = hot_bucket_chain_pairs(members, dims=dims, seed=7).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, again))

    by_id = {r[2]: np.asarray(r[3]) for r in rows}

    def cos_dist(a, b):
        na, nb = np.linalg.norm(a), np.linalg.norm(b)
        return 1.0 - float(a @ b / (na * nb))

    parent = {r[2]: r[2] for r in rows}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in got:
        if cos_dist(by_id[r["id_a"]], by_id[r["id_b"]]) <= 0.6:
            parent[find(r["id_a"])] = find(r["id_b"])
    for ci in range(len(sizes)):
        roots = {find(i) for i, c in cluster_of.items() if c == ci}
        assert len(roots) == 1, f"cluster {ci} split into {len(roots)} components"
