"""Custom `vecs` data source (fvecs/bvecs/ivecs — TEXMEX/SIFT layout):
splittable byte-range reads, Arrow-batched scan, id-filter partition
pruning, distributed writer round-trip."""

from __future__ import annotations

import os
import struct

import numpy as np
import pytest

from vector_search_go_spark.sources import register_vecs_source, write_fvecs


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    register_vecs_source(spark)


def _write_ivecs(path, mat):
    mat = np.asarray(mat, dtype="<i4")
    with open(path, "wb") as f:
        for row in mat:
            f.write(struct.pack("<i", len(row)))
            f.write(row.tobytes())


def _write_bvecs(path, mat):
    mat = np.asarray(mat, dtype=np.uint8)
    with open(path, "wb") as f:
        for row in mat:
            f.write(struct.pack("<i", len(row)))
            f.write(row.tobytes())


def test_fvecs_roundtrip_values(spark, tmp_path):
    rng = np.random.default_rng(7)
    mat = rng.standard_normal((100, 8)).astype("float32")
    p = str(tmp_path / "x.fvecs")
    write_fvecs(p, mat)
    df = spark.read.format("vecs").load(p)
    assert df.schema.simpleString() == "struct<id:bigint,vec:array<float>>"
    rows = {r["id"]: r["vec"] for r in df.collect()}
    assert len(rows) == 100
    for i in (0, 57, 99):
        assert np.array_equal(np.array(rows[i], dtype="float32"), mat[i])


def test_partitioned_read_and_multifile_ids(spark, tmp_path):
    rng = np.random.default_rng(8)
    a = rng.standard_normal((30, 4)).astype("float32")
    b = rng.standard_normal((20, 4)).astype("float32")
    write_fvecs(str(tmp_path / "a.fvecs"), a)
    write_fvecs(str(tmp_path / "b.fvecs"), b)
    df = (
        spark.read.format("vecs")
        .option("records_per_partition", 8)
        .load(str(tmp_path))
    )
    # ceil(30/8) + ceil(20/8) = 4 + 3 byte-range splits
    assert df.rdd.getNumPartitions() == 7
    rows = {r["id"]: r["vec"] for r in df.collect()}
    assert len(rows) == 50
    # ids are file-path-sorted then sequential: a.fvecs -> 0..29, b -> 30..49
    assert np.array_equal(np.array(rows[29], dtype="float32"), a[29])
    assert np.array_equal(np.array(rows[30], dtype="float32"), b[0])


def test_id_filter_prunes_partitions(spark, tmp_path):
    mat = np.arange(640, dtype="float32").reshape(80, 8)
    p = str(tmp_path / "x.fvecs")
    write_fvecs(p, mat)
    df = (
        spark.read.format("vecs")
        .option("records_per_partition", 10)
        .load(p)
    )
    got = df.filter("id >= 65 AND id < 72")
    # bounds keep only the 2 covering byte ranges (60..69, 70..79)
    assert got.rdd.getNumPartitions() == 2
    assert sorted(r["id"] for r in got.collect()) == list(range(65, 72))
    one = df.filter("id = 3")
    assert one.rdd.getNumPartitions() == 1
    assert [r["vec"][0] for r in one.collect()] == [24.0]


def test_bvecs_and_ivecs(spark, tmp_path):
    bm = (np.arange(60) % 256).reshape(10, 6).astype(np.uint8)
    im = (np.arange(40) * 3).reshape(10, 4).astype("<i4")
    _write_bvecs(str(tmp_path / "x.bvecs"), bm)
    _write_ivecs(str(tmp_path / "y.ivecs"), im)
    bdf = spark.read.format("vecs").load(str(tmp_path / "x.bvecs"))
    idf = spark.read.format("vecs").load(str(tmp_path / "y.ivecs"))
    assert bdf.schema.simpleString() == "struct<id:bigint,vec:array<int>>"
    brows = {r["id"]: r["vec"] for r in bdf.collect()}
    assert brows[9] == [int(v) for v in bm[9]]
    irows = {r["id"]: r["vec"] for r in idf.collect()}
    assert irows[0] == [0, 3, 6, 9]


def test_write_then_read_distributed(spark, tmp_path):
    from pyspark.sql import functions as F

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    src = emb.select(F.col("embedding").alias("vec")).repartition(4)
    out = str(tmp_path / "out")
    src.write.format("vecs").option("kind", "fvecs").mode("append").save(out)
    parts = [f for f in os.listdir(out) if f.endswith(".fvecs")]
    assert 1 <= len(parts) <= 4
    back = spark.read.format("vecs").load(out)
    assert back.count() == emb.count()
    # multiset of vectors survives (ids are positional, order differs)
    orig = sorted(tuple(r["embedding"]) for r in emb.collect())
    got = sorted(tuple(r["vec"]) for r in back.collect())
    assert got == orig


def test_corrupt_file_rejected(spark, tmp_path):
    p = str(tmp_path / "bad.fvecs")
    with open(p, "wb") as f:
        f.write(struct.pack("<i", 4))
        f.write(b"\x00" * 13)  # not a multiple of record size
    with pytest.raises(Exception, match="not a multiple"):
        spark.read.format("vecs").load(p).collect()


def test_stream_shard_arrival_incremental(spark, tmp_path):
    """Microbatch 1 reads the first shard; microbatch 2 (same
    checkpoint) reads ONLY the delta: a new shard plus records appended
    to the first one."""
    import struct as _struct

    import numpy as np

    src = tmp_path / "landing"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    rng = np.random.default_rng(11)
    a1 = rng.standard_normal((10, 4)).astype("float32")
    write_fvecs(str(src / "shard-a.fvecs"), a1)

    def run_batch(name):
        rows = {}

        def sink(df, _epoch):
            rows.update({r["id"]: r["vec"] for r in df.collect()})

        q = (
            spark.readStream.format("vecs")
            .option("kind", "fvecs")
            .option("records_per_partition", 4)
            .load(str(src))
            .writeStream.foreachBatch(sink)
            .queryName(name)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(60)
        return rows

    got1 = run_batch("vecs_stream_b1")
    assert len(got1) == 10

    # new shard + 3 records appended to the existing one
    b = rng.standard_normal((6, 4)).astype("float32")
    write_fvecs(str(src / "shard-b.fvecs"), b)
    a2 = rng.standard_normal((3, 4)).astype("float32")
    with open(src / "shard-a.fvecs", "ab") as f:
        for row in a2:
            f.write(_struct.pack("<i", 4) + row.tobytes())

    got2 = run_batch("vecs_stream_b2")
    assert len(got2) == 9  # only the delta
    vecs2 = sorted(tuple(v) for v in got2.values())
    expect = sorted(tuple(map(float, r)) for r in np.vstack([b, a2]))
    assert vecs2 == expect
    # ids: stable per-shard bases, no collisions with batch 1
    assert not (set(got1) & set(got2))


def test_isin_filter_pushdown(spark, tmp_path):
    """IN-list filters must prune and return rows (pyspark's In filter
    stores its list in `value`, not `values` — crash regression)."""
    from pyspark.sql import functions as F

    mat = np.arange(160, dtype="float32").reshape(40, 4)
    p = str(tmp_path / "x.fvecs")
    write_fvecs(p, mat)
    df = (
        spark.read.format("vecs")
        .option("records_per_partition", 10)
        .load(p)
    )
    got = df.filter(F.col("id").isin(5, 17))
    assert got.rdd.getNumPartitions() == 2  # ranges 0..9 and 10..19
    assert sorted(r["id"] for r in got.collect()) == [5, 17]


def test_mixed_kind_directory_isolated(spark, tmp_path):
    """A TEXMEX-style directory mixes base .fvecs with groundtruth
    .ivecs; each read must only parse its own kind (bit reinterpretation
    regression)."""
    fm = np.full((5, 4), 1.5, dtype="float32")
    im = np.arange(20, dtype="<i4").reshape(5, 4)
    write_fvecs(str(tmp_path / "base.fvecs"), fm)
    _write_ivecs(str(tmp_path / "groundtruth.ivecs"), im)
    fdf = spark.read.format("vecs").option("kind", "fvecs").load(str(tmp_path))
    idf = spark.read.format("vecs").option("kind", "ivecs").load(str(tmp_path))
    assert fdf.count() == 5 and idf.count() == 5
    assert all(r["vec"] == [1.5] * 4 for r in fdf.collect())
    assert sorted(r["vec"][0] for r in idf.collect()) == [0, 4, 8, 12, 16]


def test_append_mode_preserves_existing(spark, tmp_path):
    """Two append writes into one directory must accumulate (same-name
    clobber regression: part files carry unique suffixes and stage
    through _temporary)."""
    import os as _os

    from pyspark.sql import functions as F

    out = str(tmp_path / "acc")
    d1 = spark.range(10).select(F.array(F.col("id").cast("float")).alias("vec"))
    d2 = spark.range(7).select(F.array(F.col("id").cast("float") + 100).alias("vec"))
    d1.write.format("vecs").option("kind", "fvecs").mode("append").save(out)
    d2.write.format("vecs").option("kind", "fvecs").mode("append").save(out)
    back = spark.read.format("vecs").load(out)
    assert back.count() == 17
    assert not _os.path.exists(_os.path.join(out, "_temporary"))
    vals = sorted(r["vec"][0] for r in back.collect())
    assert vals == [float(i) for i in range(10)] + [float(100 + i) for i in range(7)]


def test_option_validation_errors(spark, tmp_path):
    mat = np.zeros((4, 2), dtype="float32")
    p = str(tmp_path / "x.fvecs")
    write_fvecs(p, mat)
    with pytest.raises(Exception, match="unknown vecs kind"):
        spark.read.format("vecs").option("kind", "dvecs").load(p).collect()
    with pytest.raises(Exception, match="must be positive"):
        spark.read.format("vecs").option(
            "records_per_partition", 0
        ).load(p).collect()
    with pytest.raises(Exception, match="cannot infer"):
        spark.read.format("vecs").load(str(tmp_path / "nothing.bin")).collect()


def test_isin_with_null_degrades_to_no_prune(spark, tmp_path):
    """A null inside a pushed In-list must not crash planning — pruning
    silently skips non-int members and Spark's re-applied filter keeps
    the result correct."""
    from pyspark.sql import functions as F

    mat = np.arange(80, dtype="float32").reshape(20, 4)
    p = str(tmp_path / "x.fvecs")
    write_fvecs(p, mat)
    df = spark.read.format("vecs").option("records_per_partition", 5).load(p)
    got = df.filter(F.col("id").isin(F.lit(3), F.lit(None), F.lit(12)))
    assert sorted(r["id"] for r in got.collect()) == [3, 12]


def test_stream_base_derivation_restart_stable():
    """Base assignment is a pure function of (start offset, end files):
    replaying from a checkpointed offset — which lags the in-memory
    view by one batch — reproduces the same per-file bases."""
    from vector_search_go_spark.sources.vecs import _derive_bases

    # batch 1: files z, m arrive (non-alphabetical arrival vs name order)
    b1 = _derive_bases({"files": {}, "bases": {}}, {"z": 5, "m": 3})
    assert b1 == {"m": 0, "z": 1}
    # batch 2 in-memory continuation: file a arrives
    b2 = _derive_bases({"files": {"z": 5, "m": 3}, "bases": b1}, {"z": 5, "m": 3, "a": 2})
    assert b2 == {"m": 0, "z": 1, "a": 2}
    # restart: logged start offset carries bases one batch BEHIND its
    # file list (batch 2's end was planned before batch 2's partitions
    # ran) — derivation must still land a at index 2, not resort it
    # in front of m/z
    logged = {"files": {"z": 5, "m": 3, "a": 2}, "bases": b1}
    b2_replay = _derive_bases(logged, {"z": 5, "m": 3, "a": 2, "b": 1})
    assert b2_replay == {"m": 0, "z": 1, "a": 2, "b": 3}


def test_stream_bases_path_survives_double_restart(tmp_path):
    """The in-offset base map cannot survive a DOUBLE restart with
    out-of-lexicographic-order arrivals (the restarted process's first
    latestOffset logs an empty map before partitions can rebuild it).
    With .option('bases_path'), the map persists durably: a fresh
    reader recovers the exact arrival-order assignment any number of
    restarts later. Without the option, the out-of-order assignment
    must at least WARN."""
    import warnings as _warnings

    from vector_search_go_spark.sources.vecs import VecsStreamReader

    src = tmp_path / "landing"
    src.mkdir()
    bp = str(tmp_path / "bases.json")
    z = np.ones((5, 4), dtype="float32")
    write_fvecs(str(src / "z.fvecs"), z)
    opts = {"path": str(src), "kind": "fvecs", "bases_path": bp}

    r1 = VecsStreamReader(opts)
    off0 = r1.initialOffset()
    off1 = r1.latestOffset()
    parts1 = r1.partitions(off0, off1)
    assert {p.base_id >> 32 for p in parts1} == {0}  # z -> 0

    # file 'a' arrives AFTER 'z' but sorts before it
    write_fvecs(str(src / "a.fvecs"), np.zeros((3, 4), dtype="float32"))
    off2 = r1.latestOffset()
    parts2 = r1.partitions(off1, off2)
    assert {p.base_id >> 32 for p in parts2} == {1}  # a -> 1, arrival order

    # RESTART 1: fresh process; first call is latestOffset (the call
    # that poisons the in-offset scheme) — here it recovers from disk
    r2 = VecsStreamReader(opts)
    off3 = r2.latestOffset()
    assert off3["bases"] == {str(src / "z.fvecs"): 0, str(src / "a.fvecs"): 1}

    # RESTART 2 from that offset: assignment still exact
    write_fvecs(str(src / "m.fvecs"), np.zeros((2, 4), dtype="float32"))
    r3 = VecsStreamReader(opts)
    off4 = r3.latestOffset()
    parts3 = r3.partitions(off3, off4)
    assert {p.base_id >> 32 for p in parts3} == {2}  # m -> 2
    assert r3._bases[str(src / "z.fvecs")] == 0
    assert r3._bases[str(src / "a.fvecs")] == 1

    # without bases_path: same out-of-order arrival warns
    src2 = tmp_path / "landing2"
    src2.mkdir()
    write_fvecs(str(src2 / "z.fvecs"), z)
    r = VecsStreamReader({"path": str(src2), "kind": "fvecs"})
    o1 = r.latestOffset()
    r.partitions(r.initialOffset(), o1)
    write_fvecs(str(src2 / "a.fvecs"), np.zeros((3, 4), dtype="float32"))
    o2 = r.latestOffset()
    with _warnings.catch_warnings(record=True) as w:
        _warnings.simplefilter("always")
        r.partitions(o1, o2)
    assert any("out of lexicographic order" in str(x.message) for x in w)


def test_multi_shard_positional_ids(spark, tmp_path):
    """Distributed fvecs writes preserve the positional-id contract:
    repartitionByRange gives shard i an ascending contiguous range,
    shard names sort by partition id, and the batch reader numbers
    records sequentially across the sorted file list — so N write
    tasks reproduce exactly the ids of one sorted file."""
    from pyspark.sql import functions as F

    n = 200
    df = spark.createDataFrame(
        [(int(i), [float(i), float(-i)]) for i in range(n)],
        "vec_id bigint, vec array<float>",
    ).orderBy(F.rand(7))  # scrambled input order
    out = str(tmp_path / "sharded")
    (
        df.repartitionByRange(4, "vec_id")
        .sortWithinPartitions("vec_id")
        .select("vec")
        .write.format("vecs")
        .option("kind", "fvecs")
        .mode("overwrite")
        .save(out)
    )
    import os as _os

    shards = [f for f in _os.listdir(out) if f.endswith(".fvecs")]
    assert len(shards) >= 2, "write did not shard — scale path untested"
    back = spark.read.format("vecs").load(out).collect()
    assert len(back) == n
    for r in back:
        assert r["vec"][0] == float(r["id"])  # id == global sorted rank


def test_stream_legacy_offset_refused(tmp_path):
    """A checkpoint offset with consumed files but NO 'bases' key comes
    from the pre-sequential-base id scheme; resuming would renumber the
    id space, so partitions() must refuse loudly instead of silently
    remapping (ADVICE r4)."""
    import pytest as _pytest

    from vector_search_go_spark.sources.vecs import VecsStreamReader

    src = tmp_path / "landing"
    src.mkdir()
    write_fvecs(str(src / "a.fvecs"), np.ones((3, 4), dtype="float32"))
    r = VecsStreamReader({"path": str(src), "kind": "fvecs"})
    legacy = {"files": {str(src / "a.fvecs"): 3}}  # no "bases" key
    end = r.latestOffset()
    with _pytest.raises(ValueError, match="predates the sequential id-base"):
        r.partitions(legacy, end)
    # an UNconsumed legacy offset has nothing to remap — allowed
    assert r.partitions({"files": {str(src / "a.fvecs"): 0}}, end)


def test_stream_rederive_warns_at_fallback_moment(tmp_path):
    """Second-restart hazard (ADVICE r4): when bases re-derive from an
    offset whose base map is EMPTY while multiple files were already
    consumed and no bases_path is set, the single-sorted-group fallback
    is actually running — that moment must warn, not just the earlier
    arrival-time assignment."""
    import warnings as _warnings

    from vector_search_go_spark.sources.vecs import VecsStreamReader

    src = tmp_path / "landing"
    src.mkdir()
    write_fvecs(str(src / "z.fvecs"), np.ones((5, 4), dtype="float32"))
    write_fvecs(str(src / "a.fvecs"), np.zeros((3, 4), dtype="float32"))
    r = VecsStreamReader({"path": str(src), "kind": "fvecs"})
    # restart-shaped offset: both files consumed, base map empty (the
    # first post-restart latestOffset logs {} before any rebuild)
    start = {
        "files": {str(src / "z.fvecs"): 5, str(src / "a.fvecs"): 3},
        "bases": {},
    }
    end = r.latestOffset()
    with _warnings.catch_warnings(record=True) as w:
        _warnings.simplefilter("always")
        r.partitions(start, end)
    assert any("re-deriving id bases" in str(x.message) for x in w)


def test_stream_legacy_offset_allowed_with_seeded_bases(tmp_path):
    """The legacy-offset refusal's own remediation must work: a
    bases_path map covering every consumed file is an authoritative id
    assignment, so resume proceeds with those bases."""
    import json

    from vector_search_go_spark.sources.vecs import VecsStreamReader

    src = tmp_path / "landing"
    src.mkdir()
    f_a = str(src / "a.fvecs")
    write_fvecs(f_a, np.ones((3, 4), dtype="float32"))
    bp = str(tmp_path / "bases.json")
    with open(bp, "w") as fh:
        json.dump({f_a: 5}, fh)  # original (non-lexicographic) base
    r = VecsStreamReader({"path": str(src), "kind": "fvecs", "bases_path": bp})
    legacy = {"files": {f_a: 1}}  # consumed, no "bases" key
    write_fvecs(str(src / "b.fvecs"), np.zeros((2, 4), dtype="float32"))
    end = r.latestOffset()
    parts = r.partitions(legacy, end)
    bases = {p.base_id >> 32 for p in parts}
    assert 5 in bases  # a resumes under its seeded base, not a re-derived one
