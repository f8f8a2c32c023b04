"""Stratified sampling, sequence packing, decontamination operators."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vector_search_go_spark.operators.decontam import contamination_scores
from vector_search_go_spark.operators.packing import pack_sequences
from vector_search_go_spark.operators.sampling import stratified_sample
from vector_search_go_spark.queries_pipeline import (
    decontaminate_train_split,
    pack_training_sequences,
    sample_rebalance_langs,
)


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_sample_deterministic_and_rate(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    kept1 = {r["doc_id"] for r in sample_rebalance_langs(spark, sf_dir).collect()}
    kept2 = {r["doc_id"] for r in sample_rebalance_langs(spark, sf_dir).collect()}
    assert kept1 == kept2
    n_en = docs.filter("lang = 'en'").count()
    n_en_kept = docs.filter("lang = 'en'").filter(
        F.col("doc_id").isin(kept1)
    ).count()
    # content-hash buckets are uniform: 25% +- sampling noise
    assert 0.10 <= n_en_kept / n_en <= 0.45
    # non-target strata untouched
    n_other = docs.filter("lang <> 'en'").count()
    assert len(kept1) == n_en_kept + n_other


def test_sample_salt_rerolls(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    a = {
        r["doc_id"]
        for r in stratified_sample(docs, "lang", {"en": 0.25}, "text", salt="s1")
        .select("doc_id")
        .collect()
    }
    b = {
        r["doc_id"]
        for r in stratified_sample(docs, "lang", {"en": 0.25}, "text", salt="s2")
        .select("doc_id")
        .collect()
    }
    assert a != b  # different experiments, different (overlapping) samples


def test_sample_rejects_bad_rate(spark, sf_dir):
    with pytest.raises(ValueError):
        stratified_sample(_docs(spark, sf_dir), "lang", {"en": 0.2505}, "text")


def test_packing_offsets_consecutive(spark, sf_dir):
    rows = pack_training_sequences(spark, sf_dir).collect()
    by_stream: dict[tuple, list] = {}
    for r in rows:
        by_stream.setdefault((r["split"], r["shard"]), []).append(r)
    assert len(by_stream) > 1
    budget = 2048
    for stream in by_stream.values():
        stream.sort(key=lambda r: r["doc_id"])
        off = 0
        for r in stream:
            assert r["begin_offset"] == off
            assert r["pack_id"] == off // budget
            assert r["offset_in_pack"] == off % budget
            off += r["n_tokens"]


def test_packing_window_is_partition_bounded(spark, sf_dir):
    # the plan must not contain a global (empty-key) window sort
    docs = _docs(spark, sf_dir).select(
        "doc_id", F.size(F.split("text", " ")).alias("n_tokens"),
        F.lit("train").alias("split"), (F.col("doc_id") % 4).alias("shard"),
    )
    plan = pack_sequences(
        docs, "n_tokens", 2048, ["split", "shard"]
    )._jdf.queryExecution().executedPlan().toString()
    assert "Window" in plan
    assert "PartitionBy: []" not in plan


def test_contamination_scores_counts_distinct_shingles(spark):
    train = spark.createDataFrame(
        [(1, ["a b c", "c d e", "x y z"]), (2, ["p q r"])],
        "doc_id long, shingles array<string>",
    )
    ev = spark.createDataFrame(
        # "a b c" appears in TWO eval docs -> must still count once
        [(10, ["a b c", "c d e"]), (11, ["a b c"])],
        "doc_id long, shingles array<string>",
    )
    got = {r["doc_id"]: r for r in contamination_scores(train, ev, 0.5).collect()}
    assert set(got) == {1}  # doc 2 has zero overlap -> omitted
    assert got[1]["n_hit"] == 2
    assert got[1]["n_shingles"] == 3
    assert got[1]["contaminated"] is True


def test_decontaminate_finds_planted_cross_split_dups(spark, sf_dir):
    rows = decontaminate_train_split(spark, sf_dir).collect()
    flagged = [r for r in rows if r["contaminated"]]
    assert flagged, "fixture should contain cross-split near-dups"
    for r in flagged:
        assert r["contamination_ratio"] >= 0.5


def test_cycled_ascii_bytes_guard():
    """The media-dedup synths refuse non-ASCII text loudly (ADVICE r8):
    the DuckDB oracles index characters while Spark slices UTF-8 bytes,
    so parity would break silently on a non-ASCII corpus."""
    import pytest as _pytest

    from vector_search_go_spark.queries_pipeline import _cycled_ascii_bytes

    assert _cycled_ascii_bytes("abc", 7) == b"abcabca"
    assert _cycled_ascii_bytes("xyz", 2) == b"xy"
    with _pytest.raises(ValueError, match="ASCII"):
        _cycled_ascii_bytes("café latte", 16)
