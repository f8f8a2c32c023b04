"""Scalar-quantization operator tests (operators/sq8.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from vector_search_go_spark.operators.sq8 import (
    SQ_LEVELS,
    sq8_dequant,
    sq8_encode,
    sq8_stats,
)

DIM = 64


def _corpus(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return emb.filter(F.col("vec_id") % 50 != 0).select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vec")
    )


def test_codes_in_range_and_full_width(spark, sf_dir):
    corpus = _corpus(spark, sf_dir)
    codes = sq8_encode(corpus, sq8_stats(corpus, DIM), DIM)
    stats = codes.agg(
        F.min(F.array_min("codes")).alias("lo"),
        F.max(F.array_max("codes")).alias("hi"),
    ).collect()[0]
    assert stats["lo"] == 0  # some dim hits its min
    assert stats["hi"] == SQ_LEVELS - 1  # the max vector clamps to 255
    assert codes.filter(F.size("codes") != DIM).count() == 0


def test_dequant_error_bounded_by_scale(spark, sf_dir):
    """Midpoint reconstruction error must be <= scale/2 per dimension."""
    corpus = _corpus(spark, sf_dir)
    st = sq8_stats(corpus, DIM)
    codes = sq8_encode(corpus, st, DIM)
    joined = (
        codes.join(corpus, "id")
        .crossJoin(F.broadcast(st))
        .withColumn("xhat", sq8_dequant(F.col("codes"), DIM))
    )
    worst = joined.select(
        F.array_max(
            F.zip_with(
                F.zip_with(
                    F.transform("vec", lambda x: x.cast("double")),
                    "xhat",
                    lambda x, h: F.abs(x - h),
                ),
                "scales",
                lambda err, sc: err - sc * 0.5 - 1e-12,
            )
        ).alias("slack")
    ).agg(F.max("slack").alias("m")).collect()[0]["m"]
    assert worst <= 0.0, worst


def test_sq8_recall_is_perfect_here(spark, sf_dir):
    """At 8 bits/dim the approx ordering is near-exact; with a 5x-k
    shortlist the reranked top-10 must equal the exact top-10."""
    from vector_search_go_spark.queries_pipeline import sq8_recall_vs_exact

    rows = sq8_recall_vs_exact(spark, sf_dir).collect()
    assert rows
    avg = sum(r["recall"] for r in rows) / len(rows)
    assert avg >= 0.99, avg
