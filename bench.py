"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line:

  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is materialized via a count-style collect (no driver-side
row transfer beyond aggregates/top-k results). The first query pays JVM
warm-up; a tiny warm-up job runs first so per-query numbers are
comparable. LSH entries time train+search together (the reference's
annbench does the same split-up, BASELINE.md)."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "window_running_sum",
    "time_bucket_events",
    "knn_exact_l2",
    "knn_exact_cosine",
    "lsh_knn_l2",
    "lsh_recall_l2",
    "lsh_recall_cosine",
    "vector_stats_mad",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "text_quality_score",
    "ann_ivf_cosine",
    "ivf_recall_vs_exact",
    "asof_click_before_purchase",
    "range_join_click_purchase",
    "rollup_multiresolution",
    "sketch_rollup_daily",
    "join_bloom_pruned",
    "split_train_val_test",
    "curate_training_corpus",
    "sample_rebalance_langs",
    "pack_training_sequences",
    "decontaminate_train_split",
    "text_repetition_filter",
    "dedup_global_ngrams",
    "text_tfidf_top_terms",
    "pq_search_adc",
    "pq_recall_vs_exact",
    "pq_search_adc_trained",
    "pq_trained_recall_vs_exact",
    "sq8_search_rerank",
    "sq8_recall_vs_exact",
    "ivf_pq_search",
    "ivf_pq_recall_vs_exact",
    "kmeans_train_centroids",
    "embed_random_projection",
    "source_fvecs_roundtrip",
]


def main() -> None:
    from vector_search_go_spark.session import get_spark
    from vector_search_go_spark import registry

    spark = get_spark("bench", cpus=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()

    # JVM/codegen warm-up outside the timed section.
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    times: dict[str, float] = {}
    gates: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        fn = qs.get(name)
        if fn is None:
            continue
        t0 = time.time()
        df = fn(spark, SF_DIR)
        if name.startswith("lsh_recall") or name.endswith("_recall_vs_exact"):
            # quality gate: record the mean eps-recall itself
            # (BASELINE.md bands: >=0.93 Euclidean / >=0.85 cosine)
            from vector_search_go_spark.operators.recall import mean_precision_recall

            _, r = mean_precision_recall(df)
            gates[name] = round(r, 4)
            n = 1
        else:
            n = df.count()
        dt = time.time() - t0
        times[name] = round(dt, 3)
        total += dt
        print(f"# {name}: {n} rows in {dt:.2f}s", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": round(total, 3),
                "unit": "sec",
                "queries": times,
                "gates": gates,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
