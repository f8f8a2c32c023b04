"""Train/eval decontamination by n-gram overlap.

Benchmark contamination — eval-set text leaking into the training
corpus — inflates evals and is checked by every serious training
pipeline. The standard detector (as in open LM data tooling) is
n-gram overlap: a training document is contaminated if a high enough
fraction of its shingles also occur anywhere in the eval set.

Scale shape: the eval shingle set is tiny next to a 100 TB training
corpus, so it is DISTINCT'd and broadcast; the train side streams
through a broadcast-hash semi-match with no shuffle of the corpus.
Only hit rows (train_doc, shared shingle) reach the aggregation, and
they group on doc_id — cardinality tracks contamination, not corpus
size. Count DISTINCT shingles per doc, not hits: one shingle shared
with many eval docs is still one overlapping n-gram.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def contamination_scores(
    train_shingled: DataFrame,
    eval_shingled: DataFrame,
    threshold: float,
) -> DataFrame:
    """(doc_id, shingles) x2 -> per-train-doc overlap report:
    n_shingles, n_hit (distinct shingles also in eval), ratio, and the
    contaminated flag (ratio >= threshold). Docs with zero overlap are
    omitted (at corpus scale almost every doc is clean — emitting them
    would make the report the size of the corpus)."""
    eval_shingles = (
        eval_shingled.select(F.explode("shingles").alias("s")).distinct()
    )
    train = train_shingled.select(
        "doc_id", F.size("shingles").alias("n_shingles"), "shingles"
    )
    hits = (
        train.select("doc_id", "n_shingles", F.explode("shingles").alias("s"))
        .join(F.broadcast(eval_shingles), "s")
        .groupBy("doc_id", "n_shingles")
        .agg(F.count(F.lit(1)).alias("n_hit"))  # shingles are distinct
        # per doc already (array_distinct upstream), so count == count
        # distinct without the extra dedup pass
    )
    ratio = F.col("n_hit").cast("double") / F.col("n_shingles")
    return hits.select(
        "doc_id",
        "n_shingles",
        "n_hit",
        ratio.alias("contamination_ratio"),
        (ratio >= threshold).alias("contaminated"),
    )
