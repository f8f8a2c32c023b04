"""Connected components over a pair-edge DataFrame.

The missing half of dedup at scale: candidate-pair generation (MinHash
bands, jaccard inverted index, cosine threshold — queries_text.py) gives
PAIRS, but "keep one copy per duplicate group" needs the transitive
closure of those pairs. This module resolves pairs into components with
min-id label propagation:

  - symmetrize the edge list once;
  - each round, every node takes min(own label, min neighbor label) —
    one equi-join + one groupBy (two shuffles) per round;
  - converged when no label changed; the fixpoint (min id reachable in
    the component) is unique, so the result is deterministic regardless
    of scheduling and is oracle-checkable against a recursive-CTE
    transitive closure.

Scale notes: rounds needed = graph diameter, and near-dup clusters are
shallow (a chain a~b~c longer than a few hops is rare in practice), so
O(d) rounds with d small beats the constant-factor overhead of the
O(log n)-round large-star/small-star alternation (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14) on this
workload; that algorithm is the right upgrade if components with long
chains appear. Each round ends in `localCheckpoint` to truncate lineage
— without it the plan doubles per iteration and the job graph, not the
data, becomes the bottleneck.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """Resolve an undirected edge list into components.

    Returns (id, label) with one row per distinct node appearing in any
    edge; `label` is the minimum node id in the node's component.
    Deterministic: the fixpoint is unique. Raises if `max_iter` rounds
    don't converge (diameter > max_iter) rather than silently returning
    partial labels.
    """
    sym = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    sym = sym.union(sym.select("b", "a")).distinct().localCheckpoint(eager=True)

    labels = sym.select(F.col("a").alias("id")).distinct().withColumn(
        "label", F.col("id")
    )
    for _ in range(max_iter):
        nbr_min = (
            sym.join(labels, sym["b"] == labels["id"])
            .groupBy("a")
            .agg(F.min("label").alias("nbr_min"))
        )
        stepped = labels.join(
            nbr_min, labels["id"] == nbr_min["a"], "left"
        ).select(
            "id",
            "label",
            F.least("label", F.coalesce("nbr_min", F.col("label"))).alias("new_label"),
        )
        stepped = stepped.localCheckpoint(eager=True)
        changed = stepped.filter(F.col("new_label") < F.col("label")).count()
        labels = stepped.select("id", F.col("new_label").alias("label"))
        if changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds"
    )


def duplicate_groups(pairs: DataFrame, id_a: str = "doc_a", id_b: str = "doc_b") -> DataFrame:
    """Resolve dup-candidate pairs into groups: one row per duplicate
    group — (group_id = canonical min doc id, n_docs, member ids
    sorted). Every node in the edge list lands in exactly one group of
    size >= 2."""
    comp = connected_components(pairs, src=id_a, dst=id_b)
    return comp.groupBy(F.col("label").alias("group_id")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sort_array(F.collect_list("id")).alias("doc_ids"),
    )
