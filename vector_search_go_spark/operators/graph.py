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

Two interchangeable implementations (identical fixpoint, parity-pinned
in tests/test_graph.py):

  - ``impl='propagate'`` (default) — min-label propagation; rounds =
    graph diameter, one join + one groupBy per round. Near-dup graphs
    are shallow cliques/short chains, so this wins on latency: measured
    at sf0.01, curate_training_corpus is 5.2 s with propagate vs 13.8 s
    with star (star pays two grouped passes per round and its log-round
    advantage never engages on diameter <= 3 graphs).
  - ``impl='star'`` — the large-star/small-star alternation of
    Kiveris et al., "Connected Components in MapReduce and Beyond"
    (SoCC'14): rounds = O(log n) on ANY topology, and high-degree nodes
    shrink their own stars instead of funneling every neighbor through
    one reducer. This is the path to pick at 100 TB when components may
    be deep or a celebrity node would hotspot one reducer
    (tests/test_graph.py::test_star_long_chain_logarithmic_rounds pins
    the 64-chain converging inside 12 rounds where propagate needs 63;
    test_impl_parity_random_graph pins the identical fixpoint).

Each round ends in `localCheckpoint` to truncate lineage — without it
the plan doubles per iteration and the job graph, not the data, becomes
the bottleneck.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
    impl: str = "propagate",
    collect_threshold: int | None = 100_000,
) -> DataFrame:
    """Resolve an undirected edge list into components.

    Returns (id, label) with one row per distinct node appearing in any
    edge; `label` is the minimum node id in the node's component.
    Deterministic: the fixpoint is unique. Raises if `max_iter` rounds
    don't converge rather than silently returning partial labels.

    ``collect_threshold`` (r12, guide §8.4 "decide with small rows"):
    dup-pair edge lists are DECISION-sized — a few ids per duplicate
    cluster, orders of magnitude smaller than the corpus they came
    from. When the edge list fits under the threshold (one
    limit-bounded collect probes it — the same size-estimate gamble
    Spark's own broadcast-join threshold takes), the transitive closure
    runs as a driver-side union-find with min-id representatives: the
    SAME unique fixpoint, zero iterative Spark rounds, and the labels
    ship back as a broadcastable local relation. Edge lists that
    overflow the probe fall through to the distributed loop unchanged
    (the probe's partial rows are discarded). None disables the fast
    path. Parity is pinned in tests/test_graph.py."""
    if collect_threshold is not None:
        probe = edges.select(
            F.col(src).alias("a"), F.col(dst).alias("b")
        ).limit(collect_threshold + 1).collect()
        if len(probe) <= collect_threshold:
            return _cc_local(edges.sparkSession, probe, edges.schema[src].dataType)
    if impl == "star":
        return _cc_star(edges, src, dst, max_iter)
    if impl != "propagate":
        raise ValueError(f"unknown connected_components impl {impl!r}")
    # lazy checkpoints: the convergence count right below is the FIRST
    # action over each round's plan, so materialization rides inside
    # that job — one job per round instead of two (eager checkpoint +
    # count); later consumers read the cached rows either way
    sym = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    sym = sym.union(sym.select("b", "a")).distinct().localCheckpoint(eager=False)

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
        stepped = stepped.localCheckpoint(eager=False)
        changed = stepped.filter(F.col("new_label") < F.col("label")).count()
        labels = stepped.select("id", F.col("new_label").alias("label"))
        if changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds"
    )


def _cc_local(spark, edge_rows, id_type) -> DataFrame:
    """Driver-side union-find over a collected edge list: one row per
    distinct node, label = min node id in its component — the identical
    fixpoint to the distributed impls (unique by definition), computed
    without per-round Spark jobs. Path-halving + union-by-min keeps it
    near-linear; the result is a local relation the consumers can
    broadcast."""
    from pyspark.sql.types import StructField, StructType

    parent: dict = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in edge_rows:
        a, b = r["a"], r["b"]
        if a not in parent:
            parent[a] = a
        if b not in parent:
            parent[b] = b
        ra, rb = find(a), find(b)
        if ra != rb:
            # union by min id so every root IS its component's minimum
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra
    rows = sorted((x, find(x)) for x in parent)
    schema = StructType(
        [StructField("id", id_type, True), StructField("label", id_type, True)]
    )
    return spark.createDataFrame(rows, schema)


def _cc_star(edges: DataFrame, src: str, dst: str, max_iter: int) -> DataFrame:
    """Large-star/small-star alternation (Kiveris et al., SoCC'14).

    Edge-set rewriting: large-star hangs every neighbor larger than u
    off u's local minimum; small-star re-hangs the smaller neighbors.
    The edge set converges to disjoint stars whose centers are the
    component minima — O(log n) rounds on any topology. Convergence is
    detected by an (edge count, xor of xxhash64) fingerprint: one cheap
    agg per round instead of a full except-join (xor is commutative and
    overflow-free under ANSI mode; edges are distinct so nothing
    self-cancels)."""
    nodes = edges.select(F.col(src).alias("id")).union(
        edges.select(F.col(dst).alias("id"))
    ).distinct()

    # Canonical undirected edge set (a < b); self-loops carry no
    # connectivity and are re-attached via `nodes` at the end.
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
        # lazy: the fingerprint agg below materializes it in its own job
        .localCheckpoint(eager=False)
    )

    def fingerprint(df: DataFrame) -> tuple:
        row = df.agg(
            F.count(F.lit(1)).alias("n"), F.bit_xor(F.xxhash64("a", "b")).alias("h")
        ).collect()[0]
        return (row["n"], row["h"])

    def large_star(df: DataFrame) -> DataFrame:
        sym = df.union(df.select(F.col("b").alias("a"), F.col("a").alias("b")))
        mins = sym.groupBy("a").agg(F.min("b").alias("m0"))
        mins = mins.select("a", F.least("m0", F.col("a")).alias("m"))
        return (
            sym.join(mins, "a")
            .where(F.col("b") > F.col("a"))
            .select(F.col("b").alias("a"), F.col("m").alias("b"))
        )

    def small_star(df: DataFrame) -> DataFrame:
        # Orient each edge off its larger endpoint u; neighbors v < u.
        o = df.select(F.col("b").alias("u"), F.col("a").alias("v"))
        mins = o.groupBy("u").agg(F.min("v").alias("m"))
        leaves = o.join(mins, "u").where(F.col("v") != F.col("m")).select(
            F.col("v").alias("x"), F.col("m")
        )
        selves = mins.select(F.col("u").alias("x"), F.col("m"))
        return leaves.union(selves)

    def canon(df: DataFrame) -> DataFrame:
        return (
            df.select(
                F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b")
            )
            .where(F.col("a") != F.col("b"))
            .distinct()
        )

    fp = fingerprint(e)
    for _ in range(max_iter):
        stepped = small_star(canon(large_star(e))).toDF("a", "b")
        e = canon(stepped).localCheckpoint(eager=False)
        fp2 = fingerprint(e)
        if fp2 == fp:
            # Stars: every edge is (leaf, center) with center the
            # component min; a node's label is its min neighbor (or
            # itself for centers / isolated self-loop nodes).
            sym = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
            labels = (
                sym.groupBy("a").agg(F.min("b").alias("m"))
                .select(F.col("a").alias("id"), F.least("m", F.col("a")).alias("label"))
            )
            return (
                nodes.join(labels, "id", "left")
                .select("id", F.coalesce("label", F.col("id")).alias("label"))
            )
        fp = fp2
    raise RuntimeError(
        f"connected_components(star) did not converge in {max_iter} rounds"
    )


def duplicate_groups(
    pairs: DataFrame,
    id_a: str = "doc_a",
    id_b: str = "doc_b",
    impl: str = "propagate",
) -> DataFrame:
    """Resolve dup-candidate pairs into groups: one row per duplicate
    group — (group_id = canonical min doc id, n_docs, member ids
    sorted). Every node in the edge list lands in exactly one group of
    size >= 2."""
    comp = connected_components(pairs, src=id_a, dst=id_b, impl=impl)
    return comp.groupBy(F.col("label").alias("group_id")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sort_array(F.collect_list("id")).alias("doc_ids"),
    )
