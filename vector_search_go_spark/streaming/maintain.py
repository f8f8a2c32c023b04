"""Drift-aware index maintenance (VERDICT r4 next-round item 2).

Streaming ingest hashes new vectors with a FROZEN forest
(streaming/ingest.py): planes are data-dependent (reference
hasher.go:100-134), so a stream whose distribution drifts away from the
build sample lands its mass in a shrinking set of buckets the old trees
cannot split — search fan-in concentrates, hot-bucket thinning starts
discarding true neighbors, and recall silently decays. The reference's
only answer is a full manual re-Train (clear-and-rebuild,
lsh/lsh.go:107-110); this module decides WHEN that rebuild is due, from
the store's own artifacts:

  - ``LshIndex.save`` persists the build-time bucket-mass distribution
    (``{path}/build_stats``);
  - ``bucket_staleness`` compares the current store against it: total
    variation distance between the two normalized bucket-mass
    distributions, corpus growth, and the share of mass in buckets
    that did not exist at build time;
  - ``maintain`` trips on thresholds and runs the reference's
    clear-and-rebuild — retrain the forest on the CURRENT vectors
    table, rewrite the store, refresh the catalog.

Scale shape: staleness is one aggregation over the bucket store joined
to an n_buckets-row baseline — no vector data moves. The rebuild is the
same train+save the store was born from; at 100 TB it runs per shard on
whatever cadence the staleness report dictates, instead of on a guess.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def _shards_meta(path: str) -> dict | None:
    """shards_meta of a sharded layout, None for single stores (and for
    remote paths — the sharded maintenance path is local-layout-only,
    like the compaction triggers)."""
    if "://" in path:
        return None
    from vector_search_go_spark.serve.sharded import read_shards_meta

    return read_shards_meta(path)


def _sharded_staleness(
    spark: SparkSession, path: str, n_shards: int, comp: str, keys: list[str]
) -> dict:
    """Whole-store staleness of a sharded layout: the shards partition
    the corpus by id-hash, so the global mass distribution is the UNION
    of per-shard masses — per-shard baselines sum by key into the global
    build baseline, and the current masses aggregate over the union of
    shard component tables. One aggregation either way; no vector data
    moves (the same scale shape as the single-store measurement)."""
    from vector_search_go_spark.serve.sharded import union_shard_component

    for k in range(n_shards):
        _read_build_stats(
            spark, f"{path}/shard={k}", "the family's sharded saver"
        )
    build = (
        union_shard_component(spark, path, n_shards, "build_stats")
        .groupBy(*keys)
        .agg(F.sum("sz").alias("sz_build"))
    )
    now = (
        union_shard_component(spark, path, n_shards, comp)
        .groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("sz_now"))
    )
    return _mass_staleness(now, build, keys, path)


def _read_build_stats(spark: SparkSession, path: str, resave_hint: str):
    """Load ``{path}/build_stats`` with a clear error when the store
    predates baseline persistence. Works for remote stores too:
    os.path can't see s3://-style paths, so there the spark read itself
    is the existence probe."""
    stats_path = f"{path}/build_stats"
    if "://" not in path and not os.path.exists(stats_path):
        raise FileNotFoundError(
            f"{stats_path} missing: the store predates build-stats "
            f"persistence — re-save the index ({resave_hint}) to baseline it"
        )
    try:
        return spark.read.parquet(stats_path)
    except Exception as exc:
        raise FileNotFoundError(
            f"{stats_path} unreadable: the store predates build-stats "
            f"persistence — re-save the index ({resave_hint}) to baseline it"
        ) from exc


def store_metric(spark: SparkSession, path: str) -> str | None:
    """The metric a saved store was built under (persisted as
    ``{path}/store_meta`` by ann_ivf.ivf_save for cell assignment and
    exact_knn.scan_save for scoring); None for stores predating metric
    persistence. Only ABSENCE maps to None —
    a store_meta that exists but cannot be read raises, so callers'
    mismatch guards cannot be silently disabled by a transient remote
    read failure or a corrupt file."""
    import json

    meta_path = f"{path}/store_meta"
    if "://" not in path and not os.path.exists(meta_path):
        return None
    try:
        # spark.read.json surfaces malformed JSON as _corrupt_record
        # rows rather than throwing, so the field access + parse sit
        # inside the guard too
        rows = spark.read.json(meta_path).collect()
        return json.loads(rows[0]["meta_json"]).get("metric")
    except Exception as exc:
        # remote path: a missing-path analysis error is the legacy
        # case; anything else (throttling, credentials, corruption)
        # must surface rather than masquerade as "no metadata"
        if "://" in path and "PATH_NOT_FOUND" in str(exc):
            return None
        raise RuntimeError(
            f"{meta_path} exists but could not be read — refusing to "
            "treat the store as legacy (metric-mismatch guards would "
            "be silently disabled)"
        ) from exc


def ingest_cycle(
    spark: SparkSession,
    vec_stream,
    path: str,
    checkpoint_path: str,
    timeout: int = 120,
    compact_over: int | None = 256,
    compact_dedup: bool = False,
    **maintain_kwargs,
) -> dict:
    """One cycle of the streaming maintenance loop over a saved LSH,
    IVF, or IVF+PQ store — the operational wrapper a scheduled job
    calls per drain window instead of wiring
    drain/staleness/rebuild/compact by hand:

      1. drain ``vec_stream`` (id, vec) into the store through its own
         frozen model (LSH: ingest_to_lsh_store appends buckets AND
         vectors under one checkpoint; IVF: ingest_to_ivf_store assigns
         cells under the store's persisted metric; IVF+PQ:
         ingest_to_ivfpq_store encodes codes into cells AND appends the
         rerank vectors);
      2. measure staleness against the build-time baseline and run the
         clear-and-rebuild when tripped (maintain / maintain_ivf /
         maintain_ivfpq — the reference's Train semantics,
         lsh/lsh.go:107-110, fired by measurement);
      3. when NOT tripped, heal fragmentation instead: every appended
         store component holding more than ``compact_over`` parquet
         fragments (LSH: buckets AND vectors; IVF: cells; IVF+PQ: cells
         AND vectors) is compacted back to the trained layout
         (compaction is folded into the rebuild otherwise — a retrain
         rewrites the store).

    Routes by store layout like engine.maintain. Returns the staleness
    report with ``action`` (none | rebuilt | compacted) and, when
    compacted, per-component stats under ``compact``.

    A caller holding a live reader/engine over the store must re-load
    after a 'rebuilt' or 'compacted' cycle — both rewrite the files the
    old file index points at (the same contract as engine.compact)."""
    from vector_search_go_spark.streaming.ingest import (
        compact_bucket_store,
        compact_cells_store,
        compact_codes_store,
        compact_vectors_store,
        ingest_to_ivf_store,
        ingest_to_ivfpq_store,
        ingest_to_lsh_store,
        parquet_file_count,
    )

    smeta = _shards_meta(path)
    if smeta is not None:
        return _ingest_cycle_sharded(
            spark, vec_stream, path, checkpoint_path, smeta,
            timeout=timeout, compact_over=compact_over,
            compact_dedup=compact_dedup, **maintain_kwargs,
        )

    def _has(sub: str) -> bool:
        if "://" not in path:
            return os.path.isdir(os.path.join(path, sub))
        try:
            spark.read.parquet(f"{path}/{sub}").schema
            return True
        except Exception:
            return False

    if _has("codebook"):
        # IVFADC store (ivfpq_save layout): frozen-model encode drain
        # into cells + the rerank vectors table, rebuild from the
        # store's own vectors when staleness trips.
        # Validate EVERY post-drain precondition BEFORE consuming the
        # stream: the drain checkpoint-commits its batches, so an error
        # raised after it (missing baseline, bad kwargs) strands rows
        # an operator following the re-save hint would then lose.
        if "metric" in maintain_kwargs:
            raise ValueError(
                "ivfpq stores are l2-only (ADC ranks by squared L2); "
                "metric= does not apply"
            )
        _read_build_stats(spark, path, "ivfpq_save")
        ingest_to_ivfpq_store(
            spark, vec_stream, path, checkpoint_path, timeout=timeout
        )
        for sub in ("cells", "vectors"):
            spark.catalog.refreshByPath(f"{path}/{sub}")
        report = maintain_ivfpq(spark, path, **maintain_kwargs)
        components = [
            (f"{path}/cells", compact_codes_store),
            (
                f"{path}/vectors",
                lambda s, p, dedup: compact_vectors_store(
                    s, p, dedup=dedup, block_size=64 << 10
                ),
            ),
        ]
    elif _has("cells"):
        metric = store_metric(spark, path)
        if metric is None:
            metric = maintain_kwargs.get("metric")
            if metric is None:
                raise ValueError(
                    f"store at {path!r} predates metric persistence: pass "
                    "metric= (frozen-centroid assignment must match the "
                    "metric searches run with)"
                )
        _read_build_stats(spark, path, "ivf_save")  # before the drain
        centroids = spark.read.parquet(f"{path}/centroids").select(
            F.col("cid").cast("int"), "cvec"
        )
        ingest_to_ivf_store(
            spark, vec_stream, centroids, f"{path}/cells",
            checkpoint_path, metric=metric, timeout=timeout,
        )
        spark.catalog.refreshByPath(f"{path}/cells")
        report = maintain_ivf(spark, path, **maintain_kwargs)
        components = [(f"{path}/cells", compact_cells_store)]
    else:
        from vector_search_go_spark.lsh.index import LshIndex

        _read_build_stats(spark, path, "LshIndex.save")  # before the drain
        forest = LshIndex.load_forest(spark, path)
        ingest_to_lsh_store(
            spark, vec_stream, forest, path, checkpoint_path, timeout=timeout
        )
        for sub in ("buckets", "vectors"):
            spark.catalog.refreshByPath(f"{path}/{sub}")
        report = maintain(spark, path, **maintain_kwargs)
        # the combined drain fragments BOTH components — the quiet path
        # heals both (a rebuild rewrites the whole store anyway)
        components = [
            (f"{path}/buckets", compact_bucket_store),
            (f"{path}/vectors", compact_vectors_store),
        ]
    if report["action"] == "none" and compact_over is not None and "://" not in path:
        compacted = {
            data_dir: compact_fn(spark, data_dir, dedup=compact_dedup)
            for data_dir, compact_fn in components
            if parquet_file_count(data_dir) > compact_over
        }
        if compacted:
            report = {**report, "action": "compacted", "compact": compacted}
            for data_dir in compacted:
                spark.catalog.refreshByPath(data_dir)
    return report


def _ingest_cycle_sharded(
    spark: SparkSession,
    vec_stream,
    path: str,
    checkpoint_path: str,
    smeta: dict,
    timeout: int = 120,
    compact_over: int | None = 256,
    compact_dedup: bool = False,
    **maintain_kwargs,
) -> dict:
    """ingest_cycle for SHARDED layouts (VERDICT r6 item 2/4): the
    drain routes each microbatch to its id-hash shard through the
    shared frozen models (ingest_to_sharded_store); staleness/rebuild
    run on the whole store (maintain/maintain_ivf/maintain_ivfpq route
    sharded internally — one retrained model, save(shards=N)); the
    quiet path compacts each shard's fragmented components. After ANY
    LSH drain or dedup compaction the global ``hot_buckets`` table is
    refreshed — streaming appends change WHOLE-store bucket sizes, and
    survivor-rule parity (serve/sharded.py) hangs on them."""
    from vector_search_go_spark.serve.sharded import refresh_hot_buckets
    from vector_search_go_spark.streaming.ingest import (
        compact_bucket_store,
        compact_cells_store,
        compact_codes_store,
        compact_vectors_store,
        ingest_to_sharded_store,
        parquet_file_count,
    )

    family = smeta["family"]
    n = int(smeta["n_shards"])
    if family == "ivfpq" and "metric" in maintain_kwargs:
        raise ValueError(
            "ivfpq stores are l2-only (ADC ranks by squared L2); "
            "metric= does not apply"
        )
    per_shard_components = {
        "lsh": [
            ("buckets", compact_bucket_store),
            ("vectors", compact_vectors_store),
        ],
        "ivf": [("cells", compact_cells_store)],
        "ivfpq": [
            ("cells", compact_codes_store),
            (
                "vectors",
                lambda s, p, dedup: compact_vectors_store(
                    s, p, dedup=dedup, block_size=64 << 10
                ),
            ),
        ],
    }
    if family not in per_shard_components:
        raise ValueError(
            f"sharded family {family!r} has no maintenance loop (scan "
            "stores have no frozen model — append with "
            "ingest_to_sharded_store and compact vectors directly)"
        )
    # validate every post-drain precondition BEFORE consuming the
    # stream (the single-store rule): a drain checkpoint-commits its
    # batches, so an error raised after it strands rows
    resave_hint = {
        "lsh": "LshIndex.save(shards=N)",
        "ivf": "ivf_save(shards=N)",
        "ivfpq": "ivfpq_save(shards=N)",
    }[family]
    for k in range(n):
        _read_build_stats(spark, f"{path}/shard={k}", resave_hint)
    ingest_to_sharded_store(
        spark, vec_stream, path, checkpoint_path, timeout=timeout
    )
    for k in range(n):
        for sub, _fn in per_shard_components[family]:
            spark.catalog.refreshByPath(f"{path}/shard={k}/{sub}")
    report = {
        "lsh": maintain,
        "ivf": maintain_ivf,
        "ivfpq": maintain_ivfpq,
    }[family](spark, path, **maintain_kwargs)
    if report["action"] == "none" and compact_over is not None:
        compacted = {}
        for k in range(n):
            for sub, compact_fn in per_shard_components[family]:
                data_dir = f"{path}/shard={k}/{sub}"
                if parquet_file_count(data_dir) > compact_over:
                    compacted[data_dir] = compact_fn(
                        spark, data_dir, dedup=compact_dedup
                    )
        if compacted:
            report = {**report, "action": "compacted", "compact": compacted}
            for data_dir in compacted:
                spark.catalog.refreshByPath(data_dir)
    if family == "lsh" and report["action"] != "rebuilt":
        # the drain changed GLOBAL bucket sizes (and dedup compaction
        # can too) — re-pin survivor parity ONCE, at the end. A rebuild
        # skips this: save(shards=N) rewrote hot_buckets itself, and
        # refreshing before maintain would be a whole-store aggregation
        # the rebuild immediately clobbers.
        refresh_hot_buckets(spark, path)
    return report


def maintain_ivfpq(
    spark: SparkSession,
    path: str,
    tv_threshold: float = 0.25,
    growth_threshold: float = 0.5,
    kmeans_iters: int = 3,
    dedup_ids: bool = True,
    force: bool = False,
    retrain_codebook: bool = True,
    retune_shortlist: bool = True,
) -> dict:
    """IVFADC twin of ``maintain_ivf``: measure cell staleness on the
    codes store; when tripped, run the clear-and-rebuild. The store's
    own ``{path}/vectors`` table (the full-precision rerank component
    of the ivfpq_save layout) IS the corpus, so the rebuild needs no
    external source: retrain the coarse quantizer on current vectors,
    re-derive the PQ codebook (``retrain_codebook=True`` re-trains the
    per-subspace k-means codewords, pq.pq_codebook_trained; False
    reuses the saved codebook — keep False only when codeword drift is
    known to be negligible), re-encode everything, rewrite the store
    (pq.ivfpq_save), refresh the catalog.

    ``retune_shortlist=True`` (VERDICT r5 item 4): after the rebuild,
    re-pick the serving config by measurement on the store's own
    vectors. For IVFADC the knob that moves recall is NOT (cells,
    nprobe) — the 6-sigma drift fixture probes every cell and still
    stalls at 0.67 — it is the ADC rerank budget, so the rebuild runs
    pq.adc_shortlist_probe (bounded driver-side probe, advisor_report's
    sample contract) and persists ``recommended_shortlist`` in
    store_meta; every shortlist=None search path (ivfpq_point_search,
    the batch twin, LocalIvfPqReader) honors it. Well-clustered
    corpora measure the pq_shortlist floor, so the budget only grows
    when the store's own geometry demands it."""
    import json as _json

    from vector_search_go_spark.operators.kmeans import kmeans_fit
    from vector_search_go_spark.operators.pq import (
        adc_shortlist_probe,
        invalidate_stored_shortlist,
        ivfpq_save,
        pq_codebook_trained,
    )

    st = cell_staleness(spark, path)
    tripped = (
        force
        or st["tv_drift"] > tv_threshold
        or st["growth"] > growth_threshold
    )
    if not tripped:
        return {"action": "none", **st}
    # Branch-dependent pieces only: corpus source, model-source prefix,
    # save fan-out, and the catalog paths to refresh. The rebuild
    # pipeline itself (dedup -> lineage cut -> retrain -> pin models ->
    # save -> refresh) is ONE sequence — its ordering rationale (cut
    # before overwrite; materialize KB models so the save's eager
    # collects don't re-run k-means, and the codebook-reuse branch
    # doesn't re-read a dir the save overwrites) applies identically
    # sharded and not. A sharded layout (VERDICT r6 item 2) retrains
    # ONE coarse model + ONE codebook on the union of shard rerank
    # tables: identical models across shards are the premise of the
    # router's bit-identical global-shortlist merge.
    smeta = _shards_meta(path)
    subs = ("cells", "vectors", "centroids", "codebook",
            "build_stats", "store_meta")
    if smeta is not None:
        from vector_search_go_spark.serve.sharded import union_shard_component

        n = int(smeta["n_shards"])
        model_src = f"{path}/shard=0"
        vectors = union_shard_component(spark, path, n, "vectors").select(
            "id", "vec"
        )
        save_kwargs = {"shards": n}
        refresh = [f"{path}/shard={j}/{sub}" for j in range(n) for sub in subs]
    else:
        model_src = path
        from vector_search_go_spark.streaming.delete import mask_tombstones

        vectors = mask_tombstones(
            spark, path, spark.read.parquet(f"{path}/vectors")
        ).select("id", "vec")
        save_kwargs = {}
        refresh = [f"{path}/{sub}" for sub in subs]
    k = spark.read.parquet(f"{model_src}/centroids").count()
    # the rebuild preserves the store's encoding (pq.store_encoding —
    # shard=0 / own store_meta; pre-tag stores rebuild as raw): a
    # residual store's codebook retrains on residuals wrt the NEW
    # coarse centroids, and re-encoding goes through the matching
    # kernel inside ivfpq_save
    from vector_search_go_spark.operators.pq import store_encoding

    encoding = store_encoding(spark, path)
    if dedup_ids:
        vectors = vectors.dropDuplicates(["id"])
    dim = len(vectors.select("vec").first()["vec"])
    vectors = vectors.localCheckpoint(eager=True)
    cents = kmeans_fit(vectors, k, iters=kmeans_iters, dim=dim, spread_init=True)
    cents = spark.createDataFrame(cents.collect(), cents.schema)
    if retrain_codebook:
        if encoding == "residual":
            from vector_search_go_spark.operators.pq import (
                pq_codebook_residual,
            )

            codebook = pq_codebook_residual(vectors, cents, iters=kmeans_iters)
        else:
            codebook = pq_codebook_trained(vectors, iters=kmeans_iters)
    else:
        # reusing a saved codebook under NEW centroids is only sound
        # when codeword drift is known negligible (docstring); for a
        # residual store the old codebook still quantizes residual
        # space, so the composition stays valid, just less tuned
        codebook = spark.read.parquet(f"{model_src}/codebook")
    codebook = spark.createDataFrame(codebook.collect(), codebook.schema)
    ivfpq_save(
        spark, vectors, cents, codebook, path, metric="l2",
        encoding=encoding, **save_kwargs,
    )
    for p in refresh:
        spark.catalog.refreshByPath(p)
    report = {"action": "rebuilt", **st}
    if retune_shortlist:
        probe = adc_shortlist_probe(spark, path)
        # merge into the existing meta instead of rewriting it from
        # hardcoded keys (ADVICE r6): a save-time meta that grows fields
        # must survive a retune. The sharded ROOT has no save-time meta
        # (shards_meta is the manifest), so the merge starts from the
        # family/metric pair there too — the router's shortlist=None
        # resolution reads this layout-level file.
        from vector_search_go_spark.operators.pq import read_store_meta_any

        meta = {"family": "ivfpq", "metric": "l2"}
        # merge for every path scheme (ADVICE r9: local-only merging
        # made a remote retune drop save-time meta keys)
        meta.update(read_store_meta_any(spark, path))
        meta["recommended_shortlist"] = probe["recommended_shortlist"]
        meta["shortlist_frac"] = probe["shortlist_frac"]
        spark.createDataFrame(
            [(_json.dumps(meta),)], "meta_json string"
        ).coalesce(1).write.mode("overwrite").json(f"{path}/store_meta")
        spark.catalog.refreshByPath(f"{path}/store_meta")
        # remote paths have no cheap freshness key — drop the memo entry
        # so the next shortlist=None lookup re-reads the new meta
        invalidate_stored_shortlist(path)
        report["recommended_shortlist"] = probe["recommended_shortlist"]
        report["shortlist_frac"] = probe["shortlist_frac"]
    return report


def bucket_staleness(spark: SparkSession, path: str) -> dict:
    """Compare a saved index's CURRENT bucket-mass distribution (after
    any streaming appends into ``{path}/buckets``) against the
    build-time baseline persisted by ``LshIndex.save``.

    Returns ``{"n_build", "n_now", "tv_drift", "growth",
    "new_bucket_mass"}``:
      tv_drift        total variation distance (0 = identical shape,
                      1 = disjoint) between normalized bucket masses;
      growth          n_now / n_build - 1;
      new_bucket_mass share of current mass in buckets absent at build
                      (a frozen forest maps drifted data into FEW such
                      buckets, so this climbs with tv_drift under real
                      drift but stays near growth/(1+growth) under
                      in-distribution growth spread over all buckets).

    A sharded layout (shards_meta present) measures the WHOLE store:
    per-shard masses union into the global distribution."""
    smeta = _shards_meta(path)
    if smeta is not None:
        if smeta["family"] != "lsh":
            raise ValueError(
                f"sharded layout at {path!r} holds family "
                f"{smeta['family']!r}, not lsh"
            )
        return _sharded_staleness(
            spark, path, smeta["n_shards"], "buckets", ["tree", "hash"]
        )
    build = _read_build_stats(spark, path, "LshIndex.save").withColumnRenamed(
        "sz", "sz_build"
    )
    from vector_search_go_spark.streaming.delete import mask_tombstones

    now = (
        mask_tombstones(spark, path, spark.read.parquet(f"{path}/buckets"))
        .groupBy("tree", "hash")
        .agg(F.count(F.lit(1)).alias("sz_now"))
    )
    return _mass_staleness(now, build, ["tree", "hash"], path)


def _mass_staleness(now, build, keys: list[str], path: str) -> dict:
    """Shared staleness math: TV distance + growth + new-key mass
    between a current keyed-mass distribution and its build-time
    baseline (both (keys..., sz) shaped)."""
    j = (
        now.join(build, on=keys, how="full_outer")
        .na.fill(0, ["sz_now", "sz_build"])
        .cache()
    )
    tot = j.agg(
        F.sum("sz_now").alias("tn"), F.sum("sz_build").alias("tb")
    ).collect()[0]
    tn, tb = int(tot["tn"] or 0), int(tot["tb"] or 0)
    if tn == 0 or tb == 0:
        j.unpersist()
        raise ValueError(f"empty bucket store or baseline under {path}")
    agg = j.agg(
        F.sum(
            F.abs(F.col("sz_now") / F.lit(tn) - F.col("sz_build") / F.lit(tb))
        ).alias("l1"),
        F.sum(
            F.when(F.col("sz_build") == 0, F.col("sz_now")).otherwise(F.lit(0))
        ).alias("new_mass"),
    ).collect()[0]
    j.unpersist()
    return {
        "n_build": tb,
        "n_now": tn,
        "tv_drift": 0.5 * float(agg["l1"]),
        "growth": tn / tb - 1.0,
        "new_bucket_mass": int(agg["new_mass"] or 0) / tn,
    }


def maintain(
    spark: SparkSession,
    path: str,
    tv_threshold: float = 0.25,
    growth_threshold: float = 0.5,
    dedup_ids: bool = True,
    force: bool = False,
) -> dict:
    """Measure staleness; when tripped (tv_drift or growth past its
    threshold, or ``force``), run the reference's clear-and-rebuild
    (Train, lsh/lsh.go:107-110) on the CURRENT vectors table: retrain
    the forest with the store's own persisted config, rewrite
    buckets/model/vectors/build_stats in place, refresh the catalog
    (a swapped store otherwise serves stale file listings to live
    sessions). Returns ``{"action": "none" | "rebuilt", **staleness}``.

    ``dedup_ids`` drops replayed duplicate vector rows before
    retraining (streaming vector appends are at-least-once, matching
    the bucket-side contract in streaming/ingest.py).

    A SHARDED layout (shards_meta, VERDICT r6 item 2) rebuilds the
    whole store as one model: staleness is measured on the union,
    ONE forest retrains on the union of shard vector tables (per-shard
    forests would break the global-keep_mod survivor parity the router
    depends on), and save(shards=N) rewrites every shard plus the
    global hot_buckets table."""
    from vector_search_go_spark.lsh.index import LshIndex

    st = bucket_staleness(spark, path)
    tripped = (
        force
        or st["tv_drift"] > tv_threshold
        or st["growth"] > growth_threshold
    )
    if not tripped:
        return {"action": "none", **st}
    smeta = _shards_meta(path)
    subs = ("buckets", "vectors", "build_stats", "model_config", "model_nodes")
    if smeta is not None:
        from vector_search_go_spark.serve.sharded import union_shard_component

        n = int(smeta["n_shards"])
        config = LshIndex.load_forest(spark, f"{path}/shard=0").config
        vectors = union_shard_component(spark, path, n, "vectors")
        save_kwargs = {"shards": n}
        refresh = [
            f"{path}/shard={k}/{sub}" for k in range(n) for sub in subs
        ] + [f"{path}/hot_buckets"]
    else:
        config = LshIndex.load_forest(spark, path).config
        from vector_search_go_spark.streaming.delete import mask_tombstones

        vectors = mask_tombstones(spark, path, spark.read.parquet(f"{path}/vectors"))
        save_kwargs = {}
        refresh = [f"{path}/{sub}" for sub in subs]
    if dedup_ids:
        vectors = vectors.dropDuplicates(["id"])
    # cut lineage before overwriting the directory the plan reads from
    # (Spark refuses to overwrite a path it is reading; the vector
    # table is the SMALL store component — buckets are n_trees x
    # larger — so the checkpoint is bounded)
    vectors = vectors.localCheckpoint(eager=True)
    idx = LshIndex.train(spark, vectors, config)
    idx.save(path, **save_kwargs)
    for p in refresh:
        spark.catalog.refreshByPath(p)
    return {"action": "rebuilt", **st}


def cell_staleness(spark: SparkSession, path: str) -> dict:
    """IVF twin of ``bucket_staleness``: compare the saved store's
    CURRENT cell-mass distribution (after streaming appends into
    ``{path}/cells`` by ingest_to_ivf_store — frozen-centroid
    assignment, streaming/ingest.py) against the build-time baseline
    persisted by ``ann_ivf.ivf_save``. A drifted stream lands its mass
    in the few cells whose frozen centroids happen to be nearest, so
    nprobe-bounded search starts missing true neighbors while cell
    scans get slower — the same silent decay as the LSH forest, with
    the same remedy (retrain on current data). A sharded layout
    measures the whole store (per-shard masses union)."""
    smeta = _shards_meta(path)
    if smeta is not None:
        if smeta["family"] not in ("ivf", "ivfpq"):
            raise ValueError(
                f"sharded layout at {path!r} holds family "
                f"{smeta['family']!r}, not ivf/ivfpq"
            )
        return _sharded_staleness(
            spark, path, smeta["n_shards"], "cells", ["cell"]
        )
    build = _read_build_stats(spark, path, "ivf_save / ivfpq_save").withColumnRenamed(
        "sz", "sz_build"
    )
    from vector_search_go_spark.streaming.delete import mask_tombstones

    now = (
        mask_tombstones(spark, path, spark.read.parquet(f"{path}/cells"))
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("sz_now"))
    )
    return _mass_staleness(now, build, ["cell"], path)


def maintain_ivf(
    spark: SparkSession,
    path: str,
    metric: str | None = None,
    tv_threshold: float = 0.25,
    growth_threshold: float = 0.5,
    kmeans_iters: int = 3,
    dedup_ids: bool = True,
    force: bool = False,
) -> dict:
    """IVF twin of ``maintain``: measure cell staleness; when tripped,
    retrain the coarse quantizer (operators.kmeans.kmeans_fit, same k
    as the saved model) on the CURRENT store vectors and rewrite the
    store in place (ann_ivf.ivf_save), refreshing the catalog. The
    reference's clear-and-rebuild Train semantics (lsh/lsh.go:107-110)
    applied to the centroid model instead of the plane forest.

    ``metric=None`` (default) reuses the assignment metric the store
    was saved under (``{path}/store_meta``, written by ivf_save) — a
    rebuild under a different metric than searches use silently
    reassigns every cell and corrupts recall, so for legacy stores
    without persisted metadata the metric must be passed explicitly
    (and an explicit metric contradicting a present store_meta is
    refused, mirroring engine.load's mismatch guard). Metric
    resolution only happens on the rebuild path: pure staleness
    monitoring of a legacy store still returns ``action='none'``."""
    from vector_search_go_spark.operators.ann_ivf import ivf_save
    from vector_search_go_spark.operators.kmeans import kmeans_fit

    st = cell_staleness(spark, path)
    tripped = (
        force
        or st["tv_drift"] > tv_threshold
        or st["growth"] > growth_threshold
    )
    if not tripped:
        return {"action": "none", **st}
    # Branch-dependent pieces only (the maintain_ivfpq pattern): metric
    # authority, corpus source, save fan-out, refresh paths. A sharded
    # layout retrains ONE coarse model on the union of shard cell
    # tables — per-shard models would make shards probe different cells
    # and break the router's exact-merge argument.
    smeta = _shards_meta(path)
    subs = ("cells", "centroids", "build_stats", "store_meta")
    if smeta is not None:
        from vector_search_go_spark.serve.sharded import union_shard_component

        saved = smeta.get("metric")
        n = int(smeta["n_shards"])
        model_src = f"{path}/shard=0"
        vectors = union_shard_component(spark, path, n, "cells").select(
            "id", "vec"
        )
        save_kwargs = {"shards": n}
        refresh = [f"{path}/shard={j}/{sub}" for j in range(n) for sub in subs]
        where = f"sharded layout at {path!r} (shards_meta)"
    else:
        saved = store_metric(spark, path)
        model_src = path
        from vector_search_go_spark.streaming.delete import mask_tombstones

        vectors = mask_tombstones(
            spark, path, spark.read.parquet(f"{path}/cells")
        ).select("id", "vec")
        save_kwargs = {}
        refresh = [f"{path}/{sub}" for sub in subs]
        where = f"store at {path!r}"
    if metric is None:
        if saved is None:
            raise ValueError(
                f"{where} predates metric persistence: pass metric= "
                "explicitly — it must match the metric searches run "
                "with, or the rebuilt cell assignment silently degrades "
                "recall"
            )
        metric = saved
    elif saved is not None and saved != metric:
        raise ValueError(
            f"{where} was saved with metric={saved!r}; rebuilding under "
            f"metric={metric!r} would reassign every cell and silently "
            f"degrade recall for searches still using {saved!r} — "
            "re-save the store (ivf_save) to change metrics"
        )
    k = spark.read.parquet(f"{model_src}/centroids").count()
    if dedup_ids:
        vectors = vectors.dropDuplicates(["id"])
    dim = len(vectors.select("vec").first()["vec"])
    # cut lineage before overwriting the directory the plan reads from
    vectors = vectors.localCheckpoint(eager=True)
    # spread init: streamed appends carry ids AFTER the build corpus,
    # so first-k-by-id seeds would all land in the stale region and the
    # retrain could not rebalance (operators.kmeans.kmeans_init)
    cents = kmeans_fit(vectors, k, iters=kmeans_iters, dim=dim, spread_init=True)
    ivf_save(spark, vectors, cents, path, metric=metric, **save_kwargs)
    for p in refresh:
        spark.catalog.refreshByPath(p)
    return {"action": "rebuilt", **st}
