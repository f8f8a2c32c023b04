"""Bloom-filter join pruning, built from native Catalyst expressions.

Shape for big probe / medium build joins: when the build side is too
large to broadcast as a hash table but its KEY SET compresses into a
few-KB..MB bitmap, shipping a Bloom filter of the build keys to the
probe scan removes most non-matching rows BEFORE the join shuffle —
the shuffle then carries only (true matches + fpp false positives).
Pruning is conservative (no false negatives), so the exact join that
follows returns exactly the un-pruned result; correctness is therefore
oracle-checkable with the plain join SQL.

Everything stays JVM-side: bit positions are `xxhash64(key, seed_i)
pmod m`; the build aggregates `bit_or` of single-bit masks per 64-bit
word; the probe tests k bits against the word array bound once as a
literal column. No Python UDFs, no driver loops beyond collecting the
m/64-word bitmap.

Spark itself injects a runtime bloom filter under AQE
(spark.sql.optimizer.runtime.bloomFilter.enabled) when statistics
justify it; this operator is the explicit/deterministic version for
when the planner lacks stats (e.g. freshly-derived build sides) — and
its bitmap can also be persisted and reused across queries, which the
runtime filter cannot.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _plan_params(expected_items: int, fpp: float) -> tuple[int, int]:
    """Standard Bloom sizing: m = -n ln p / (ln 2)^2 bits (rounded up
    to a whole number of 64-bit words), k = (m/n) ln 2 hashes."""
    m = max(64, int(-expected_items * math.log(fpp) / (math.log(2) ** 2)))
    m = ((m + 63) // 64) * 64
    k = max(1, round((m / expected_items) * math.log(2)))
    return m, k


def _positions(key: Column, m: int, k: int) -> list[Column]:
    return [F.pmod(F.xxhash64(key, F.lit(i)), F.lit(m)) for i in range(k)]


def build_bloom(build: DataFrame, key: str, expected_items: int, fpp: float = 0.01):
    """Aggregate the build side's key set into a bitmap: list of m/64
    signed 64-bit words (python ints), plus (m, k). One narrow explode
    (x k) + one bit_or aggregation; the collected bitmap is the only
    driver-side data and is m/64 longs regardless of build row count."""
    m, k = _plan_params(expected_items, fpp)
    pos = F.explode(F.array(*_positions(F.col(key), m, k))).alias("_pos")
    words = (
        build.select(pos)
        .select(
            (F.col("_pos") / 64).cast("int").alias("_word"),
            F.expr("shiftleft(1L, cast(_pos % 64 as int))").alias("_mask"),
        )
        .groupBy("_word")
        .agg(F.bit_or("_mask").alias("_bits"))
        .collect()
    )
    bitmap = [0] * (m // 64)
    for r in words:
        bitmap[r["_word"]] = r["_bits"]
    return bitmap, m, k


def bloom_prune(probe: DataFrame, key: str, bitmap: list[int], m: int, k: int) -> DataFrame:
    """Keep probe rows whose key MIGHT be in the build key set (plus
    ~fpp false positives — follow with the exact join). The bitmap is
    bound as ONE array literal (`F.lit(list)` -> a single ArrayData
    value, no per-element codegen). Never ship it as a joined column:
    a cross-joined array column is copied into every probe row's
    UnsafeRow (~8 bytes x words x rows of memcpy) — measured 21.6s vs
    4.5s for the literal on the sf0.1 probe (600k rows, 4.5k words).
    `key` must be a plain column name (the bit tests are SQL text — the
    Python shiftleft wrapper only takes literal shift amounts).

    The k positions are materialized once into an array and tested with
    `forall`, so each row pays k xxhash64 evaluations — not 2k as with
    a per-test `pmod(xxhash64(...))` recomputed for word and bit."""
    probed = probe.withColumn("_bf", F.lit(bitmap))
    positions = ", ".join(f"pmod(xxhash64({key}, {i}), {m})" for i in range(k))
    test = (
        f"forall(array({positions}), _p -> "
        f"(element_at(_bf, cast(_p div 64 as int) + 1)"
        f" & shiftleft(1L, cast(_p % 64 as int))) != 0)"
    )
    return probed.filter(F.expr(test)).drop("_bf")


# Below this probe size the bloom is a guaranteed pessimization on a
# healthy cluster-local shuffle and the guard routes to the plain semi
# join. Measured (local[32], 128 GiB): probe 600k -> plain 1.2s vs
# bloom 4.5s; probe 5M/build 500k -> 2.7s vs 49s; probe 20M/build 2M ->
# 4.5s vs 244s. Expression-level bloom pruning only pays when the probe
# shuffle is NETWORK/disk-bound (multi-node, TB-scale spill), which
# in-memory local shuffles never are — so the default threshold is
# cluster-scale on purpose. Spark's AQE runtime bloom filter
# (spark.sql.optimizer.runtime.bloomFilter.enabled, JVM-native
# BloomFilterAggregate) is the automatic production path; this operator
# is the deterministic/persistable variant for planner-blind build
# sides, and its guard makes it self-disabling where it cannot win.
BLOOM_MIN_PROBE_ROWS = 50_000_000


def bloom_semi_join(
    probe: DataFrame,
    build: DataFrame,
    key: str,
    expected_items: int,
    fpp: float = 0.01,
    probe_rows: int | None = None,
    min_probe_rows: int = BLOOM_MIN_PROBE_ROWS,
) -> DataFrame:
    """probe LEFT SEMI JOIN build on `key`, with the probe side
    bloom-pruned before the shuffle WHEN the probe is large enough for
    pruning to pay (see BLOOM_MIN_PROBE_ROWS). Result is exactly the
    plain semi join either way (the filter only drops rows the join
    would drop), so callers' oracles never depend on the route taken.

    ``probe_rows`` is a cheap caller-supplied estimate (parquet footer
    count); when absent the bloom route is taken on request, preserving
    the explicit-opt-in behavior."""
    if probe_rows is not None and probe_rows < min_probe_rows:
        return probe.join(build.select(key).distinct(), on=key, how="left_semi")
    bitmap, m, k = build_bloom(build, key, expected_items, fpp)
    pruned = bloom_prune(probe, key, bitmap, m, k)
    return pruned.join(build.select(key).distinct(), on=key, how="left_semi")
