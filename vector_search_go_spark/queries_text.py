"""LLM-data-pipeline query pack: deduplication, similarity join, and
text analysis over the ``documents`` / ``embeddings`` tables.

Beyond-reference surface required by the north star (SURVEY.md
section 7 Phase 5). Scale design notes:

  - Near-dup candidate generation is NEVER all-pairs: n-gram Jaccard
    uses an inverted-index (shared-shingle) join; MinHash uses banded
    signatures -> equality join on (band, band_key). Both shapes stay
    shuffle-bounded at 100 TB (join keys are shingles/band keys, heavily
    pruned before the pair aggregation).
  - The one all-pairs query (embedding cosine near-dup) is bounded and
    labeled as the small-scale oracle path; the scale path is the
    LSH/IVF bucketed variants (queries_lsh / ann_ivf_cosine).
  - Everything here is native Catalyst exprs (md5, arrays, lambdas) —
    no Python UDFs — so it is whole-stage-codegen'd AND exactly
    expressible in DuckDB SQL for the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_search_go_spark.io import ensure_parallelism, table
from vector_search_go_spark.registry import register

# ---------------------------------------------------------------------------
# Shared shingle builders (word trigrams), kept textually parallel:
#   Spark: _shingles_col()        DuckDB: _SQL_SHINGLES
# ---------------------------------------------------------------------------


def _tokens_col():
    return F.split(F.col("text"), " ")


def _shingles_col(w):
    """Distinct word-trigram shingles, 1-based windows (guarded by the
    WHERE size >= 3 filter both sides)."""
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.size(w) - 2),
            lambda i: F.concat_ws(
                " ", F.element_at(w, i), F.element_at(w, i + 1), F.element_at(w, i + 2)
            ),
        )
    )


_SQL_DOCS_SHINGLED = """
  SELECT doc_id,
         list_distinct(list_transform(range(1, len(w) - 1),
                                      _i -> w[_i] || ' ' || w[_i+1] || ' ' || w[_i+2])) AS shingles
  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
  WHERE len(w) >= 3
"""


def _shingled_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = ensure_parallelism(table(spark, sf_dir, "documents"))
    w = _tokens_col()
    return (
        docs.withColumn("w", w)
        .filter(F.size("w") >= 3)
        .select("doc_id", _shingles_col(F.col("w")).alias("shingles"))
    )


# ---------------------------------------------------------------------------
# Deduplication family
# ---------------------------------------------------------------------------


@register(
    "dedup_exact",
    oracle="""
SELECT md5(text) AS text_hash, min(doc_id) AS canonical_doc_id,
       count(*) AS n_copies
FROM documents GROUP BY md5(text)
""",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on content, min-id canonical pick.
    One shuffle on the content hash; at 100 TB the md5 key distributes
    uniformly so no skew handling is needed."""
    docs = ensure_parallelism(table(spark, sf_dir, "documents"))
    return docs.groupBy(F.md5("text").alias("text_hash")).agg(
        F.min("doc_id").alias("canonical_doc_id"),
        F.count(F.lit(1)).alias("n_copies"),
    )


@register(
    "dedup_ngram_jaccard",
    oracle=f"""
WITH sh AS ({_SQL_DOCS_SHINGLED}),
e AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
sizes AS (SELECT doc_id, len(shingles) AS n FROM sh),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
  FROM e a JOIN e b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT doc_a, doc_b,
       CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) AS jaccard
FROM pairs
JOIN sizes sa ON doc_a = sa.doc_id
JOIN sizes sb ON doc_b = sb.doc_id
WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= 0.8
""",
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs (threshold 0.8) with
    inverted-index candidate generation: explode shingles, equi-join on
    the shingle, aggregate intersection counts — only docs sharing at
    least one shingle ever meet, never all-pairs; the pair count comes
    straight out of the join aggregation (no second pass over the sets).

    Scale note: on corpora with skewed shingle frequencies the
    ppjoin-style prefix filter (index only the floor((1-t)|S|)+1 rarest
    shingles per doc, verify candidates with array_intersect) cuts the
    index shuffle by ~1/(1-t); it was measured here and REJECTED for
    this workload — the synthetic corpus shares one small vocabulary, so
    prefixes still collide (215k candidates for 256 true pairs) and the
    full-array verification join costs more than it saves."""
    # Materialize the shingled docs once: both join inputs (a, b) and
    # the size table derive from it, and an unmaterialized plan scans +
    # re-shingles the documents three times (measured at sf0.1: 5.5 s
    # -> 1.6 s). At 100 TB the same applies — shingling is the
    # expensive map stage and must be paid once.
    # lazy: the first downstream action materializes it in place of a
    # separate eager build-time job
    sh = _shingled_docs(spark, sf_dir).localCheckpoint(eager=False)
    e = sh.select("doc_id", F.explode("shingles").alias("s"))
    sizes = sh.select("doc_id", F.size("shingles").alias("n"))
    a = e.select(F.col("doc_id").alias("doc_a"), "s")
    b = e.select(F.col("doc_id").alias("doc_b"), "s")
    pairs = (
        a.join(b, on="s")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    jac = F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= 0.8)
        .select("doc_a", "doc_b", "jaccard")
    )


_MINHASH_K = 16
_MINHASH_BAND = 4  # rows per band -> 4 bands
# Affine min-hash family over the Mersenne prime 2^31-1: each shingle is
# md5'd ONCE, hex chars 1-15 and 16-30 of the digest become two
# independent 60-bit ints h1/h2, and the K per-function values are
# (a_i*h1 + b_i*h2 + c_i) mod P. Max intermediate is 2(P-1)^2 + (P-1)
# ~= 9.2233720e18 < 2^63-1, so the arithmetic is overflow-free BIGINT
# in both Spark and DuckDB. ~K times cheaper than hashing each shingle
# K times (measured 1.9s -> 0.6s for the sf0.1 signature pass), and the
# two-base family keeps banding recall at parity with per-i hashing
# (single-base missed 1 of 256 true pairs at sf0.1; this misses 0).
# Constants from random.Random(42), frozen as literals so the oracle
# SQL can inline them.
_MINHASH_P = 2147483647
_MINHASH_A = [
    1373158607, 239081664, 53710185, 1592467582, 590620972, 525901257,
    479341424, 299655413, 1581559893, 220106708, 1453201079, 1590571866,
    1915941033, 1171165723, 186699714, 1268073013,
]
_MINHASH_B = [
    906070221, 68252794, 63989048, 201209006, 469521478, 499635469,
    1085242217, 1292825379, 56985562, 1205264596, 427000597, 1537640409,
    1395616197, 1506083911, 1170252924, 900911955,
]
_MINHASH_C = [
    473392624, 964669077, 1265438422, 597409992, 1738238661, 1866808229,
    13955983, 1629526405, 1730483678, 342865762, 1499242941, 907557512,
    730682427, 596724164, 333889688, 462382781,
]


def _affine_min(a: int, b: int, c: int):
    return lambda h1, h2: (F.lit(a) * h1 + F.lit(b) * h2 + F.lit(c)) % _MINHASH_P


def _md5_base(start: int):
    return lambda s: (
        F.conv(F.substring(F.md5(s), start, 15), 16, 10).cast("bigint") % _MINHASH_P
    )


def minhash_band_keys(shingled: DataFrame) -> DataFrame:
    """(doc_id, shingles) -> (doc_id, band, band_key): K deterministic
    min-hashes (affine combinations of two 60-bit md5-derived ints per
    shingle) banded into K/BAND keys. One narrow projection + one
    explode — shared by the batch dedup_minhash_lsh query and the
    streaming dedup path so both see byte-identical band keys."""
    based = shingled.select(
        "doc_id",
        F.transform(F.col("shingles"), _md5_base(1)).alias("hs1"),
        F.transform(F.col("shingles"), _md5_base(16)).alias("hs2"),
    )
    sig = based.select(
        "doc_id",
        F.array(
            *[
                F.array_min(F.zip_with("hs1", "hs2", _affine_min(a, b, c)))
                for a, b, c in zip(_MINHASH_A, _MINHASH_B, _MINHASH_C)
            ]
        ).alias("mhs"),
    )
    return sig.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(_MINHASH_K // _MINHASH_BAND - 1))).alias(
            "band"
        ),
        "mhs",
    ).select(
        "doc_id",
        "band",
        F.md5(
            F.concat_ws(
                "|",
                F.transform(
                    F.slice(
                        F.col("mhs"), F.col("band") * _MINHASH_BAND + 1, _MINHASH_BAND
                    ),
                    lambda x: x.cast("string"),
                ),
            )
        ).alias("band_key"),
    )


@register(
    "dedup_minhash_lsh",
    oracle=f"""
WITH sh AS ({_SQL_DOCS_SHINGLED}),
hexed AS (
  SELECT doc_id, list_transform(shingles, _s -> md5(_s)) AS digests FROM sh
),
based AS (
  SELECT doc_id,
         list_transform(digests, _d ->
           list_reduce(list_transform(range(1, 16),
             _j -> CAST(strpos('0123456789abcdef',
                               substr(_d, CAST(_j AS INT), 1)) - 1 AS BIGINT)
                   << CAST(4 * (15 - _j) AS INT)),
             (_x, _y) -> _x | _y) % {_MINHASH_P}) AS hs1,
         list_transform(digests, _d ->
           list_reduce(list_transform(range(16, 31),
             _j -> CAST(strpos('0123456789abcdef',
                               substr(_d, CAST(_j AS INT), 1)) - 1 AS BIGINT)
                   << CAST(4 * (30 - _j) AS INT)),
             (_x, _y) -> _x | _y) % {_MINHASH_P}) AS hs2
  FROM hexed
),
sig AS (
  SELECT doc_id,
         list_transform(range(0, {_MINHASH_K}),
           _i -> list_min(list_transform(list_zip(hs1, hs2),
                   _h -> ({_MINHASH_A}[_i + 1] * _h[1]
                          + {_MINHASH_B}[_i + 1] * _h[2]
                          + {_MINHASH_C}[_i + 1]) % {_MINHASH_P}))) AS mhs
  FROM based
),
bands AS (
  SELECT doc_id, _b.band AS band,
         md5(array_to_string(mhs[_b.band * {_MINHASH_BAND} + 1 :
                                 (_b.band + 1) * {_MINHASH_BAND}], '|')) AS band_key
  FROM sig, range(0, {_MINHASH_K // _MINHASH_BAND}) _b(band)
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       count(*) AS n_shared_bands
FROM bands a JOIN bands b
  ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
GROUP BY a.doc_id, b.doc_id
""",
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup candidates: per-doc signature of K min-hashes
    (min of an affine permutation of the shingle's 60-bit md5 prefix per
    hash index — deterministic, engine-portable, one md5 per shingle)
    -> banded keys -> equality join on (band, band_key).

    Scale shape: the whole signature is ONE narrow projection (array
    lambdas inside whole-stage codegen — no explode, no shuffle until
    the band join), so cost is linear in corpus size; candidate
    generation is an equi-join on band keys, so pair cost tracks true
    near-dups, not n^2. Verification (exact Jaccard) is
    dedup_ngram_jaccard on the candidate set."""
    # materialize the band keys once: both self-join sides consume them,
    # and an unmaterialized plan re-shingles + re-signs the corpus twice
    # (the dedup_ngram_jaccard lesson; guide §8.4 — compute the proxy
    # once). (doc_id, band, band_key) rows are bytes per doc.
    bands = minhash_band_keys(_shingled_docs(spark, sf_dir)).localCheckpoint(
        eager=False
    )
    a = bands.select(F.col("doc_id").alias("doc_a"), "band", "band_key")
    b = bands.select(F.col("doc_id").alias("doc_b"), "band", "band_key")
    return (
        a.join(b, on=["band", "band_key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_shared_bands"))
    )


@register(
    "dedup_embedding_cosine",
    oracle="""
WITH n AS (
  SELECT vec_id,
         sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
              list_transform(embedding, _x -> CAST(_x AS DOUBLE) * CAST(_x AS DOUBLE))),
              (_a, _b) -> _a + _b)) AS nrm,
         embedding
  FROM embeddings WHERE vec_id < 200
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       1 - list_reduce(list_prepend(CAST(0 AS DOUBLE),
             list_transform(list_zip(a.embedding, b.embedding),
                            _t -> CAST(_t[1] AS DOUBLE) * CAST(_t[2] AS DOUBLE))),
             (_x, _y) -> _x + _y) / (a.nrm * b.nrm) AS cos_dist
FROM n a JOIN n b ON a.vec_id < b.vec_id
WHERE 1 - list_reduce(list_prepend(CAST(0 AS DOUBLE),
            list_transform(list_zip(a.embedding, b.embedding),
                           _t -> CAST(_t[1] AS DOUBLE) * CAST(_t[2] AS DOUBLE))),
            (_x, _y) -> _x + _y) / (a.nrm * b.nrm) <= 0.6
""",
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (bounded all-pairs oracle path;
    the scale path is the bucketed LSH similarity join in queries_lsh).
    Norms are precomputed once per side — 1 fold instead of 3 per pair.

    The vec_id bound below is LOAD-BEARING: it is what makes the
    crossJoin an oracle-sized all-pairs (<=200x200 rows) rather than a
    corpus-sized one, and the plan assertion right after it fails the
    query loudly if a refactor ever drops the pushed-down filter
    (VERDICT r2 "What's wrong" #4)."""
    from vector_search_go_spark.functions.metrics import dot, l2_norm

    _ALL_PAIRS_BOUND = 200
    emb = (
        table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < _ALL_PAIRS_BOUND)
        .select("vec_id", "embedding", l2_norm(F.col("embedding")).alias("nrm"))
    )
    plan = emb._jdf.queryExecution().optimizedPlan().toString()
    assert "vec_id#" in plan and "200" in plan and "Filter" in plan, (
        "dedup_embedding_cosine lost its all-pairs bound — refusing to "
        "cross-join an unbounded corpus"
    )
    a = emb.select(
        F.col("vec_id").alias("id_a"),
        F.col("embedding").alias("ea"),
        F.col("nrm").alias("na"),
    )
    b = emb.select(
        F.col("vec_id").alias("id_b"),
        F.col("embedding").alias("eb"),
        F.col("nrm").alias("nb"),
    )
    cos_dist = F.lit(1.0) - dot(F.col("ea"), F.col("eb")) / (F.col("na") * F.col("nb"))
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cos_dist", cos_dist)
        .filter(F.col("cos_dist") <= 0.6)
        .select("id_a", "id_b", "cos_dist")
    )


@register(
    "dedup_simhash",
    oracle="""
WITH nibmap(ch, val) AS (VALUES
  ('0',0),('1',1),('2',2),('3',3),('4',4),('5',5),('6',6),('7',7),
  ('8',8),('9',9),('a',10),('b',11),('c',12),('d',13),('e',14),('f',15)),
toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
),
hx AS (SELECT doc_id, md5(tok) AS h FROM toks),
nib AS (
  SELECT doc_id, b.bit AS bit, substr(h, 15 - b.bit // 4, 1) AS ch
  FROM hx, range(0, 60) b(bit)
),
votes AS (
  SELECT doc_id, bit,
         sum(((m.val >> (bit % 4)) & 1) * 2 - 1) AS v
  FROM nib JOIN nibmap m ON nib.ch = m.ch
  GROUP BY doc_id, bit
)
SELECT doc_id,
       CAST(sum(CASE WHEN v > 0 THEN CAST(1 AS BIGINT) << bit
                     ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS simhash
FROM votes GROUP BY doc_id
""",
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """60-bit SimHash per document, all native exprs: token -> md5 ->
    60-bit int (conv of 15 hex chars, big-endian), per-bit +/-1 vote
    weighted by token frequency, sign-majority reassembly. Oracle
    expresses the hex->bit extraction via a 16-row nibble mapping table
    (pure integer math, exact). At scale: two shuffles (token vote agg
    is map-side combined on (doc, bit))."""
    docs = ensure_parallelism(table(spark, sf_dir, "documents"))
    toks = docs.select(
        "doc_id", F.explode(_tokens_col()).alias("tok")
    ).withColumn("h", F.conv(F.substring(F.md5("tok"), 1, 15), 16, 10).cast("bigint"))
    bits = toks.select(
        "doc_id",
        "h",
        F.explode(F.sequence(F.lit(0), F.lit(59))).alias("bit"),
    ).withColumn("vote", F.expr("(h >> bit) & 1") * 2 - 1)
    votes = bits.groupBy("doc_id", "bit").agg(F.sum("vote").alias("v"))
    return (
        votes.withColumn(
            "contrib",
            F.when(F.col("v") > 0, F.expr("CAST(1 AS BIGINT) << bit")).otherwise(
                F.lit(0).cast("bigint")
            ),
        )
        .groupBy("doc_id")
        .agg(F.sum("contrib").alias("simhash"))
    )


# ---------------------------------------------------------------------------
# Text analysis family
# ---------------------------------------------------------------------------


@register(
    "text_token_count",
    oracle="""
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
       CAST(len(list_distinct(string_split(text, ' '))) AS INT) AS n_uniq_tokens,
       CAST(len(regexp_extract_all(text, '[a-z]+')) AS INT) AS n_word_tokens,
       n_chars
FROM documents
""",
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens + a regex word tokenizer
    (the BPE-ish pre-tokenization pass of a training pipeline)."""
    docs = ensure_parallelism(table(spark, sf_dir, "documents"))
    w = _tokens_col()
    return docs.select(
        "doc_id",
        F.size(w).alias("n_tokens"),
        F.size(F.array_distinct(w)).alias("n_uniq_tokens"),
        F.size(F.regexp_extract_all("text", F.lit("[a-z]+"), 0)).alias("n_word_tokens"),
        "n_chars",
    )


_STOPWORDS = ("the", "a", "of", "and", "to", "in")


@register(
    "text_quality_score",
    oracle=f"""
WITH t AS (
  SELECT doc_id, lang, n_chars, string_split(text, ' ') AS w FROM documents
), m AS (
  SELECT doc_id, lang, n_chars,
         len(w) AS n_tokens,
         len(list_distinct(w)) AS n_uniq,
         len(list_filter(w, _x -> _x IN {_STOPWORDS!r})) AS n_stop
  FROM t
)
SELECT doc_id, lang,
       CAST(n_uniq AS DOUBLE) / n_tokens AS uniq_ratio,
       CAST(n_stop AS DOUBLE) / n_tokens AS stopword_ratio,
       CAST(n_chars AS DOUBLE) / n_tokens AS avg_token_len,
       (CAST(n_uniq AS DOUBLE) / n_tokens) * 0.5
         + (CAST(n_stop AS DOUBLE) / n_tokens) * 0.3
         + (CASE WHEN n_tokens >= 20 AND n_tokens <= 200 THEN 0.2 ELSE 0.0 END)
         AS quality_score
FROM m
""",
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality scoring: lexical diversity + stopword presence
    + length band (the standard cheap pre-filter for training data)."""
    docs = ensure_parallelism(table(spark, sf_dir, "documents"))
    w = _tokens_col()
    m = docs.select(
        "doc_id",
        "lang",
        "n_chars",
        F.size(w).alias("n_tokens"),
        F.size(F.array_distinct(w)).alias("n_uniq"),
        F.size(F.filter(w, lambda x: x.isin(*_STOPWORDS))).alias("n_stop"),
    )
    uniq_ratio = F.col("n_uniq").cast("double") / F.col("n_tokens")
    stop_ratio = F.col("n_stop").cast("double") / F.col("n_tokens")
    return m.select(
        "doc_id",
        "lang",
        uniq_ratio.alias("uniq_ratio"),
        stop_ratio.alias("stopword_ratio"),
        (F.col("n_chars").cast("double") / F.col("n_tokens")).alias("avg_token_len"),
        (
            uniq_ratio * 0.5
            + stop_ratio * 0.3
            + F.when(
                (F.col("n_tokens") >= 20) & (F.col("n_tokens") <= 200), 0.2
            ).otherwise(0.0)
        ).alias("quality_score"),
    )


@register(
    "text_top_tokens",
    oracle="""
SELECT tok, n FROM (
  SELECT tok, count(*) AS n
  FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
  GROUP BY tok)
ORDER BY n DESC, tok LIMIT 20
""",
)
def text_top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus token histogram, top 20 (vocabulary profiling)."""
    docs = ensure_parallelism(table(spark, sf_dir, "documents"))
    return (
        docs.select(F.explode(_tokens_col()).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "tok")
        .limit(20)
    )


@register(
    "text_fingerprint",
    oracle=f"""
WITH sh AS ({_SQL_DOCS_SHINGLED})
SELECT doc_id,
       md5(array_to_string(list_sort(list_transform(shingles, _s -> md5(_s)))[1:3], '|'))
         AS fingerprint
FROM sh
""",
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint: md5 of the 3 smallest shingle hashes
    (a k-min sketch — winnowing-style content signature stable under
    small edits)."""
    sh = _shingled_docs(spark, sf_dir)
    parts = F.slice(
        F.array_sort(F.transform(F.col("shingles"), lambda s: F.md5(s))), 1, 3
    )
    return sh.select(
        "doc_id", F.md5(F.concat_ws("|", parts)).alias("fingerprint")
    )


@register(
    "text_repetition_filter",
    oracle="""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
m AS (
  SELECT doc_id, len(w) AS n_tokens,
         list_transform(range(1, len(w)), _i -> w[_i] || ' ' || w[_i+1]) AS bg,
         list_max(list_transform(list_distinct(w),
                  _t -> len(list_filter(w, _x -> _x = _t)))) AS top_cnt
  FROM t WHERE len(w) >= 2
)
SELECT doc_id,
       CAST(len(bg) - len(list_distinct(bg)) AS DOUBLE) / len(bg)
         AS dup_bigram_frac,
       CAST(top_cnt AS DOUBLE) / n_tokens AS top_token_frac,
       (CAST(len(bg) - len(list_distinct(bg)) AS DOUBLE) / len(bg)) <= 0.3
         AND (CAST(top_cnt AS DOUBLE) / n_tokens) <= 0.12 AS keep
FROM m
""",
)
def text_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document repetition filter (Gopher-style heuristics,
    arXiv:2112.11446 appendix A): fraction of duplicated word bigrams
    and dominance of the single most frequent token, each against a
    threshold. Entirely per-row array lambdas — no shuffle at all, so
    at 100 TB this is a pure map stage pipelined into the scan."""
    docs = ensure_parallelism(table(spark, sf_dir, "documents"))
    m = (
        docs.withColumn("w", _tokens_col())
        .filter(F.size("w") >= 2)
        .select(
            "doc_id",
            F.size("w").alias("n_tokens"),
            F.transform(
                F.sequence(F.lit(1), F.size("w") - 1),
                lambda i: F.concat_ws(
                    " ", F.element_at(F.col("w"), i), F.element_at(F.col("w"), i + 1)
                ),
            ).alias("bg"),
            F.array_max(
                F.transform(
                    F.array_distinct(F.col("w")),
                    lambda t: F.size(F.filter(F.col("w"), lambda x: x == t)),
                )
            ).alias("top_cnt"),
        )
    )
    dup_frac = (F.size("bg") - F.size(F.array_distinct("bg"))).cast("double") / F.size(
        "bg"
    )
    top_frac = F.col("top_cnt").cast("double") / F.col("n_tokens")
    return m.select(
        "doc_id",
        dup_frac.alias("dup_bigram_frac"),
        top_frac.alias("top_token_frac"),
        ((dup_frac <= 0.3) & (top_frac <= 0.12)).alias("keep"),
    )


_GLOBAL_NGRAM = 5


@register(
    "dedup_global_ngrams",
    oracle=f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
g AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(w) - {_GLOBAL_NGRAM - 2}),
           _i -> array_to_string(w[_i : _i + {_GLOBAL_NGRAM - 1}], ' '))) AS gram
  FROM t WHERE len(w) >= {_GLOBAL_NGRAM}
),
dfreq AS (SELECT gram, count(DISTINCT doc_id) AS df FROM g GROUP BY gram)
SELECT doc_id, count(*) AS n_spans,
       CAST(sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_spans,
       CAST(sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS DOUBLE) / count(*)
         AS dup_span_frac
FROM g JOIN dfreq USING (gram)
GROUP BY doc_id
""",
)
def dedup_global_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style global span dedup metric: every word {n}-gram position is
    checked against the corpus-wide document frequency of that n-gram;
    a doc's dup_span_frac is the share of its spans that also occur in
    some other document. Shape at 100 TB: explode -> groupBy(gram) with
    map-side combine (distinct doc count) -> equi-join positions back on
    the gram -> per-doc agg. Two shuffles, both keyed on uniformly
    distributed text keys; no all-pairs stage anywhere."""
    docs = ensure_parallelism(table(spark, sf_dir, "documents"))
    n = _GLOBAL_NGRAM
    g = (
        docs.withColumn("w", _tokens_col())
        .filter(F.size("w") >= n)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("w") - (n - 1)),
                    lambda i: F.concat_ws(
                        " ", *[F.element_at(F.col("w"), i + j) for j in range(n)]
                    ),
                )
            ).alias("gram"),
        )
        # `g` feeds the df aggregation (keyed on gram) AND the positions
        # join (probe side) — different partitionings, so ReusedExchange
        # never deduplicates the scan + tokenize + 5-gram build and it
        # runs twice per invocation. r12 measured the localCheckpoint
        # alternative on a calibrated box: materializing the EXPLODED
        # gram positions (~n x corpus string bytes) costs more than the
        # recompute — ckpt 2.00 s vs recompute 1.36 s warm medians at
        # sf0.1/local[32] — so recompute stays. CROSSOVER: checkpoint
        # only pays when scan+tokenize is I/O-bound and gram strings are
        # small relative to text; measure before flipping
        # (contrast decontaminate_train_split, whose checkpointed
        # relation is one UNexploded row per doc and wins 2x).
    )
    dfreq = g.groupBy("gram").agg(F.count_distinct("doc_id").alias("df"))
    dup = (F.col("df") >= 2).cast("bigint")
    return (
        g.join(dfreq, "gram")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.sum(dup).alias("n_dup_spans"),
            (F.sum(dup).cast("double") / F.count(F.lit(1))).alias("dup_span_frac"),
        )
    )


@register(
    "text_tfidf_top_terms",
    oracle="""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
sizes AS (SELECT doc_id, len(w) AS n_tokens FROM t),
tf AS (
  SELECT doc_id, tok, count(*) AS cnt
  FROM (SELECT doc_id, unnest(w) AS tok FROM t)
  GROUP BY doc_id, tok
),
idf AS (SELECT tok, count(DISTINCT doc_id) AS df FROM tf GROUP BY tok),
n AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.tok,
         (CAST(cnt AS DOUBLE) / n_tokens) * (CAST(n_docs AS DOUBLE) / df)
           AS tfidf
  FROM tf JOIN sizes USING (doc_id) JOIN idf USING (tok) CROSS JOIN n
)
SELECT doc_id, tok, tfidf, CAST(rn AS INT) AS rn
FROM (SELECT doc_id, tok, tfidf,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY tfidf DESC, tok) AS rn
      FROM scored)
WHERE rn <= 3
""",
)
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-3 TF-IDF terms (keyword extraction). IDF is kept
    as the raw N/df ratio — no log — so the score is a product of two
    IEEE divisions and bit-portable across engines. Shape: token-count
    agg (map-side combined), a broadcast-sized idf dim joined back, one
    window for the per-doc top-k. The idf table is vocabulary-sized, so
    at 100 TB it is still the broadcast side."""
    from pyspark.sql import Window

    docs = ensure_parallelism(table(spark, sf_dir, "documents"))
    t = docs.select("doc_id", _tokens_col().alias("w"))
    sizes = t.select("doc_id", F.size("w").alias("n_tokens"))
    tf = (
        t.select("doc_id", F.explode("w").alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        # tf feeds BOTH the idf aggregation (exchange on tok) and the
        # scored join (exchange on doc_id) — different partitionings,
        # so ReusedExchange cannot deduplicate the tokenize + explode +
        # agg subtree and it runs twice. r11 materialized tf here with
        # a lazy localCheckpoint (Exchange 24 -> 18); r12 re-measured
        # the trade on a calibrated-quiet box (VERDICT r11 item 7):
        # recompute 1.52 s vs checkpoint 1.65 s warm medians at sf0.1 /
        # local[32] — the tf-table write+read constant exceeds the
        # saved subtree at this scale, so recompute stays. CROSSOVER:
        # re-enable the checkpoint when the tokenize+agg subtree's cost
        # clearly exceeds materializing |tf| rows to executor storage —
        # i.e. corpus scans are I/O-bound (remote storage) or tokens/doc
        # is large — measure, don't guess (tools/profile_queries.py).
    )
    idf = tf.groupBy("tok").agg(F.count_distinct("doc_id").alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(sizes, "doc_id")
        .join(F.broadcast(idf), "tok")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "tok",
            (
                (F.col("cnt").cast("double") / F.col("n_tokens"))
                * (F.col("n_docs").cast("double") / F.col("df"))
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("tok"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "tok", "tfidf", "rn")
    )


@register(
    "text_langid_accuracy",
    oracle="""
WITH bigrams AS (
  SELECT doc_id, lang, unnest(list_transform(range(1, length(text)),
                                             _i -> text[_i:_i+1])) AS bg
  FROM documents
),
profile AS (
  SELECT lang AS plang, bg, cnt / total AS freq
  FROM (
    SELECT lang, bg, CAST(count(*) AS DOUBLE) AS cnt,
           CAST(sum(count(*)) OVER (PARTITION BY lang) AS DOUBLE) AS total
    FROM bigrams WHERE doc_id % 5 <> 0
    GROUP BY lang, bg)
),
test_counts AS (
  SELECT doc_id, lang, bg, count(*) AS n_bg
  FROM bigrams WHERE doc_id % 5 = 0
  GROUP BY doc_id, lang, bg
),
scored AS (
  SELECT doc_id, lang, plang,
         list_reduce(list_prepend(CAST(0 AS DOUBLE),
                                  list(n_bg * freq ORDER BY t.bg)),
                     (_a, _b) -> _a + _b) AS score
  FROM test_counts t JOIN profile p ON t.bg = p.bg
  GROUP BY doc_id, lang, plang
),
pred AS (
  SELECT doc_id, lang, plang AS predicted
  FROM (SELECT doc_id, lang, plang,
               row_number() OVER (PARTITION BY doc_id
                                  ORDER BY score DESC, plang) AS rn
        FROM scored)
  WHERE rn = 1
)
SELECT lang, count(*) AS n_docs,
       CAST(sum(CASE WHEN lang = predicted THEN 1 ELSE 0 END) AS BIGINT)
         AS n_correct
FROM pred GROUP BY lang
""",
)
def text_langid_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profile-based language ID: learn char-bigram relative frequencies
    per language on a train split (doc_id % 5 != 0), score held-out docs
    by summed profile frequency of their bigrams (terms folded in bigram
    order so the float sum is engine-portable), predict argmax with a
    (score, lang) tie-break. Returns a per-language confusion summary —
    fully oracle-checked, including the classifier decisions."""
    from pyspark.sql import Window

    docs = ensure_parallelism(table(spark, sf_dir, "documents"))
    bigrams = docs.select(
        "doc_id",
        "lang",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("text") - 1),
                lambda i: F.col("text").substr(i, F.lit(2)),
            )
        ).alias("bg"),
    )
    train = bigrams.filter(F.col("doc_id") % 5 != 0)
    profile = (
        train.groupBy("lang", "bg")
        .agg(F.count(F.lit(1)).cast("double").alias("cnt"))
        .withColumn(
            "freq",
            F.col("cnt") / F.sum("cnt").over(Window.partitionBy("lang")),
        )
        .select(F.col("lang").alias("plang"), "bg", "freq")
    )
    test_counts = (
        bigrams.filter(F.col("doc_id") % 5 == 0)
        .groupBy("doc_id", "lang", "bg")
        .agg(F.count(F.lit(1)).alias("n_bg"))
    )
    terms = test_counts.join(F.broadcast(profile), on="bg", how="inner").select(
        "doc_id", "lang", "plang", "bg", (F.col("n_bg") * F.col("freq")).alias("term")
    )
    scored = terms.groupBy("doc_id", "lang", "plang").agg(
        F.aggregate(
            F.transform(
                F.sort_array(F.collect_list(F.struct("bg", "term"))),
                lambda p: p["term"],
            ),
            F.lit(0.0),
            lambda a, b: a + b,
        ).alias("score")
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("plang"))
    pred = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "lang", F.col("plang").alias("predicted"))
    )
    return pred.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum((F.col("lang") == F.col("predicted")).cast("int")).alias("n_correct"),
    )
