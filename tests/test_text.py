"""Dedup + text-analysis operator tests (sf0.001 documents)."""

from __future__ import annotations

from vector_search_go_spark.queries_text import (
    dedup_minhash_lsh,
    dedup_ngram_jaccard,
    dedup_simhash,
    text_fingerprint,
    text_quality_score,
)


def test_minhash_catches_jaccard_dups(spark, sf_dir):
    """Every high-Jaccard pair (>=0.8) must surface as a MinHash band
    candidate — at j~0.99 the per-pair miss probability is ~1e-6."""
    jac_pairs = {
        (r["doc_a"], r["doc_b"]) for r in dedup_ngram_jaccard(spark, sf_dir).collect()
    }
    cand_pairs = {
        (r["doc_a"], r["doc_b"]) for r in dedup_minhash_lsh(spark, sf_dir).collect()
    }
    assert jac_pairs, "fixture should contain planted near-dups"
    missed = jac_pairs - cand_pairs
    assert not missed, f"minhash missed near-dup pairs: {missed}"


def test_minhash_candidates_are_mostly_real(spark, sf_dir):
    """Band candidates should be enriched for true near-dups: every
    candidate pair must share at least one shingle (banding can't invent
    pairs with zero overlap, md5 collisions aside)."""
    cands = dedup_minhash_lsh(spark, sf_dir)
    assert cands.count() > 0
    assert cands.filter("doc_a >= doc_b").count() == 0


def test_simhash_deterministic_and_clusters_dups(spark, sf_dir):
    sh1 = {r["doc_id"]: r["simhash"] for r in dedup_simhash(spark, sf_dir).collect()}
    sh2 = {r["doc_id"]: r["simhash"] for r in dedup_simhash(spark, sf_dir).collect()}
    assert sh1 == sh2
    # near-dup pairs (by jaccard) should be close in hamming distance
    jac = dedup_ngram_jaccard(spark, sf_dir).collect()
    assert jac
    for r in jac[:5]:
        x = sh1[r["doc_a"]] ^ sh1[r["doc_b"]]
        hamming = bin(x & ((1 << 60) - 1)).count("1")
        assert hamming <= 15, (r["doc_a"], r["doc_b"], hamming)


def test_fingerprint_identical_for_identical_text(spark, sf_dir):
    fp = text_fingerprint(spark, sf_dir)
    assert fp.count() == fp.select("doc_id").distinct().count()


def test_quality_score_bounds(spark, sf_dir):
    rows = text_quality_score(spark, sf_dir).collect()
    for r in rows:
        assert 0.0 < r["uniq_ratio"] <= 1.0
        assert 0.0 <= r["stopword_ratio"] <= 1.0
        assert 0.0 <= r["quality_score"] <= 1.0


def test_repetition_filter_bounds_and_split(spark, sf_dir):
    from vector_search_go_spark.queries_text import text_repetition_filter

    rows = text_repetition_filter(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["dup_bigram_frac"] < 1.0
        assert 0.0 < r["top_token_frac"] <= 1.0
        assert r["keep"] == (
            r["dup_bigram_frac"] <= 0.3 and r["top_token_frac"] <= 0.12
        )
    kept = {r["keep"] for r in rows}
    assert kept == {True, False}, "thresholds should split the corpus"


def test_global_ngram_dedup_marks_planted_dups(spark, sf_dir):
    """Docs in a high-Jaccard near-dup pair must have most of their
    5-gram spans marked globally duplicated, while the corpus average
    stays far lower — the metric separates planted dups from noise."""
    from vector_search_go_spark.queries_text import (
        dedup_global_ngrams,
        dedup_ngram_jaccard,
    )

    frac = {
        r["doc_id"]: r["dup_span_frac"]
        for r in dedup_global_ngrams(spark, sf_dir).collect()
    }
    assert frac
    for v in frac.values():
        assert 0.0 <= v <= 1.0
    pairs = dedup_ngram_jaccard(spark, sf_dir).collect()
    assert pairs, "fixture should contain planted near-dups"
    for r in pairs:
        assert frac[r["doc_a"]] >= 0.5, (r["doc_a"], frac[r["doc_a"]])
        assert frac[r["doc_b"]] >= 0.5, (r["doc_b"], frac[r["doc_b"]])
    mean = sum(frac.values()) / len(frac)
    assert mean < 0.3, mean


def test_tfidf_top_terms_shape(spark, sf_dir):
    from vector_search_go_spark.queries_text import text_tfidf_top_terms

    rows = text_tfidf_top_terms(spark, sf_dir).collect()
    assert rows
    per_doc = {}
    for r in rows:
        assert r["tfidf"] > 0.0
        per_doc.setdefault(r["doc_id"], []).append((r["rn"], r["tfidf"]))
    for doc, terms in per_doc.items():
        ranks = sorted(rn for rn, _ in terms)
        assert ranks == list(range(1, len(terms) + 1))
        by_rank = [t for _, t in sorted(terms)]
        assert by_rank == sorted(by_rank, reverse=True)
