"""Cross-round regression gate: a sample of queries must reproduce the
canonical hashes recorded in EXPECTED_HASHES.json (full-corpus check:
tools/determinism_check.py). Keeps future refactors from silently
changing semantics between rounds."""

from __future__ import annotations

import json
import os

import pytest

from vector_search_go_spark import registry
from tools.determinism_check import norm_cell

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# cheap-but-diverse sample: relational agg, window, dedup, text, vector
SAMPLE = [
    "q1_pricing_summary",
    "window_rank_orders",
    "dedup_minhash_lsh",
    "text_fingerprint",
    "vector_norms",
    "scalar_json_funcs",
    "pq_search_adc",
    "sq8_encode_codes",
]


@pytest.fixture(scope="module")
def expected():
    with open(os.path.join(REPO, "EXPECTED_HASHES.json")) as f:
        return json.load(f)


@pytest.mark.parametrize("name", SAMPLE)
def test_query_hash_stable(spark, name, expected):
    import hashlib

    fn = registry.queries()[name]
    df = fn(spark, "/root/testdata/sf0.01")
    cols = sorted(df.columns)
    rows = sorted("\x1f".join(norm_cell(r[c]) for c in cols) for r in df.collect())
    got = hashlib.md5("\n".join(rows).encode()).hexdigest()
    assert got == expected[name], f"{name} output drifted from recorded baseline"
