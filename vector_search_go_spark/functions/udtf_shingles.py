"""Python UDTF surface: a table function emitting one row per shingle.

Spark 4's @udtf is the 1->N row extension point (the reference's only
extension points are Go interfaces, SURVEY.md section 2); the engine's
native shingle path (queries_text._shingles_col) stays the production
route — this UDTF exists to cover the API surface and is tested for
agreement with the native expression.
"""

from __future__ import annotations

try:
    from pyspark.sql.functions import udtf

    UDTF_AVAILABLE = True
except ImportError:  # pragma: no cover
    UDTF_AVAILABLE = False


if UDTF_AVAILABLE:

    @udtf(returnType="doc_id bigint, pos int, shingle string")
    class ShingleUDTF:
        """emit (doc_id, position, word-trigram) rows for one document."""

        def eval(self, doc_id: int, text: str):
            if text is None:
                return  # null document -> no shingles, not a crash
            words = text.split(" ")
            for i in range(len(words) - 2):
                yield doc_id, i, " ".join(words[i : i + 3])
