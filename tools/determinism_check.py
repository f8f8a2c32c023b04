"""Determinism audit: every registered query must produce bit-identical
canonical output across independent Spark sessions (the driver compares
results across runs/rounds; seeded models, pinned fold orders, and
explicit tie-breaks are supposed to guarantee this — this script proves
it).

Usage:
  python tools/determinism_check.py /tmp/canon1.json
  python tools/determinism_check.py /tmp/canon2.json   # fresh process
  # then diff the two JSON files; equal == fully deterministic
"""

from __future__ import annotations

import hashlib
import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def norm_cell(v):
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else repr(v)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def main(out_path: str) -> None:
    from vector_search_go_spark.session import get_spark
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "__spark_entry__.py"),
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)

    spark = get_spark("determinism")
    spark.sparkContext.setLogLevel("ERROR")
    out = {}
    for name, fn in sorted(m.queries().items()):
        df = fn(spark, SF_DIR)
        cols = sorted(df.columns)
        rows = sorted(
            "\x1f".join(norm_cell(r[c]) for c in cols) for r in df.collect()
        )
        out[name] = hashlib.md5("\n".join(rows).encode()).hexdigest()
    json.dump(out, open(out_path, "w"), indent=0)
    print(f"wrote {len(out)} query hashes to {out_path}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/canon.json")
