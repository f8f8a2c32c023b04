"""Local stand-in for the driver's t2 correctness harness.

Runs every ``queries()`` entry at sf0.01 on Spark, runs the matching
``oracle_sql()`` on DuckDB over the same parquet, and compares row count,
column names/order-insensitive values. Columns are sorted by name before
hashing, mirroring the driver contract.

Usage: python tools/check_correctness.py [name ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


_DUCK_TO_SPARK = {
    "BIGINT": "bigint",
    "INTEGER": "int",
    "DOUBLE": "double",
    "VARCHAR": "string",
    "TIMESTAMP": "timestamp",
    "FLOAT": "float",
    "BOOLEAN": "boolean",
}


def duck_to_spark_type(dt: str) -> str:
    dt = str(dt).upper()
    if dt.endswith("[]"):
        return f"array<{duck_to_spark_type(dt[:-2])}>"
    return _DUCK_TO_SPARK.get(dt, dt.lower())


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision — bit-exactness is the bar
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append("\x1f".join(norm_cell(r[i]) for i in order))
    out.sort()
    return out


def main(names=None):
    from vector_search_go_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark("correctness-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    if names:
        qs = {k: v for k, v in qs.items() if k in names}
    n_pass = n_fail = n_rowsonly = 0
    for name, fn in sorted(qs.items()):
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ROWS  {name}: {len(srows)} rows (no oracle) [{time.time()-t0:.1f}s]")
            n_rowsonly += 1
            continue
        try:
            cur = con.execute(oracles[name])
            dcols = [d[0] for d in cur.description]
            drows = cur.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            n_fail += 1
            continue
        ok = True
        msgs = []
        if len(srows) != len(drows):
            ok = False
            msgs.append(f"rowcount {len(srows)} vs {len(drows)}")
        if sorted(scols) != sorted(dcols):
            ok = False
            msgs.append(f"cols {sorted(scols)} vs {sorted(dcols)}")
        else:
            stypes = {f.name: f.dataType.simpleString() for f in sdf.schema.fields}
            rel = con.sql(oracles[name])
            dtypes = {
                c: duck_to_spark_type(t) for c, t in zip(rel.columns, rel.types)
            }
            tdiff = {
                c: (stypes[c], dtypes[c]) for c in stypes if stypes[c] != dtypes[c]
            }
            if tdiff:
                ok = False
                msgs.append(f"dtype mismatch {tdiff}")
        if ok:
            cs, cd = canon(srows, scols), canon(drows, dcols)
            if cs != cd:
                ok = False
                ndiff = sum(1 for a, b in zip(cs, cd) if a != b)
                msgs.append(f"value mismatch ({ndiff}/{len(cs)} rows differ)")
                for a, b in list(zip(cs, cd))[:200]:
                    if a != b:
                        msgs.append(f"  spark: {a[:200]}")
                        msgs.append(f"  duck : {b[:200]}")
                        break
        if ok:
            print(f"PASS  {name}: {len(srows)} rows [{time.time()-t0:.1f}s]")
            n_pass += 1
        else:
            print(f"FAIL  {name}: " + "; ".join(msgs))
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:] or None))
