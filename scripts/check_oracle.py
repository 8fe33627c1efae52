"""Local simulation of the driver's DuckDB-oracle correctness gate.

Runs every ``queries()`` entry on Spark and (where present) its
``oracle_sql()`` on DuckDB over the same parquet, then compares
row count, column names, and an order-insensitive value hash.

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import json
import sys
import time

import duckdb

sys.path.insert(0, ".")

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = set(sys.argv[2:])

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def value_hash(rows, cols):
    """Order-insensitive hash: sort columns by name, stringify every
    cell (floats via repr of round-trip), sort row strings, md5."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def cell(v):
        if v is None:
            return "NULL"
        if isinstance(v, float):
            return f"{v:.6f}"
        if isinstance(v, bool):
            return str(int(v))
        return str(v)

    lines = sorted("|".join(cell(r[i]) for i in order) for r in rows)
    return hashlib.md5("\n".join(lines).encode()).hexdigest()


def main():
    import __spark_entry__ as e
    from klinker_spark.session import get_spark

    spark = get_spark("correctness")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    qs, oracles = e.queries(), e.oracle_sql()
    results, n_fail = {}, 0
    for name, fn in qs.items():
        if ONLY and name not in ONLY:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as ex:
            results[name] = {"status": "SPARK_ERROR", "error": str(ex)[:500]}
            n_fail += 1
            print(f"FAIL  {name}: spark error {str(ex)[:200]}")
            continue
        spark_s = time.time() - t0
        if name not in oracles:
            results[name] = {"status": "ROWS_ONLY", "rows": len(srows), "spark_s": round(spark_s, 2)}
            print(f"rows  {name}: {len(srows)} rows ({spark_s:.1f}s, no oracle)")
            continue
        try:
            cur = con.execute(oracles[name])
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
        except Exception as ex:
            results[name] = {"status": "ORACLE_ERROR", "error": str(ex)[:500]}
            n_fail += 1
            print(f"FAIL  {name}: oracle error {str(ex)[:200]}")
            continue
        ok_cols = sorted(scols) == sorted(ocols)
        ok_count = len(srows) == len(orows)
        ok_hash = value_hash(srows, scols) == value_hash(orows, ocols)
        status = "MATCH" if (ok_cols and ok_count and ok_hash) else "MISMATCH"
        if status != "MATCH":
            n_fail += 1
            print(
                f"FAIL  {name}: cols={ok_cols} ({sorted(scols)} vs {sorted(ocols)}) "
                f"count={ok_count} ({len(srows)} vs {len(orows)}) hash={ok_hash}"
            )
            if ok_cols and not ok_hash:
                order = sorted(range(len(scols)), key=lambda i: scols[i])
                oorder = sorted(range(len(ocols)), key=lambda i: ocols[i])
                sset = {tuple(str(r[i]) for i in order) for r in srows}
                oset = {tuple(str(r[i]) for i in oorder) for r in orows}
                for x in list(sset - oset)[:3]:
                    print(f"      spark-only: {x}")
                for x in list(oset - sset)[:3]:
                    print(f"      oracle-only: {x}")
        else:
            print(f"ok    {name}: {len(srows)} rows ({spark_s:.1f}s)")
        results[name] = {"status": status, "rows": len(srows), "spark_s": round(spark_s, 2)}

    print(json.dumps({"failures": n_fail, "n": len(results)}))
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
